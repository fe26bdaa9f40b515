"""Avro schema support (SURVEY §1.2 / §2.1 S8).

The reference's payloads are Avro records governed by a schema registry;
Spark's equivalent is `from_avro`/`to_avro` plus a StructType derived from
the writer schema. The spark-avro jar is not present in this environment
(and nothing may be installed), so:

- `avro_to_struct` — the schema mapping itself (avsc JSON -> StructType),
  covering every Avro feature the reference's schemas use (SURVEY §1.2):
  records, enums (-> string), nullable unions (-> nullable field), field
  defaults (metadata), primitives, plus arrays/maps for completeness.
- `decode_avro` — gated wiring to from_avro; raises a clear error until a
  runtime with spark-avro loads it.
- the RUNTIME decode path without the jar lives in avro_codec.py: a pure-
  Python Avro binary codec (+ Confluent wire framing) applied through
  Arrow-batched mapInPandas (`decode_avro_rows`) — slower than from_avro's
  JVM path but fully functional and round-trip tested; prefer from_avro
  when the package is loadable.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import types as T

_PRIMITIVES = {
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "null": T.NullType(),
}


def _field_type(t) -> tuple[T.DataType, bool]:
    """Returns (spark_type, nullable)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t], t == "null"
        raise ValueError(f"unsupported named-type reference: {t!r}")
    if isinstance(t, list):                      # union
        branches = [b for b in t if b != "null"]
        nullable = len(branches) != len(t)
        if len(branches) != 1:
            raise ValueError(f"only unions with null are supported: {t!r}")
        inner, _ = _field_type(branches[0])
        return inner, nullable
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "record":
            return _record_struct(t), False
        if kind == "enum":                        # enum -> string (§1.2)
            return T.StringType(), False
        if kind == "array":
            item, item_null = _field_type(t["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if kind == "map":
            val, val_null = _field_type(t["values"])
            return T.MapType(T.StringType(), val, valueContainsNull=val_null), False
        if kind == "fixed":
            return T.BinaryType(), False
        if kind in _PRIMITIVES:                   # {"type": "string"} form
            return _PRIMITIVES[kind], False
    raise ValueError(f"unsupported avro type: {t!r}")


def _record_struct(schema: dict) -> T.StructType:
    fields = []
    for f in schema["fields"]:
        dt, nullable = _field_type(f["type"])
        meta = {}
        if "default" in f:
            meta["avro_default"] = f["default"]
            if f["default"] is None:
                nullable = True
        fields.append(T.StructField(f["name"], dt, nullable, metadata=meta))
    return T.StructType(fields)


def avro_to_struct(avsc: str | dict) -> T.StructType:
    """avsc (JSON string or parsed dict) -> StructType."""
    schema = json.loads(avsc) if isinstance(avsc, str) else avsc
    if schema.get("type") != "record":
        raise ValueError("top-level schema must be a record")
    return _record_struct(schema)


def decode_avro(payload: Column, avsc: str) -> Column:
    """from_avro(payload, schema) — requires the spark-avro package."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:                      # pragma: no cover
        raise RuntimeError("spark-avro is not available") from e
    return from_avro(payload, avsc)
