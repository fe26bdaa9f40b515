"""Pure-Python Avro binary codec (SURVEY §2.1 S8 runtime half).

The reference moves Avro-serialized records through Kafka with Confluent
Schema Registry framing (SpecificAvroIntegrationTest.java,
GenericAvroIntegrationTest.java). Spark's native path is the spark-avro
package (`from_avro`/`to_avro`), which is absent from this environment and
cannot be installed — so this module implements the Avro binary encoding
itself (Avro 1.11 spec, "binary encoding" section: zigzag varints,
length-prefixed strings/bytes, little-endian floats, block-encoded
arrays/maps, index-prefixed unions) plus the Confluent wire framing (magic
byte 0x00 + big-endian 4-byte schema id + body).

`decode_avro_rows` applies the decoder over a DataFrame's binary payload
column via Arrow-batched mapInPandas — the same plumbing shape as the
multimodal operators: Python only touches the payload bytes; everything
before/after stays JVM-side. When a runtime DOES have spark-avro loaded,
`avro_schema.decode_avro` is the preferred path; results are identical.

Covers every Avro feature the reference's schemas use (SURVEY §1.2):
records, enums, nullable unions, field defaults, primitives — plus
arrays/maps/fixed for completeness.
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

from .avro_schema import avro_to_struct

# ---------------------------------------------------------------------------
# primitive codecs


def _write_long(buf: io.BytesIO, n: int) -> None:
    # zigzag then varint (Avro spec: int/long)
    z = (n << 1) ^ (n >> 63)
    while (z & ~0x7F) != 0:
        buf.write(bytes([(z & 0x7F) | 0x80]))
        z >>= 7
    buf.write(bytes([z]))


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)      # un-zigzag


def _norm(t):
    """Normalize {"type": "string"}-style wrappers to the inner type."""
    if isinstance(t, dict) and t.get("type") in (
            "string", "bytes", "int", "long", "float", "double", "boolean",
            "null") and "logicalType" not in t:
        return t["type"]
    return t


# ---------------------------------------------------------------------------
# schema-driven encode / decode


def encode_value(t, v, buf: io.BytesIO) -> None:
    t = _norm(t)
    if isinstance(t, str):
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            _write_long(buf, int(v))
        elif t == "float":
            buf.write(struct.pack("<f", float(v)))
        elif t == "double":
            buf.write(struct.pack("<d", float(v)))
        elif t == "string":
            raw = v.encode("utf-8")
            _write_long(buf, len(raw)); buf.write(raw)
        elif t == "bytes":
            _write_long(buf, len(v)); buf.write(bytes(v))
        else:
            raise ValueError(f"unsupported type {t!r}")
    elif isinstance(t, list):                         # union: index + value
        idx = _union_index(t, v)
        _write_long(buf, idx)
        encode_value(t[idx], v, buf)
    elif isinstance(t, dict):
        kind = t["type"]
        if kind == "record":
            for f in t["fields"]:
                fv = v.get(f["name"], f.get("default")) if isinstance(v, dict) else v
                encode_value(f["type"], fv, buf)
        elif kind == "enum":
            _write_long(buf, t["symbols"].index(v))
        elif kind == "array":
            if v:
                _write_long(buf, len(v))
                for item in v:
                    encode_value(t["items"], item, buf)
            _write_long(buf, 0)
        elif kind == "map":
            if v:
                _write_long(buf, len(v))
                for k, mv in v.items():
                    encode_value("string", k, buf)
                    encode_value(t["values"], mv, buf)
            _write_long(buf, 0)
        elif kind == "fixed":
            buf.write(bytes(v))
        else:
            raise ValueError(f"unsupported complex type {kind!r}")
    else:
        raise ValueError(f"bad schema node {t!r}")


def _union_index(t: list, v) -> int:
    if v is None:
        return t.index("null")
    for i, b in enumerate(t):
        if b != "null":
            return i
    raise ValueError(f"no non-null branch in union {t!r}")


def decode_value(t, buf: io.BytesIO):
    t = _norm(t)
    if isinstance(t, str):
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "string":
            n = _read_long(buf)
            return buf.read(n).decode("utf-8")
        if t == "bytes":
            n = _read_long(buf)
            return buf.read(n)
        raise ValueError(f"unsupported type {t!r}")
    if isinstance(t, list):
        return decode_value(t[_read_long(buf)], buf)
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "record":
            return {f["name"]: decode_value(f["type"], buf) for f in t["fields"]}
        if kind == "enum":
            return t["symbols"][_read_long(buf)]
        if kind == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:                              # block with byte size
                    _read_long(buf); n = -n
                out.extend(decode_value(t["items"], buf) for _ in range(n))
        if kind == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf); n = -n
                for _ in range(n):
                    k = decode_value("string", buf)
                    out[k] = decode_value(t["values"], buf)
        if kind == "fixed":
            return buf.read(t["size"])
        raise ValueError(f"unsupported complex type {kind!r}")
    raise ValueError(f"bad schema node {t!r}")


def encode_record(avsc: str | dict, record: dict) -> bytes:
    schema = json.loads(avsc) if isinstance(avsc, str) else avsc
    buf = io.BytesIO()
    encode_value(schema, record, buf)
    return buf.getvalue()


def decode_record(avsc: str | dict, payload: bytes) -> dict:
    schema = json.loads(avsc) if isinstance(avsc, str) else avsc
    return decode_value(schema, io.BytesIO(payload))


# ---------------------------------------------------------------------------
# Confluent Schema Registry wire framing (magic 0x00 + schema id + body)


def frame_confluent(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + body


def unframe_confluent(payload: bytes) -> tuple[int, bytes]:
    if not payload or payload[0] != 0:
        raise ValueError("not Confluent-framed (missing magic byte 0x00)")
    return struct.unpack(">I", payload[1:5])[0], payload[5:]


# ---------------------------------------------------------------------------
# DataFrame integration


def encode_avro_rows(df: DataFrame, avsc: str | dict,
                     schema_id: int | None = None,
                     out_col: str = "value",
                     keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Encode typed columns into a binary Avro payload column — the sink
    half of S5+S8 (`to_avro` without the spark-avro jar), inverse of
    :func:`decode_avro_rows`.

    The avsc record's fields are read from the row by name; with
    schema_id set, payloads get the Confluent frame (magic + id) so a
    registry-aware consumer — including our own resolver-driven decoder —
    reads them back. Same Arrow-batched mapInPandas plumbing as decode:
    Python touches only the payload bytes. keep_cols ride along (e.g. the
    Kafka message key / a dynamic-routing topic column).
    """
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema = json.loads(avsc) if isinstance(avsc, str) else avsc
    field_names = [f["name"] for f in schema.get("fields", [])]
    in_fields = {f.name: f for f in df.schema.fields}
    missing = [c for c in field_names if c not in in_fields]
    if missing:
        raise ValueError(f"avro fields absent from DataFrame: {missing}")
    out_schema = T.StructType(
        [in_fields[c] for c in keep_cols]
        + [T.StructField(out_col, T.BinaryType())])

    def _clean(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, np.generic):
            return v.item()
        return v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rec in pdf[field_names].to_dict("records"):
                body = encode_record(
                    schema, {k: _clean(v) for k, v in rec.items()})
                payloads.append(frame_confluent(schema_id, body)
                                if schema_id is not None else body)
            out = pd.DataFrame({out_col: payloads})
            for i, c in enumerate(keep_cols):
                out.insert(i, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def decode_avro_rows(df: DataFrame, avsc: str | dict,
                     payload_col: str = "value",
                     confluent_framing: bool = False,
                     keep_cols: tuple[str, ...] = (),
                     on_error: str = "fail",
                     schema_resolver=None) -> DataFrame:
    """Decode a binary Avro payload column into typed columns.

    Arrow-batched mapInPandas: the schema (avro_to_struct) is resolved
    driver-side; workers decode payload bytes only. Null payloads yield
    all-null rows (the tombstone contract); with confluent_framing the
    5-byte registry header is stripped first. keep_cols are carried
    through unchanged (e.g. Kafka key/offset/timestamp metadata).

    on_error="null" applies the poison-pill contract (S11,
    HandlingCorruptedInputRecordsIntegrationTest.java:79-99) to Avro:
    a truncated/garbage payload yields an all-null row instead of failing
    the task — filter on a non-nullable field to drop-and-count, exactly
    like the JSON path. Default "fail" surfaces corruption loudly.

    schema_resolver — the Schema-Registry lookup-by-id hook: a callable
    ``schema_id -> avsc`` (dict.__getitem__ in tests; an HTTP registry
    client on a real cluster). When given, each record is decoded with the
    WRITER schema its Confluent frame header names, then projected onto
    ``avsc`` (the READER schema) by field name, filling absent fields from
    the reader's defaults — the generic-record case where one topic
    carries multiple schema versions (TopArticlesLambdaExample.java:
    163-167). Resolved schemas are cached per worker, so the resolver is
    hit once per (worker, schema id). Requires confluent_framing (the id
    lives in the frame); a resolver failure follows ``on_error``.
    """
    import pandas as pd

    from pyspark.sql import types as T

    if schema_resolver is not None and not confluent_framing:
        raise ValueError("schema_resolver requires confluent_framing "
                         "(the schema id is read from the frame header)")
    schema = json.loads(avsc) if isinstance(avsc, str) else avsc
    reader_fields = (schema.get("fields", [])
                     if isinstance(schema, dict) else [])
    # nullable-ized: a null payload (tombstone) yields an all-null row, so
    # even avro-non-nullable fields must admit null in the output schema
    avro_fields = [T.StructField(f.name, f.dataType, True, f.metadata)
                   for f in avro_to_struct(schema).fields]
    names = [f.name for f in avro_fields]
    clash = set(names) & set(keep_cols)
    if clash:
        raise ValueError(f"avro fields collide with keep_cols: {sorted(clash)}")
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [in_fields[c] for c in keep_cols] + avro_fields)

    if on_error not in ("fail", "null"):
        raise ValueError("on_error must be 'fail' or 'null'")
    null_row = {n: None for n in names}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolved: dict[int, dict | list | str] = {}

        def writer_schema(sid: int):
            if sid not in resolved:
                s = schema_resolver(sid)
                resolved[sid] = json.loads(s) if isinstance(s, str) else s
            return resolved[sid]

        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                if payload is None:
                    rows.append(null_row)
                    continue
                try:
                    if confluent_framing:
                        sid, body = unframe_confluent(bytes(payload))
                    else:
                        sid, body = -1, bytes(payload)
                    if schema_resolver is None:
                        rows.append(decode_record(schema, body))
                    else:
                        rec = decode_record(writer_schema(sid), body)
                        # reader projection: by name, defaults for absences
                        rows.append({f["name"]: rec.get(f["name"],
                                                        f.get("default"))
                                     for f in reader_fields})
                except Exception:
                    if on_error == "fail":
                        raise
                    rows.append(null_row)    # poison pill -> null row
            out = pd.DataFrame(rows, columns=names)
            for i, c in enumerate(keep_cols):
                out.insert(i, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)
