"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB against the
same parquet tables, then compares row count, column names/types, and an
order-insensitive value hash. Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from kafka_streams_examples_spark.catalog import TABLES
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    spec = QUERIES[name]
    t0 = time.time()
    sdf = spec.spark(spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    if spec.oracle is None:
        return True, f"rows-only ({len(sdf)} rows, {t_spark:.1f}s)"
    odf = con.execute(spec.oracle).df()
    if len(sdf) != len(odf):
        return False, f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"COLUMNS spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    cs, co = canon(sdf), canon(odf)
    if not cs.equals(co):
        neq = (cs != co).any(axis=1)
        diff = pd.concat([cs[neq].head(3).add_suffix("_spark"),
                          co[neq].head(3).add_suffix("_oracle")], axis=1)
        return False, f"VALUES mismatch on {int(neq.sum())}/{len(cs)} rows\n{diff}"
    return True, f"ok ({len(sdf)} rows, {t_spark:.1f}s)"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or list(QUERIES)
    if vanilla:
        # replicate the driver exactly: ITS session, not our tuned one
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("parity-check", cpus=8)
    con = duck_con(sf_dir)
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
