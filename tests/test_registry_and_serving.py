"""Fast registry sanity (full parity lives in tools/check_parity.py) and the
interactive-query serving layer."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kafka_streams_examples_spark.catalog import TABLES
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.serving import StateStore

SPOT = ["wordcount", "ktable_latest", "session_windows", "topk_revenue",
        "knn_cosine", "asof_join"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SPOT)
def test_spot_parity(spark, sf_dir, con, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    odf = con.execute(spec.oracle).df()
    assert canon(sdf).equals(canon(odf)), f"{name} diverges from oracle"


def test_every_query_has_doc_and_runs_lazily(spark, sf_dir):
    for name, spec in QUERIES.items():
        assert spec.doc, name
        df = spec.spark(spark, sf_dir)   # plan construction only, no action
        assert df.columns, name


def test_state_store_queries(spark, sf_dir):
    # materialize a windowed aggregate, then serve Q1-Q4 style lookups
    df = QUERIES["windowed_max"].spark(spark, sf_dir).cache()
    store = StateStore(df, key_col="user_id")
    some = df.first()
    assert store.get(some["user_id"])  # Q1 point lookup
    assert store.all().count() == df.count()  # Q2 scan
    assert store.range(0, some["user_id"]).count() >= 1  # Q3 range
    fetched = store.fetch_window(some["user_id"], some["window_start"],
                                 some["window_start"])  # Q4 window fetch
    assert fetched.count() >= 1
