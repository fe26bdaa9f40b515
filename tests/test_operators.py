"""Unit tests for batch operators on tiny hand-built inputs with known
answers — the TopologyTestDriver pattern (SURVEY §5.1: explicit input list
→ expected output equality)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_streams_examples_spark.operators.joins import asof_join, interval_join
from kafka_streams_examples_spark.operators.ktable import latest_per_key
from kafka_streams_examples_spark.operators.topk import top_k_per_group
from kafka_streams_examples_spark.operators.windows import (
    daily_window_start, with_session_id,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_latest_per_key_tombstones(spark):
    # mirrors UserRegionLambdaExample: alice moves europe->asia; bob deleted
    df = spark.createDataFrame(
        [("alice", "europe", ts("2024-01-01 10:00:00"), 1),
         ("alice", "asia", ts("2024-01-01 11:00:00"), 2),
         ("bob", "americas", ts("2024-01-01 10:30:00"), 3),
         ("bob", None, ts("2024-01-01 12:00:00"), 4)],
        "user string, region string, ts timestamp, seq int")
    out = latest_per_key(df, ["user"], "ts", ["seq"], tombstone_col="region")
    rows = {r["user"]: r["region"] for r in out.collect()}
    assert rows == {"alice": "asia"}


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", 1, ts("2024-01-01 10:00:00"), 1),
         ("k", 2, ts("2024-01-01 10:00:00"), 2)],
        "key string, v int, ts timestamp, seq int")
    out = latest_per_key(df, ["key"], "ts", ["seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == 2


def test_top_k_per_group_order(spark):
    # KafkaMusic TopFiveSongs comparator: plays desc, id asc
    df = spark.createDataFrame(
        [("rock", 1, 10), ("rock", 2, 10), ("rock", 3, 5), ("rock", 4, 20),
         ("jazz", 5, 1)],
        "genre string, song_id int, plays int")
    out = top_k_per_group(df, ["genre"], [F.desc("plays"), F.asc("song_id")], k=3)
    rock = [r["song_id"] for r in out.filter("genre='rock'").orderBy("rnk").collect()]
    assert rock == [4, 1, 2]


def test_session_ids_merge_on_bridge(spark):
    # SessionWindowsExampleTest: sessions merge when a bridging event lands
    rows = [("u", ts("2024-01-01 10:00:00")),
            ("u", ts("2024-01-01 10:20:00")),   # bridges (gap 30m)
            ("u", ts("2024-01-01 10:40:00")),
            ("u", ts("2024-01-01 12:00:00"))]   # new session
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = with_session_id(df, ["user"], gap_seconds=1800)
    sessions = sorted(r["session_id"] for r in out.collect())
    assert sessions == [1, 1, 1, 2]


def test_daily_window_start_1800():
    import pyspark.sql.functions as F  # noqa: F401
    from kafka_streams_examples_spark.session import get_spark
    spark = get_spark("tests", cpus=4)
    df = spark.createDataFrame(
        [(ts("2024-01-01 17:59:00"),), (ts("2024-01-01 18:00:00"),)],
        "t timestamp")
    out = df.select(daily_window_start(F.col("t"), 18).alias("w")).collect()
    assert out[0]["w"] == ts("2023-12-31 18:00:00")
    assert out[1]["w"] == ts("2024-01-01 18:00:00")


def test_interval_join_window_bounds(spark):
    left = spark.createDataFrame(
        [("a", ts("2024-01-01 10:00:00"))], "k string, l_ts timestamp")
    right = spark.createDataFrame(
        [("a", ts("2024-01-01 10:04:59")),
         ("a", ts("2024-01-01 10:05:01")),
         ("a", ts("2024-01-01 09:59:00"))], "k string, r_ts timestamp")
    out = interval_join(left, right, "k", 0, 300)
    assert out.count() == 1


def test_asof_join_null_before_first(spark):
    stream = spark.createDataFrame(
        [(1, "a", ts("2024-01-01 09:00:00")),
         (2, "a", ts("2024-01-01 11:00:00"))],
        "event_id int, key string, ts timestamp")
    tbl = spark.createDataFrame(
        [(100, "a", ts("2024-01-01 10:00:00"), 7)],
        "event_id int, key string, ts timestamp, value int")
    out = asof_join(stream, tbl, key="key", value_cols=["value"],
                    ts_col="ts", tiebreak="event_id")
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    assert got == {1: None, 2: 7}


def test_flagship_pipelines(spark, sf_dir):
    """The three reference headline topologies, composed end-to-end."""
    from kafka_streams_examples_spark.registry import QUERIES

    charts = QUERIES["music_charts"].spark(spark, sf_dir)
    rows = charts.collect()
    by_genre = {}
    for r in rows:
        by_genre.setdefault(r["genre"], []).append(r)
    assert "__overall__" in by_genre
    for genre, chart in by_genre.items():
        assert len(chart) <= 5
        ordered = sorted(chart, key=lambda r: r["rnk"])
        plays = [r["plays"] for r in ordered]
        assert plays == sorted(plays, reverse=True)

    pv = QUERIES["pageview_region"].spark(spark, sf_dir)
    assert pv.filter(pv.region == "UNKNOWN").count() == 0  # all users known

    ov = QUERIES["order_validation"].spark(spark, sf_dir).cache()
    try:
        statuses = {r["status"] for r in ov.select("status").distinct().collect()}
        assert statuses <= {"VALIDATED", "FAILED"}
        # every order gets exactly one verdict
        from kafka_streams_examples_spark.catalog import table
        assert ov.count() == table(spark, sf_dir, "orders").count()
    finally:
        ov.unpersist()


def test_chunk_documents_boundaries(spark):
    from kafka_streams_examples_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c"),                      # shorter than one chunk
         (2, " ".join(f"t{i}" for i in range(64))),   # exactly one chunk size
         (3, " ".join(f"t{i}" for i in range(100)))], # 3 chunks
        "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in chunk_documents(docs, 64, 48).collect()}
    assert rows[(1, 0)]["n_chunk_tokens"] == 3
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    # n=64: starts 0 and 48 (48 < 64), second chunk is the 16-token tail
    assert rows[(2, 1)]["n_chunk_tokens"] == 16
    # n=100: starts 0, 48, 96; overlap check — chunk 1 starts at token 48
    assert rows[(3, 1)]["chunk_text"].split()[0] == "t48"
    assert rows[(3, 2)]["n_chunk_tokens"] == 4
    assert max(c for d, c in rows if d == 3) == 2


def test_global_shuffle_matches_naive_window(spark):
    """Two-phase range-bucketed ranking must equal the single-window
    row_number (the oracle form) and be a dense permutation."""
    from pyspark.sql import Window

    from kafka_streams_examples_spark.functions import md5_hash64
    from kafka_streams_examples_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {r["doc_id"]: r["pos"]
           for r in global_shuffle(df, "doc_id").collect()}
    h = md5_hash64(F.concat_ws("|", F.lit("s0"), F.col("doc_id").cast("string")))
    want = {r["doc_id"]: r["pos"] for r in df.select(
        "doc_id", F.row_number().over(Window.orderBy(h, "doc_id")).alias("pos")
    ).collect()}
    assert got == want
    assert sorted(got.values()) == list(range(1, 501))


def test_staged_order_groups_stages_and_shuffles_within(spark):
    """staged_order: dense 1..N permutation; stages occupy contiguous pos
    ranges in stage order; within a stage the order equals the naive
    (hash, key) window (so it IS global_shuffle restricted per stage,
    not id order)."""
    from pyspark.sql import Window

    from kafka_streams_examples_spark.functions import md5_hash64
    from kafka_streams_examples_spark.operators.sampling import staged_order

    df = spark.createDataFrame([(i, i % 3) for i in range(300)],
                               "doc_id long, stage int")
    rows = staged_order(df, "stage", "doc_id", seed="cur").collect()
    pos = {r.doc_id: r.pos for r in rows}
    assert sorted(pos.values()) == list(range(1, 301))
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r.pos)
    hi = 0
    for s in sorted(by_stage):
        ps = sorted(by_stage[s])
        assert ps[0] == hi + 1 and ps[-1] == hi + len(ps)  # contiguous
        hi = ps[-1]
    h = md5_hash64(F.concat_ws("|", F.lit("cur"),
                               F.col("doc_id").cast("string")))
    want = {r.doc_id: r.pos for r in df.select(
        "doc_id",
        F.row_number().over(Window.orderBy("stage", h, "doc_id"))
         .alias("pos")).collect()}
    assert pos == want
    # the within-stage order is a real shuffle, not ascending ids
    s0 = [d for d, _ in sorted(((r.doc_id, r.pos) for r in rows
                                if r.stage == 0), key=lambda t: t[1])]
    assert s0 != sorted(s0)
