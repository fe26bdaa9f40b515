"""Bucketed state layout (state.py): partial upsert touches only the
buckets a batch's keys hash into, and point lookups prune to one bucket
directory — the two 100TB-scale properties VERDICT r1 flagged on the flat
layout (full-state rewrite per batch; full-scan get)."""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
from datetime import datetime

from pyspark.sql import functions as F

from kafka_streams_examples_spark.serving import DiskStateStore
from kafka_streams_examples_spark.state import BUCKET_COL, bucket_of
from kafka_streams_examples_spark.streaming.ktable import KTableMaterializer


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _bucket_digests(path: str) -> dict[str, str]:
    """bucket dir -> digest over its parquet file names + bytes."""
    out = {}
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        h = hashlib.sha256()
        d = os.path.join(path, entry)
        for fn in sorted(os.listdir(d)):
            if fn.startswith(("_", ".")):
                continue
            h.update(fn.encode())
            with open(os.path.join(d, fn), "rb") as f:
                h.update(f.read())
        out[entry] = h.hexdigest()
    return out


def test_partial_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch updating ONE key must leave every other bucket's files
    byte-identical — the partial-upsert contract."""
    src, state = tmp_path / "src", tmp_path / "state"
    schema = "user string, region string, ts timestamp"
    rows1 = [(f"u{i}", "old", ts("2024-01-01 10:00:00")) for i in range(64)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
         .write.mode("append").parquet(str(src))
    mat = KTableMaterializer(spark, str(state), ["user"], "ts", n_buckets=8)
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream.writeStream.outputMode("append").foreachBatch(mat).start()
    q.processAllAvailable()
    before = _bucket_digests(str(state))
    assert len(before) > 1, "64 keys over 8 buckets must span several dirs"

    # batch 2: one key moves
    spark.createDataFrame([("u7", "new", ts("2024-01-01 11:00:00"))], schema) \
         .coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()

    after = _bucket_digests(str(state))
    touched = f"{BUCKET_COL}={bucket_of(spark, ['u7'], 8)}"
    assert after[touched] != before[touched]
    for b in before:
        if b != touched:
            assert after[b] == before[b], f"untouched bucket {b} was rewritten"

    got = {r["user"]: r["region"] for r in mat.state().collect()}
    assert got["u7"] == "new"
    assert all(v == "old" for k, v in got.items() if k != "u7")
    assert len(got) == 64


def test_tombstone_deletes_key_in_its_bucket_only(spark, tmp_path):
    src, state = tmp_path / "src", tmp_path / "state"
    schema = "user string, region string, ts timestamp"
    rows = [(f"u{i}", "x", ts("2024-01-01 10:00:00")) for i in range(16)]
    spark.createDataFrame(rows, schema).coalesce(1) \
         .write.mode("append").parquet(str(src))
    mat = KTableMaterializer(spark, str(state), ["user"], "ts",
                             tombstone_col="region", n_buckets=4)
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream.writeStream.outputMode("append").foreachBatch(mat).start()
    q.processAllAvailable()
    before = _bucket_digests(str(state))
    # tombstone u3 (null region = delete)
    spark.createDataFrame([("u3", None, ts("2024-01-01 11:00:00"))], schema) \
         .coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    after = _bucket_digests(str(state))
    touched = f"{BUCKET_COL}={bucket_of(spark, ['u3'], 4)}"
    users = {r["user"] for r in mat.state().collect()}
    assert "u3" not in users and len(users) == 15
    for b in before:
        if b != touched:
            assert after.get(b) == before[b]


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path, sf_dir):
    """Q1 get(key): the scan must carry a PartitionFilter on the bucket
    column (reads 1 of n_buckets dirs) and a PushedFilter on the key
    (row-group pruning inside the bucket — files are key-sorted)."""
    from kafka_streams_examples_spark.catalog import table

    counts = (table(spark, sf_dir, "events")
              .groupBy("user_id").agg(F.count("*").alias("n")))
    store = DiskStateStore.materialize(counts, str(tmp_path / "st"),
                                       "user_id", n_buckets=8)
    key = counts.first()["user_id"]
    want = counts.filter(F.col("user_id") == key).first()["n"]
    got = store.get(key)
    assert len(got) == 1 and got[0]["n"] == want

    plan = _explain_str(store._pruned(key))
    assert "PartitionFilters" in plan and BUCKET_COL in plan.split(
        "PartitionFilters", 1)[1].split("\n", 1)[0]
    pushed = plan.split("PushedFilters", 1)[1].split("\n", 1)[0]
    assert "user_id" in pushed

    # pruning is real: exactly one of the 8 bucket dirs matches the filter
    dirs = [e for e in os.listdir(tmp_path / "st") if e.startswith(BUCKET_COL)]
    assert len(dirs) > 1


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """§2.8 exactly-once: foreachBatch may redeliver a batch after
    checkpoint recovery — applying the SAME batch twice must leave the
    LOGICAL state unchanged (the upsert is deterministic in
    (key, ts, tiebreak); rewritten parquet files carry fresh write UUIDs,
    so the contract is row identity, not byte identity)."""
    state = tmp_path / "state"
    mat = KTableMaterializer(spark, str(state), ["user"], "ts", n_buckets=4)
    batch = spark.createDataFrame(
        [("u1", "a", ts("2024-01-01 10:00:00")),
         ("u2", "b", ts("2024-01-01 10:00:00"))],
        "user string, region string, ts timestamp")
    mat(batch, 0)
    first = sorted(map(tuple, mat.state().collect()))
    mat(batch, 0)   # redelivery of the same epoch
    assert sorted(map(tuple, mat.state().collect())) == first
    got = {r["user"]: r["region"] for r in mat.state().collect()}
    assert got == {"u1": "a", "u2": "b"}


def test_materialize_and_streaming_upsert_share_layout(spark, tmp_path):
    """DiskStateStore.materialize and KTableMaterializer must agree on the
    bucket layout: a store bootstrapped via materialize() can be maintained
    incrementally by the streaming upsert at the same path."""
    path = str(tmp_path / "st")
    base = spark.createDataFrame(
        [(i, f"v{i}", ts("2024-01-01 10:00:00")) for i in range(20)],
        "k long, v string, ts timestamp")
    DiskStateStore.materialize(base, path, "k", n_buckets=4)
    mat = KTableMaterializer(spark, path, ["k"], "ts", n_buckets=4)
    upd = spark.createDataFrame([(3, "NEW", ts("2024-01-01 11:00:00"))],
                                "k long, v string, ts timestamp")
    mat(upd, 1)
    got = {r["k"]: r["v"] for r in mat.state().collect()}
    assert got[3] == "NEW" and len(got) == 20
    assert all(v == f"v{k}" for k, v in got.items() if k != 3)
    store = DiskStateStore(spark, path, "k", n_buckets=4)
    assert store.get(3)[0]["v"] == "NEW"


def test_composite_key_upsert_and_lookup(spark, tmp_path):
    """Multi-column keys: bucket fn hashes all key columns; get() with the
    full composite key still prunes to one bucket."""
    state = tmp_path / "state"
    mat = KTableMaterializer(spark, str(state), ["region", "user"], "ts",
                             n_buckets=4)
    b1 = spark.createDataFrame(
        [("eu", "u1", 1.0, ts("2024-01-01 10:00:00")),
         ("us", "u1", 2.0, ts("2024-01-01 10:00:00")),
         ("eu", "u2", 3.0, ts("2024-01-01 10:00:00"))],
        "region string, user string, v double, ts timestamp")
    mat(b1, 0)
    b2 = spark.createDataFrame(
        [("eu", "u1", 9.0, ts("2024-01-01 11:00:00"))],
        "region string, user string, v double, ts timestamp")
    mat(b2, 1)
    got = {(r["region"], r["user"]): r["v"] for r in mat.state().collect()}
    assert got == {("eu", "u1"): 9.0, ("us", "u1"): 2.0, ("eu", "u2"): 3.0}
    # same user, different region -> independent rows; bucket-pruned get
    assert mat.get(region="eu", user="u1")[0]["v"] == 9.0
    assert mat.get(region="us", user="u1")[0]["v"] == 2.0


def test_disk_store_range_and_all(spark, tmp_path, sf_dir):
    from kafka_streams_examples_spark.catalog import table

    counts = (table(spark, sf_dir, "events")
              .groupBy("user_id").agg(F.count("*").alias("n")))
    store = DiskStateStore.materialize(counts, str(tmp_path / "st2"),
                                       "user_id", n_buckets=4)
    assert store.all().count() == counts.count()
    lo, hi = 10, 50
    want = counts.filter(F.col("user_id").between(lo, hi)).count()
    assert store.range(lo, hi).count() == want
