"""REST interactive-query layer (SURVEY §2.7): the reference's endpoint
shapes served over the StateStore surface, including the Q7 long-poll
read-your-writes GET (OrdersService.java:148-187)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from kafka_streams_examples_spark.rest import InteractiveQueryService
from kafka_streams_examples_spark.serving import StateStore


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def service(spark):
    counts = spark.createDataFrame(
        [("alpha", 3), ("beta", 1), ("kafka", 5)], "word string, cnt long")
    svc = InteractiveQueryService(poll_interval=0.05)
    svc.register("word-count", StateStore(counts, "word"))
    svc.start()
    yield svc
    svc.stop()


def test_rest_point_scan_range(service):
    port = service.port
    status, rows = _get(port, "/state/keyvalue/word-count/kafka")   # Q1
    assert status == 200 and rows == [{"word": "kafka", "cnt": 5}]

    _, rows = _get(port, "/state/keyvalues/word-count/all")         # Q2
    assert {r["word"]: r["cnt"] for r in rows} == \
        {"alpha": 3, "beta": 1, "kafka": 5}

    _, rows = _get(port, "/state/keyvalues/word-count/range/a/c")   # Q3
    assert sorted(r["word"] for r in rows) == ["alpha", "beta"]


def test_rest_missing_store_and_key(service):
    port = service.port
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/state/keyvalue/nope/k")
    assert ei.value.code == 404
    status, rows = _get(port, "/state/keyvalue/word-count/nothere")
    assert status == 200 and rows == []


def test_rest_long_poll_read_your_writes(service, spark):
    """Q7: a GET for a not-yet-materialized key blocks until the store
    catches up (the streaming upsert swap), then returns it — the
    reference's outstanding-requests contract, minus the cluster hop."""
    port = service.port
    result = {}

    def poll():
        result["resp"] = _get(
            port, "/orders/word-count/omega?timeout=5000")

    t = threading.Thread(target=poll)
    t.start()
    # simulate the KTableMaterializer upsert landing mid-poll
    updated = spark.createDataFrame(
        [("alpha", 3), ("omega", 9)], "word string, cnt long")
    service.register("word-count", StateStore(updated, "word"))
    t.join(timeout=30)
    assert not t.is_alive()
    status, rows = result["resp"]
    assert status == 200 and rows == [{"word": "omega", "cnt": 9}]


def test_rest_long_poll_timeout(service):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(service.port, "/orders/word-count/never?timeout=300")
    assert ei.value.code == 404


def test_rest_search_over_persisted_bm25_index(spark, tmp_path):
    """The retrieval-family interactive query: GET /search/{index}/{q}
    serves top-k doc ids + scores straight from the persisted BM25
    index via the same joins the batch contract uses."""
    from kafka_streams_examples_spark.operators.retrieval import (
        build_bm25_index,
    )
    from kafka_streams_examples_spark.rest import InteractiveQueryService
    from kafka_streams_examples_spark.serving import SearchIndex

    docs = spark.createDataFrame(
        [(0, "spark shuffle join spark"),
         (1, "join window agg"),
         (2, "spark spark spark filter"),
         (3, "window window shuffle agg filter")],
        ["doc_id", "text"])
    build_bm25_index(docs, str(tmp_path / "idx"))
    svc = InteractiveQueryService().start()
    try:
        svc.register("docs", SearchIndex(spark, str(tmp_path / "idx")))
        status, rows = _get(svc.port, "/search/docs/spark%20shuffle?k=2")
        assert status == 200 and len(rows) == 2
        assert rows[0]["rnk"] == 1
        # the spark-heavy docs outrank the sparkless ones
        assert rows[0]["c_id"] in (0, 2)
        # unknown index -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(svc.port, "/search/nope/spark")
        assert ei.value.code == 404
    finally:
        svc.stop()
