"""Driver-contract and bench-harness consistency guards (no Spark jobs)."""


def test_bench_headline_is_subset_of_registry():
    import bench
    from kafka_streams_examples_spark.registry import QUERIES
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_entry_queries_and_oracles_align():
    import __spark_entry__ as E
    from kafka_streams_examples_spark.registry import QUERIES
    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(QUERIES)
    # every declared oracle key must be a real query; every query in this
    # registry carries a full oracle (no rows-only entries left)
    assert set(o) == set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
