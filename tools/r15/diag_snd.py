"""VERDICT item 8 diagnostic: where does stream_near_dup's wall go —
query startup or batch execution? Reads recentProgress durations."""
import json, os, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.session import get_spark
from kafka_streams_examples_spark.streaming.core import run_to_memory, stream_table
from kafka_streams_examples_spark.streaming.dedup import near_dup_index, stream_near_dup

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("diag-snd", cpus=32, shuffle_partitions=32)
docs_b = table(spark, sf_dir, "documents")
idx = near_dup_index(docs_b.filter(F.col("doc_id") % 10 != 7)).localCheckpoint(eager=False)
idx.count()
for rep in range(3):
    t0 = time.time()
    df = stream_near_dup(stream_table(spark, sf_dir, "documents")
                         .filter(F.col("doc_id") % 10 == 7), idx, threshold=0.2)
    _, q = run_to_memory(df, mode="append")
    wall = time.time() - t0
    prog = [p if isinstance(p, dict) else json.loads(str(p.json)) for p in q.recentProgress]
    batch_ms = [(p["batchId"], p["durationMs"].get("triggerExecution"),
                 p["numInputRows"]) for p in prog]
    q.stop()
    print(f"rep{rep}: wall={wall:.2f}s batches={batch_ms}", flush=True)
