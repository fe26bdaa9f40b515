"""cProfile the CONSTRUCTION of a query (no action): where do the py4j
round-trips and Catalyst-touching calls come from?"""
import cProfile, pstats, io, os, sys
sys.path.insert(0, ".")
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

name = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof-build", cpus=32, shuffle_partitions=32)
QUERIES["tpch_q1"].spark(spark, sf_dir).count()
# one construction warm (catalog memo), then profile the second
QUERIES[name].spark(spark, sf_dir)
pr = cProfile.Profile()
pr.enable()
QUERIES[name].spark(spark, sf_dir)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue())
