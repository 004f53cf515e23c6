"""One-off probe: CC round timings under config variants, to isolate what
caps the distributed star rounds' scaling (broadcast joins, shuffle
partition count, ...). Usage:
    python scripts/cc_probe.py <n_exec> <nodes> <chain_len> [nobcast]
Env: QSE_PROBE_SHUFFLE_PARTITIONS overrides spark.sql.shuffle.partitions.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from qse_spark.operators.cc import connected_components  # noqa: E402
from qse_spark.session import get_spark  # noqa: E402

n_exec, nodes, chain_len = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
nobcast = len(sys.argv) > 4 and sys.argv[4] == "nobcast"

extra = {}
if nobcast:
    extra = {"spark.sql.autoBroadcastJoinThreshold": "-1",
             "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
sp = os.environ.get("QSE_PROBE_SHUFFLE_PARTITIONS")
if sp:
    extra["spark.sql.shuffle.partitions"] = sp
spark = get_spark(master=f"local-cluster[{n_exec},1,6144]",
                  app_name=f"cc-probe-{n_exec}", extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
n_chains = nodes // chain_len
path = f"/dev/shm/qse-cc-input/n{nodes}_l{chain_len}"
if not os.path.isdir(path):
    (spark.range(n_chains, nodes)
     .select(F.format_string("n%08d", F.col("id")).alias("src"),
             F.format_string("n%08d", F.col("id") - n_chains).alias("dst"))
     .write.mode("overwrite").parquet(path))
edges = spark.read.parquet(path)
edges.limit(1_000).groupBy("src").count().count()   # steady-state warmup

t0 = time.monotonic()
comp = connected_components(edges, driver_threshold=0)
got = comp.agg(F.count("*").alias("n"),
               F.countDistinct("component").alias("c")).collect()[0]
sec = time.monotonic() - t0
assert got["n"] == nodes and got["c"] == n_chains
print(f"RESULT n_exec={n_exec} nobcast={nobcast} cc_sec={sec:.1f} "
      f"eps={(nodes - n_chains) / sec:.0f}")
spark.stop()
