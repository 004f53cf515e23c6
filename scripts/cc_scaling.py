"""Distributed-CC scaling microbench ABOVE the driver-hybrid threshold.

BENCH_SCALING.md's pipeline pairs never exercise the distributed
large-star/small-star path: both bench worlds' link graphs stay under the
500K-edge driver-union-find threshold, so the p3_cc per-stage ratio there
measures the deliberate hybrid (flat by design), not the star rounds that
run at 100 TB. This harness times qse_spark.operators.cc
.connected_components on a synthetic chain graph — C chains of length L,
C*(L-1) edges, far above the threshold, driver_threshold=0 to force the
distributed path — at 1 vs 4 single-core executor JVMs, same protocol as
scripts/bench_scaling.py (separate JVMs, tmpfs shuffle dirs, identical
pre-generated input read from tmpfs parquet).

Chains are the honest shape: their diameter forces multiple star rounds
(a star-shaped graph would converge in one), and string node ids with a
zero-padded numeric suffix keep component = min(node) checkable in O(1):
chain k's minimum is n<k>.

Usage:  python scripts/cc_scaling.py [nodes] [chain_len] [repeats]
Child:  python scripts/cc_scaling.py --child <n_exec> <nodes> <chain_len>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/dev/shm/qse-cc-input"
# cache-buster: bump whenever the generator changes (round-4 advice)
GEN_VERSION = 1


def child(n_exec: int, nodes: int, chain_len: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from qse_spark.operators.cc import connected_components
    from qse_spark.session import get_spark

    spark = get_spark(master=f"local-cluster[{n_exec},1,6144]",
                      app_name=f"cc-scaling-{n_exec}")
    spark.sparkContext.setLogLevel("ERROR")
    n_chains = nodes // chain_len
    path = f"{INPUT}/n{nodes}_l{chain_len}_v{GEN_VERSION}"
    if not os.path.isdir(path):
        # chain k = nodes {k, k+C, k+2C, ...}: edge (id, id-C) for id >= C
        (spark.range(n_chains, nodes)
         .select(F.format_string("n%08d", F.col("id")).alias("src"),
                 F.format_string("n%08d", F.col("id") - n_chains)
                 .alias("dst"))
         .write.mode("overwrite").parquet(path))
    edges = spark.read.parquet(path)
    # steady-state measurement: force executor registration + codegen
    # warm-up before the clock starts (a real cluster amortizes this
    # over hours; here it would otherwise tax the faster side 4x harder)
    edges.limit(1_000).groupBy("src").count().count()

    t0 = time.monotonic()
    comp = connected_components(edges, driver_threshold=0)
    got = comp.agg(F.count("*").alias("n"),
                   F.countDistinct("component").alias("c")).collect()[0]
    cc_sec = time.monotonic() - t0
    assert got["n"] == nodes, (got["n"], nodes)
    assert got["c"] == n_chains, (got["c"], n_chains)
    print(json.dumps({"n_exec": n_exec, "nodes": nodes,
                      "edges": nodes - n_chains, "chain_len": chain_len,
                      "components": got["c"],
                      "cc_sec": round(cc_sec, 3),
                      "edges_per_sec": round((nodes - n_chains) / cc_sec,
                                             1)}))
    spark.stop()


def run_level(n_exec: int, nodes: int, chain_len: int, repeats: int) -> dict:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/dev/shm/qse-spark-local",
               QSE_SPARK_DRIVER_MEM="8g")
    best = None
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(n_exec), str(nodes), str(chain_len)],
            env=env, capture_output=True, text=True, timeout=3600,
            check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith('{"n_exec"')][-1]
        r = json.loads(line)
        if best is None or r["cc_sec"] < best["cc_sec"]:
            best = r
    return best


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lo = run_level(1, nodes, chain_len, repeats)
    print("LO", json.dumps(lo))
    hi = run_level(4, nodes, chain_len, repeats)
    print("HI", json.dumps(hi))
    eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / 4
    report = {"graph": {"nodes": nodes, "chain_len": chain_len,
                        "edges": lo["edges"],
                        "components": lo["components"]},
              "local_low": lo, "local_high": hi,
              "speedup": round(hi["edges_per_sec"] / lo["edges_per_sec"], 3),
              "scaling_efficiency": round(eff, 3),
              "criterion": ">= 0.8", "pass": eff >= 0.8}
    with open(os.path.join(REPO, ".cc_scaling.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
