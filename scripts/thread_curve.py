"""Measure the sandbox's single-JVM thread-scaling curve for the
extraction stage (the pipeline's dominant cost) and write
.thread_curve.json, which bench_scaling.py embeds as an appendix in
BENCH_SCALING.md.

Each point runs in a fresh subprocess/JVM: read the replicated fixture,
warm one python worker per slot, then time extract_triples().count()
twice and keep the best (defeats erratic co-tenant stalls).

Usage: python scripts/thread_curve.py [input_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from qse_spark.session import get_spark
from qse_spark.operators.extraction import extract_triples
spark = get_spark(master="local[{n}]", app_name="thread-curve")
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({path!r})
slots = spark.sparkContext.defaultParallelism
spark.range(slots * 4, numPartitions=slots * 4) \
    .mapInPandas(lambda it: it, "id long").count()
best = None
for _ in range(2):
    t = time.time(); extract_triples(df).count(); dt = time.time() - t
    best = dt if best is None or dt < best else best
print("RESULT", round(best, 2))
spark.stop()
"""


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/dev/shm/qse-bench-input/turns200000x16"
    curve = {}
    for n in (1, 2, 4, 8, 16, 32):
        out = subprocess.run(
            [sys.executable, "-c",
             _CHILD.format(repo=REPO, n=n, path=path)],
            capture_output=True, text=True, timeout=1800, check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")][-1]
        curve[str(n)] = float(line.split()[1])
        print(n, curve[str(n)], flush=True)
    with open(os.path.join(REPO, ".thread_curve.json"), "w") as f:
        json.dump({"input": path, "extract_sec": curve}, f)


if __name__ == "__main__":
    main()
