"""spark-submit entry point for the full KG-construction pipeline.

Runs transcripts -> triples -> links -> canonical map -> canonical triples
-> QSE shape stats with per-stage checkpoints in --workdir (resumable: a
rerun with the same config skips completed stages via their manifests).

Submitted by scripts/submit.sh via --py-files; also runnable directly:
  python scripts/run_pipeline.py --input <transcripts.parquet> --workdir w
With no --input, generates the deterministic seed-42 fixture (100k turns)
so the script is self-contained for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="transcripts parquet (conv_id, turn_idx, role, "
                         "text, tool, ts)")
    ap.add_argument("--workdir", default="/tmp/qse-pipeline-work")
    ap.add_argument("--tau", type=float, default=0.55)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--scorer", choices=["jaccard", "tfidf"],
                    default="jaccard")
    ap.add_argument("--approx", action="store_true",
                    help="QSE-Approximate: sampling-adjusted statistics")
    ap.add_argument("--approx-max-cap", type=int, default=1000)
    ap.add_argument("--approx-target-pct", type=float, default=100.0)
    ap.add_argument("--fixture-turns", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from qse_spark.pipeline import PipelineConfig, run_pipeline

    spark = SparkSession.builder.getOrCreate()   # conf comes from spark-submit
    spark.sparkContext.setLogLevel("WARN")

    inp = args.input
    if inp is None:
        from qse_spark.testdata import ensure_fixture
        inp = os.path.join(ensure_fixture(seed=42,
                                          n_turns=args.fixture_turns),
                           "transcripts.parquet")

    counters: list = []
    t0 = time.time()
    out = run_pipeline(spark, inp, workdir=args.workdir,
                       config=PipelineConfig(
                           tau=args.tau, salt=args.salt, scorer=args.scorer,
                           approx=args.approx,
                           approx_max_cap=args.approx_max_cap,
                           approx_target_pct=args.approx_target_pct),
                       counters=counters)
    n = out["shape_stats"].count()
    print(json.dumps({"shape_stat_rows": n,
                      "elapsed_sec": round(time.time() - t0, 2),
                      "stages": counters}))
    spark.stop()


if __name__ == "__main__":
    main()
