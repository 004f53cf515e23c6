"""Round-5 scaling campaign — the three pipeline pairs the round-4
verdict asked for, on one vocabulary-scaled world:

  normal     the standard exact pipeline (re-measures p2_linking with the
             round-5 broadcast verify; target: stage efficiency >= 0.8)
  cc_dist    QSE_BENCH_CC_DISTRIBUTED=1 — driver_threshold=0, so the e2e
             evidence includes REAL large/small-star rounds (verdict #8)
  approx     QSE_BENCH_APPROX=1 — the QSE-Approximate A1-A6 stats path at
             bench scale (verdict #9)

World: 64M turns (4M fixture x 16 replicate), vocab_mult=16 — the same
entity world as the round-4 256M-turn pair (entity caps depend on
vocab_mult, not corpus size, at these sizes), so the back-half stages do
the same corpus-proportional work at a quarter of the
extraction-dominated wall time. One pass per level (each pass is minutes
long, far above the sandbox stall scale — same protocol as the round-4
256M pairs).

Writes .r5_pipeline_scaling.json; render via scripts/render_bench_scaling
or read directly.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import scale_pair  # noqa: E402

N_TURNS = 4_000_000
SF = "/root/testdata/sf0.1"
REPLICATE = 16
VOCAB = 16


def main() -> None:
    which = sys.argv[1:] or ["normal", "cc_dist", "approx"]
    out_path = os.path.join(REPO, ".r5_pipeline_scaling.json")
    report = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)
    flags = {"normal": {}, "cc_dist": {"QSE_BENCH_CC_DISTRIBUTED": "1"},
             "approx": {"QSE_BENCH_APPROX": "1"}}
    for name in which:
        for k in ("QSE_BENCH_CC_DISTRIBUTED", "QSE_BENCH_APPROX"):
            os.environ.pop(k, None)
        os.environ.update(flags[name])
        r = scale_pair(N_TURNS, SF, REPLICATE, vocab=VOCAB, repeats=1)
        report[name] = r
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(name, json.dumps(r))


if __name__ == "__main__":
    main()
