"""Re-render BENCH_SCALING.md from the cached measurement JSONs
(.rescale4b_fixed.json / .rescale4b_scaled.json, plus the optional
.cc_scaling.json / .thread_curve.json appendices) without re-running the
multi-hour measurement pairs. Use after editing render_report or after a
new appendix measurement lands.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs  # noqa: E402

N_TURNS, REPLICATE, VOCAB = 4_000_000, 64, 16

if __name__ == "__main__":
    with open(os.path.join(bs.REPO, ".rescale4b_fixed.json")) as f:
        fixed = json.load(f)
    with open(os.path.join(bs.REPO, ".rescale4b_scaled.json")) as f:
        scaled = json.load(f)
    bs.render_report(fixed, scaled, N_TURNS * REPLICATE, VOCAB)
    print("RENDERED BENCH_SCALING.md")
