"""Continuation of rescale_r4b: the fixed-world pair completed
(.rescale4b_fixed.json, efficiency 0.862 PASS) but the process was
killed before the vocabulary-scaled pair ran. Inputs are already
prebuilt in /dev/shm; this script runs ONLY the scaled pair and renders
BENCH_SCALING.md from the saved fixed result plus the fresh scaled one.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
import bench_scaling as bs  # noqa: E402

N_TURNS, REPLICATE, VOCAB = 4_000_000, 64, 16
SF_DIR = "/root/testdata/sf0.1"

if __name__ == "__main__":
    with open("/root/repo/.rescale4b_fixed.json") as f:
        fixed = json.load(f)

    bs.run = functools.partial(bs.run, repeats=1)

    scaled = bs.scale_pair(N_TURNS, SF_DIR, REPLICATE, vocab=VOCAB)
    with open("/root/repo/.rescale4b_scaled.json", "w") as f:
        json.dump(scaled, f)
    print("SCALED PAIR DONE", json.dumps(
        {k: scaled[k] for k in ("speedup", "scaling_efficiency")}))

    bs.render_report(fixed, scaled, N_TURNS * REPLICATE, VOCAB)
    print("RENDERED BENCH_SCALING.md")
