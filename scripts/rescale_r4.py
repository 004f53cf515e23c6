"""Round-4 time-boxed re-measure of the two-world scaling evidence after
the mapInArrow extraction rewrite (2.8x faster p1): same harness as
bench_scaling.py but best-of-2 per config to fit the remaining round
budget, dumping each pair's JSON as it completes so a partial run can be
merged with the prior pair (render_report is already factored for that)."""
import functools, json, sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs

bs.run = functools.partial(bs.run.__wrapped__ if hasattr(bs.run, "__wrapped__") else bs.run, repeats=2)

n_turns, sf_dir, replicate, vocab = 4_000_000, "/root/testdata/sf0.1", 16, 16
fixed = bs.scale_pair(n_turns, sf_dir, replicate, vocab=1)
with open("/root/repo/.rescale_fixed.json", "w") as f:
    json.dump(fixed, f)
print("FIXED PAIR DONE", json.dumps({k: fixed[k] for k in ("speedup", "scaling_efficiency")}))
scaled = bs.scale_pair(n_turns, sf_dir, replicate, vocab=vocab)
with open("/root/repo/.rescale_scaled.json", "w") as f:
    json.dump(scaled, f)
print("SCALED PAIR DONE", json.dumps({k: scaled[k] for k in ("speedup", "scaling_efficiency")}))
bs.render_report(fixed, scaled, n_turns * replicate, vocab)
print("RENDERED BENCH_SCALING.md")
