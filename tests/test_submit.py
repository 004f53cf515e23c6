"""End-to-end smoke of the north rule's ship path: `spark-submit
--py-files <zip>` via scripts/submit.sh against a multi-executor
local-cluster master, then a second submit with the same workdir to prove
checkpoint resume survives the real deployment path (separate driver JVM,
package shipped as a zip, executors in their own JVMs) — not just the
in-process pytest session.

Reference analogue: the reference ships as a fat jar run by scripts/*.sh
(e.g. /root/reference/scripts/wdt21.sh); our equivalent is the
spark-submit contract named in BASELINE.json's north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SUBMIT = REPO / "scripts" / "submit.sh"


def _run_submit(input_path: str, workdir: str, *extra: str) -> dict:
    env = dict(os.environ, QSE_SPARK_DRIVER_MEM="4g")
    out = subprocess.run(
        ["bash", str(SUBMIT), "local-cluster[2,1,2048]", input_path, workdir,
         *extra],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-4000:]
    payload = [ln for ln in out.stdout.splitlines()
               if ln.startswith('{"shape_stat_rows"')]
    assert payload, f"no result JSON in stdout:\n{out.stdout[-4000:]}"
    return json.loads(payload[-1])


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_submit_pyfiles_runs_and_resumes(fixture_dir, tmp_path):
    workdir = str(tmp_path / "work")
    inp = os.path.join(fixture_dir, "transcripts.parquet")

    triples_out = str(tmp_path / "triples_out")
    cold = _run_submit(inp, workdir, "--triples-out", triples_out)
    assert cold["shape_stat_rows"] > 0
    stages = {c["stage"]: c for c in cold["stages"]}
    assert not any(c["resumed"] for c in stages.values())
    # per-partition lineage recorded for every stage (north rule)
    assert all(c["partition_counts"] for c in stages.values())
    # the partitioned canonical-triples materialization (north rule's
    # "partitioned Iceberg output"; parquet layout fallback on this image)
    assert cold["triples_out"] == triples_out
    assert any(d.startswith("predicate=") for d in os.listdir(triples_out))

    warm = _run_submit(inp, workdir)
    assert warm["shape_stat_rows"] == cold["shape_stat_rows"]
    assert all(c["resumed"] for c in warm["stages"])


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
