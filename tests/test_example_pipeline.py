"""The examples/webtext_pipeline.py end-to-end demo must run green —
it chains extraction invariant, quality filter, dedup, sketches, rollup,
quantiles, heavy hitters, and snapshot/resume in one job."""

import json
import os
import subprocess
import sys


def test_example_pipeline_runs():
    proc = subprocess.run(
        [sys.executable, "examples/webtext_pipeline.py", "10000"],
        capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,  # headroom for this VM's documented ~3x host swings
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    summary = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert summary["rows"] == 10000
    assert 0 < summary["after_exact_dedup"] <= summary["kept_after_quality"]
    # sketch estimate cross-checks the exact dedup count
    est = summary["global_url_estimate"]
    exact = summary["after_exact_dedup"]
    assert abs(est - exact) / exact < 0.05
