"""Smoke test for the spark-submit entry point (cdc/demo.py).

The demo is the north-rule deployment shape (BASELINE.json:
"spark-submit --py-files on a multi-executor cluster") and is advertised
in the README; round-1 ADVICE found a crash on its --events glob path,
so it gets a real end-to-end subprocess run, not just import coverage.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_self_contained_replay(tmp_path):
    """`python -m astro_data_pipeline_spark.cdc.demo --sf 0.001` must
    replay the cached fixture into the given table dir and print one JSON
    summary line with every batch committed."""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "astro_data_pipeline_spark.cdc.demo",
            "--sf",
            "0.001",
            "--cpus",
            "2",
            "--n-batches",
            "2",
            "--table",
            str(tmp_path / "lake"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["final_rows"] > 0
    assert len(summary["batches"]) == 2
    assert all(b["status"] == "applied" for b in summary["batches"])
    assert sum(b["rows_upserted"] for b in summary["batches"]) > 0
