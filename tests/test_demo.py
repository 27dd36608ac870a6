"""Smoke test for the spark-submit entry point (cdc/demo.py).

The demo is the north-rule deployment shape (BASELINE.json:
"spark-submit --py-files on a multi-executor cluster") and is advertised
in the README; round-1 ADVICE found a crash on its --events glob path,
so it gets a real end-to-end subprocess run, not just import coverage.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

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


def test_demo_spark_submit_pyfiles_zip(tmp_path):
    """The literal north-rule deployment: `spark-submit --py-files
    adps.zip demo.py --events ...`. The primary resource is a COPY of
    demo.py outside the repo, run from a neutral cwd, so the engine can
    only come from the zip on the driver's PYTHONPATH — the exact
    import context a cluster submit gets (round-1 ADVICE found the
    previous form crashed; this pins the fixed one)."""
    # package zip, same layout as scripts/bench_scaling._build_pyfiles_zip
    pyz = tmp_path / "adps.zip"
    pkg = os.path.join(REPO, "astro_data_pipeline_spark")
    with zipfile.ZipFile(pyz, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    # deterministic WAL segments (pandas-only generator, no Spark)
    sys.path.insert(0, REPO)
    try:
        from bench import cdc_fixture_dir
    finally:
        sys.path.pop(0)
    meta = cdc_fixture_dir(0.001)
    script = tmp_path / "demo.py"
    shutil.copyfile(os.path.join(pkg, "cdc", "demo.py"), script)
    import pyspark

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not found"
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[2]",
            "--py-files",
            str(pyz),
            str(script),
            "--events",
            meta["v1_path"],
            meta["v2_path"],
            "--n-batches",
            "2",
            "--table",
            str(tmp_path / "lake"),
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=480,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["final_rows"] > 0
    assert len(summary["batches"]) == 2
    assert all(b["status"] == "applied" for b in summary["batches"])


def test_demo_wap_branch_publish(tmp_path):
    """--wap-branch replays into a branch, audits the branch view, and
    publishes to main only on pass — the WAP flow in the deployment
    shape. The published table must equal a direct replay's row count,
    and the branch must be gone afterwards."""
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
            "--wap-branch",
            "staging",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["wap"]["audit"] == "pass"
    assert summary["wap"]["published_snapshot"] is not None
    assert summary["final_rows"] > 0
    # published and cleaned up: only the main ref remains on disk
    meta = os.listdir(os.path.join(str(tmp_path / "lake"), "metadata"))
    assert not [f for f in meta if f.startswith("ref-")]
