"""Control-plane DAG semantics (telescope_data_processing.py analog):
retries, trigger rules, upstream-failure propagation, timeout via
Spark job-group cancellation, XCom passing, cycle detection."""

from __future__ import annotations

import time

import pytest

from astro_data_pipeline_spark.pipelines import Pipeline
from astro_data_pipeline_spark.pipelines.orchestrator import (
    ALL_DONE,
    ONE_FAILED,
)
from astro_data_pipeline_spark.pipelines.telescope import telescope_pipeline

SF = "/root/testdata/sf0.001"


def test_green_run_statuses_and_xcom(spark):
    """Linear + fan-out DAG: all success, values flow, notification
    (one_failed) skips, cleanup (all_done) still runs."""
    run = telescope_pipeline().run(spark, SF)
    st = {n: r.status for n, r in run.records.items()}
    assert st["send_failure_notification"] == "skipped"
    assert all(
        v == "success" for k, v in st.items() if k != "send_failure_notification"
    )
    assert run.ok
    # archive pulled submit's value through the context
    assert (
        run.records["archive_processed_data"].rows_out
        == run.records["submit_processing_jobs"].rows_out
    )


def test_retries_then_success(spark):
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return 7

    p = Pipeline("retry").add_task("flaky", flaky, retries=2)
    run = p.run(spark, SF)
    rec = run.records["flaky"]
    assert (rec.status, rec.attempts, rec.rows_out) == ("success", 3, 7)


def test_failure_propagates_and_notification_fires(spark):
    def boom(ctx):
        raise RuntimeError("hard failure")

    p = (
        Pipeline("fail")
        .add_task("a", lambda ctx: 1)
        .add_task("boom", boom, upstream=["a"], retries=1)
        .add_task("downstream", lambda ctx: 1, upstream=["boom"])
        .add_task("after", lambda ctx: 1, upstream=["downstream"])
        .add_task("cleanup", lambda ctx: 0, upstream=["downstream"],
                  trigger_rule=ALL_DONE)
        .add_task("notify", lambda ctx: 1, upstream=["a", "downstream"],
                  trigger_rule=ONE_FAILED)
    )
    run = p.run(spark, SF)
    st = {n: r.status for n, r in run.records.items()}
    assert st == {
        "a": "success",
        "boom": "failed",
        "downstream": "upstream_failed",
        "after": "upstream_failed",
        "cleanup": "success",
        "notify": "success",
    }
    assert run.records["boom"].attempts == 2  # retries=1 -> 2 attempts
    assert "hard failure" in run.records["boom"].error
    assert not run.ok


def test_parallel_branches_overlap(spark):
    """Independent branches must not serialize: two 0.4s tasks from one
    root should finish in well under 0.8s of branch time."""
    def slow(ctx):
        time.sleep(0.4)
        return 1

    p = (
        Pipeline("par", parallelism=4)
        .add_task("root", lambda ctx: 1)
        .add_task("b1", slow, upstream=["root"])
        .add_task("b2", slow, upstream=["root"])
        .add_task("join", lambda ctx: ctx.pull("b1") + ctx.pull("b2"),
                  upstream=["b1", "b2"])
    )
    t0 = time.time()
    run = p.run(spark, SF)
    assert run.ok
    assert run.records["join"].rows_out == 2
    b1, b2 = run.records["b1"], run.records["b2"]
    # overlap evidence: one branch started before the other finished
    assert b1.started_ms < b2.finished_ms and b2.started_ms < b1.finished_ms
    assert time.time() - t0 < 2.0


def test_timeout_cancels_spark_job_group(spark):
    """A hung Spark action must be interrupted on the cluster, not just
    abandoned: the long job's slot frees and the task records failed."""
    def hang(ctx):
        import time as _t

        # a genuinely running Spark action (mapped sleep over partitions)
        return (
            ctx.spark.range(64)
            .repartition(8)
            .rdd.map(lambda x: (_t.sleep(5), x)[1])
            .count()
        )

    p = Pipeline("tmo").add_task("hang", hang, retries=0, timeout_s=2.0)
    t0 = time.time()
    run = p.run(spark, SF)
    dt = time.time() - t0
    rec = run.records["hang"]
    assert rec.status == "failed"
    assert "timeout" in rec.error.lower()
    assert dt < 15, f"cancelJobGroup did not interrupt the action ({dt:.1f}s)"


def test_cycle_detection(spark):
    p = Pipeline("cyc")
    p.add_task("a", lambda ctx: 1)
    p.add_task("b", lambda ctx: 1, upstream=["a"])
    # wire a cycle behind the validation (simulating a bad edit)
    p._tasks["a"].upstream = ("b",)
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark, SF)


def test_duplicate_and_unknown_task_validation(spark):
    p = Pipeline("val").add_task("a", lambda ctx: 1)
    with pytest.raises(ValueError, match="duplicate"):
        p.add_task("a", lambda ctx: 1)
    with pytest.raises(ValueError, match="unknown upstream"):
        p.add_task("b", lambda ctx: 1, upstream=["nope"])
    with pytest.raises(ValueError, match="trigger_rule"):
        p.add_task("c", lambda ctx: 1, trigger_rule="sometimes")
