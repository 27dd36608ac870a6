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


def test_timeout_fails_task_and_run_returns_promptly(spark):
    """Execution-timeout contract: the task records failed at timeout_s
    and the DAG run returns immediately — it must NOT block on the hung
    attempt (cluster-side cancelJobGroup of the attempt's job group is
    issued best-effort; the abandoned thread unwinds on its own)."""
    def hang(ctx):
        import time as _t

        # a genuinely running Spark action (one 5s wave of mapped sleeps)
        return (
            ctx.spark.range(8)
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
    assert dt < 4.5, f"run blocked on the hung attempt ({dt:.1f}s)"


def test_cycle_detection(spark):
    p = Pipeline("cyc")
    p.add_task("a", lambda ctx: 1)
    p.add_task("b", lambda ctx: 1, upstream=["a"])
    # wire a cycle behind the validation (simulating a bad edit)
    p._tasks["a"].upstream = ("b",)
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark, SF)


def _branch_dag(decider):
    from astro_data_pipeline_spark.pipelines.orchestrator import NONE_FAILED

    return (
        Pipeline("br")
        .add_task("probe", lambda ctx: 10)
        .add_task("decide", decider, upstream=["probe"], branch=True)
        .add_task("critical", lambda ctx: 1, upstream=["decide"])
        .add_task("warning", lambda ctx: 1, upstream=["decide"])
        .add_task("healthy", lambda ctx: 1, upstream=["decide"])
        .add_task("report", lambda ctx: 99,
                  upstream=["critical", "warning", "healthy"],
                  trigger_rule=NONE_FAILED)
    )


def test_branch_routes_one_path_and_none_failed_fans_in(spark):
    """BranchPythonOperator shape: exactly the chosen downstream runs,
    siblings skip, and the none_failed report still fires."""
    run = _branch_dag(lambda ctx: "warning").run(spark, SF)
    st = {n: r.status for n, r in run.records.items()}
    assert st == {
        "probe": "success",
        "decide": "success",
        "critical": "skipped",
        "warning": "success",
        "healthy": "skipped",
        "report": "success",
    }
    assert run.records["decide"].chosen == ("warning",)
    assert run.records["decide"].rows_out is None
    assert run.records["report"].rows_out == 99
    assert run.ok
    # skipped siblings never ran
    assert run.records["critical"].attempts == 0


def test_branch_multi_choice_and_skip_propagation(spark):
    """A branch may follow several paths; deselected subtrees propagate
    skipped through all_success descendants."""
    p = _branch_dag(lambda ctx: ["critical", "healthy"])
    p.add_task("after_warning", lambda ctx: 1, upstream=["warning"])
    run = p.run(spark, SF)
    st = {n: r.status for n, r in run.records.items()}
    assert st["critical"] == st["healthy"] == "success"
    assert st["warning"] == "skipped"
    assert st["after_warning"] == "skipped"  # propagated
    assert st["report"] == "success"


def test_branch_deselects_all_done_downstream_too(spark):
    """Airflow's NotPreviouslySkippedDep: a branch's not-taken DIRECT
    downstream skips regardless of trigger rule — an all_done cleanup
    wired under a branch must not run the not-taken path."""
    from astro_data_pipeline_spark.pipelines.orchestrator import ALL_DONE

    p = (
        Pipeline("brd")
        .add_task("decide", lambda ctx: "taken", branch=True)
        .add_task("taken", lambda ctx: 1, upstream=["decide"])
        .add_task("not_taken_cleanup", lambda ctx: 1, upstream=["decide"],
                  trigger_rule=ALL_DONE)
    )
    run = p.run(spark, SF)
    assert run.records["taken"].status == "success"
    assert run.records["not_taken_cleanup"].status == "skipped"


def test_nonfinite_float_result_succeeds_with_null_rows_out(spark):
    """A task legitimately returning NaN (e.g. a rate over an empty
    slice) must succeed with a null manifest metric, not fail on the
    int() coercion after its value already reached the xcom store."""
    p = Pipeline("nan").add_task("rate", lambda ctx: float("nan"), retries=0)
    run = p.run(spark, SF)
    rec = run.records["rate"]
    assert rec.status == "success"
    assert rec.attempts == 1
    assert rec.rows_out is None
    import math

    assert math.isnan(run.xcom["rate"])


def test_timeout_never_retries_concurrently(spark):
    """A timed-out attempt stuck in DRIVER-side Python (which
    cancelJobGroup cannot interrupt) must not overlap with its retry:
    after one extra timeout of grace the task fails outright, with the
    fn having run exactly once — never two live copies of a
    non-idempotent task (Airflow kills the worker process; a thread can
    only be walked away from)."""
    calls = {"n": 0}

    def stuck(ctx):
        calls["n"] += 1
        time.sleep(8)  # driver-side: immune to job-group cancellation
        return 1

    p = Pipeline("ctmo").add_task("stuck", stuck, retries=2, timeout_s=1.0)
    t0 = time.time()
    run = p.run(spark, SF)
    dt = time.time() - t0
    rec = run.records["stuck"]
    assert rec.status == "failed"
    assert "refusing concurrent retry" in rec.error
    assert rec.attempts == 1
    assert calls["n"] == 1, "retry overlapped the live cancelled attempt"
    assert dt < 6.0, f"run blocked on the hung attempt ({dt:.1f}s)"


def test_timeout_grace_completed_value_accepted_without_retry(spark):
    """If the cancelled attempt COMPLETES during the grace window, its
    side effects already happened — the orchestrator must accept its
    value rather than retry (a retry would run a non-idempotent task's
    effects twice, the very hazard the concurrent-retry refusal
    guards)."""
    calls = {"n": 0}

    def slow_success(ctx):
        calls["n"] += 1
        time.sleep(1.5)  # > timeout, < timeout + grace
        return 7

    p = Pipeline("gtmo").add_task(
        "t", slow_success, retries=1, timeout_s=1.0
    )
    run = p.run(spark, SF)
    rec = run.records["t"]
    assert rec.status == "success"
    assert rec.attempts == 1
    assert rec.rows_out == 7
    assert calls["n"] == 1  # the work ran exactly once


def test_timeout_grace_failed_attempt_retries_sequentially(spark):
    """When the cancelled attempt DIES within the grace window (no
    value produced), it is no longer executing — the retry proceeds
    sequentially and can succeed."""
    calls = {"n": 0}

    def slow_fail_then_fast(ctx):
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(1.5)  # > timeout, < timeout + grace
            raise RuntimeError("attempt one unwound")
        return 7

    p = Pipeline("gtmo2").add_task(
        "t", slow_fail_then_fast, retries=1, timeout_s=1.0
    )
    run = p.run(spark, SF)
    rec = run.records["t"]
    assert rec.status == "success"
    assert rec.attempts == 2
    assert rec.rows_out == 7
    assert calls["n"] == 2


def test_branch_returning_none_skips_all_downstream(spark):
    """Airflow contract: a BranchPythonOperator returning None follows
    no path — every direct downstream skips, and a none_failed fan-in
    still runs over the all-skipped upstreams."""
    run = _branch_dag(lambda ctx: None).run(spark, SF)
    st = {n: r.status for n, r in run.records.items()}
    assert st["decide"] == "success"
    assert run.records["decide"].chosen == ()
    assert st["critical"] == st["warning"] == st["healthy"] == "skipped"
    assert st["report"] == "success"  # none_failed fan-in


def test_branch_choosing_unknown_task_fails_the_branch(spark):
    run = _branch_dag(lambda ctx: "no_such_task").run(spark, SF)
    assert run.records["decide"].status == "failed"
    assert "unknown task" in run.records["decide"].error
    # downstream of a FAILED branch is upstream_failed, not skipped
    assert run.records["critical"].status == "upstream_failed"
    assert run.records["report"].status == "upstream_failed"


def test_dag_retry_composes_with_exactly_once_resume(spark, tmp_path):
    """Control plane × data plane: an ingest task killed mid-replay is
    retried by the orchestrator (batch_processing_dag retry semantics),
    and the retry RESUMES from the committed prefix instead of
    re-applying it — the exactly-once sink makes Airflow-style blind
    retries safe. Final state must equal the pandas oracle."""
    import pandas as pd

    from astro_data_pipeline_spark.cdc import apply as A
    from astro_data_pipeline_spark.cdc.fixtures import (
        generate_change_log,
        load_events_pandas,
    )
    from astro_data_pipeline_spark.cdc.oracle import replay_reference
    from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
    from astro_data_pipeline_spark.lakehouse import LakeTable
    from pyspark.sql import types as T

    meta = generate_change_log(
        str(tmp_path / "log"), n_repos=10, n_keys=200, n_events=1500
    )
    table = LakeTable.create(
        spark,
        str(tmp_path / "lake"),
        T.StructType(A.BASE_TABLE_FIELDS),
        key_cols=A.KEY_COLS,
        n_buckets=4,
    )
    seen = {"attempt": 0, "skipped": None}

    def ingest(ctx):
        seen["attempt"] += 1
        events = read_event_log(spark, meta["v1_path"], meta["v2_path"])
        runner = CdcRunner(spark, table, run_id="dagingest", mode="mor")
        # first attempt dies after 2 of 4 committed batches (simulated
        # executor loss); the orchestrator's retry must converge
        fail_after = 2 if seen["attempt"] == 1 else None
        reports = runner.replay(events, n_batches=4, fail_after=fail_after)
        seen["skipped"] = sum(1 for r in reports if r.status == "skipped")
        return sum(1 for r in reports if r.status == "applied")

    def verify(ctx):
        return table.read().count()

    run = (
        Pipeline("ingest")
        .add_task("replay_wal", ingest, retries=2)
        .add_task("verify_counts", verify, upstream=["replay_wal"])
        .run(spark, str(tmp_path))
    )
    assert run.ok
    rec = run.records["replay_wal"]
    assert rec.attempts == 2  # one kill, one clean retry
    assert seen["skipped"] == 2, "retry must skip the committed prefix"
    assert rec.rows_out == 2  # only the uncommitted batches re-applied
    # end state byte-equal to the oracle despite the mid-run kill
    oracle = replay_reference(load_events_pandas(meta))
    got = (
        table.read()
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["repo", "path", "content_sha256", "last_lsn"]],
        exp[["repo", "path", "content_sha256", "last_lsn"]],
        check_dtype=False,
    )
    assert run.records["verify_counts"].rows_out == len(exp)


def test_algorithm_comparison_template_is_parameterized(spark):
    """The template must build a working DAG from ANY list of
    registered query names (the reference's algorithms_to_compare
    param), rank by metric, and fail discovery on unknown names."""
    from astro_data_pipeline_spark.pipelines.research import (
        algorithm_comparison_pipeline,
    )

    algos = ("dedup_exact_by_sha", "text_quality_filter_verdict")
    run = algorithm_comparison_pipeline("custom_step", algos).run(
        spark, "/root/testdata/sf0.001"
    )
    assert run.ok
    assert run.records["discover_available_algorithms"].rows_out == 2
    counts = {
        a: run.records[f"test_algorithm_{a}"].rows_out for a in algos
    }
    assert all(isinstance(c, int) for c in counts.values())
    ranking = run.xcom["comparison_ranking"]
    assert sorted(ranking) == sorted(algos)
    # ranking is by metric desc, name asc
    assert counts[ranking[0]] >= counts[ranking[1]]
    # unknown algorithm -> discovery fails, fan-out never runs
    bad = algorithm_comparison_pipeline("x", ("no_such_query",)).run(
        spark, "/root/testdata/sf0.001"
    )
    assert bad.records["discover_available_algorithms"].status == "failed"
    assert bad.records["test_algorithm_no_such_query"].status == "upstream_failed"


def test_quality_evaluate_branch_logic():
    """evaluate_overall_quality reimplements the reference's rule
    exactly (data_quality_monitoring.py:405-412): any CRITICAL wins,
    then WARNINGs > 30% of metrics, else healthy."""
    from astro_data_pipeline_spark.pipelines.orchestrator import PipelineContext
    from astro_data_pipeline_spark.pipelines.quality import (
        ANALYZERS,
        evaluate_overall_quality,
    )

    def ctx_with(statuses):
        ctx = PipelineContext(spark=None, sf_dir="")
        ms = [
            {"metric": f"m{i}", "value": 0.0, "status": s}
            for i, s in enumerate(statuses)
        ]
        ctx._push(ANALYZERS[0], ms[:2])
        ctx._push(ANALYZERS[1], ms[2:4])
        ctx._push(ANALYZERS[2], ms[4:])
        return ctx

    crit = ["PASS", "PASS", "PASS", "PASS", "CRITICAL"]
    assert evaluate_overall_quality(ctx_with(crit)) == "send_critical_alert"
    # 2/5 = 40% warnings > 30% -> warning path
    warn = ["WARNING", "WARNING", "PASS", "PASS", "PASS"]
    assert evaluate_overall_quality(ctx_with(warn)) == "send_warning_alert"
    # 1/5 = 20% warnings -> healthy
    ok = ["WARNING", "PASS", "PASS", "PASS", "PASS"]
    assert evaluate_overall_quality(ctx_with(ok)) == "log_healthy_status"


def test_duplicate_and_unknown_task_validation(spark):
    p = Pipeline("val").add_task("a", lambda ctx: 1)
    with pytest.raises(ValueError, match="duplicate"):
        p.add_task("a", lambda ctx: 1)
    with pytest.raises(ValueError, match="unknown upstream"):
        p.add_task("b", lambda ctx: 1, upstream=["nope"])
    with pytest.raises(ValueError, match="trigger_rule"):
        p.add_task("c", lambda ctx: 1, trigger_rule="sometimes")
