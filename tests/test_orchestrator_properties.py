"""Property tests: the concurrent DAG scheduler must agree with a
sequential declarative evaluation of the same graph, for every DAG
shape, trigger-rule mix, and failure pattern.

The reference evaluator below is written independently of the
orchestrator's internals (no shared helpers): it walks tasks in
insertion order — a topological order, since ``add_task`` rejects
forward references — and applies the documented rule semantics. Any
scheduler race, lost wakeup, or rule mis-evaluation shows up as a
status mismatch."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from astro_data_pipeline_spark.pipelines import Pipeline
from astro_data_pipeline_spark.pipelines.orchestrator import (
    ALL_DONE,
    ALL_SUCCESS,
    NONE_FAILED,
    ONE_FAILED,
)

SF = "/root/testdata/sf0.001"
RULES = (ALL_SUCCESS, ALL_DONE, ONE_FAILED, NONE_FAILED)


@st.composite
def dags(draw):
    """(tasks, fails): task i may depend on any subset of tasks < i."""
    n = draw(st.integers(min_value=1, max_value=8))
    tasks = []
    for i in range(n):
        ups = sorted(
            draw(
                st.sets(st.integers(min_value=0, max_value=i - 1), max_size=3)
            )
        ) if i else []
        rule = draw(st.sampled_from(RULES))
        tasks.append((f"t{i}", [f"t{u}" for u in ups], rule))
    fails = draw(st.sets(st.integers(min_value=0, max_value=n - 1), max_size=3))
    return tasks, {f"t{i}" for i in fails}


def reference_eval(tasks, fails) -> dict[str, str]:
    """Sequential fixpoint of the documented semantics."""
    status: dict[str, str] = {}
    for name, ups, rule in tasks:
        st_ups = [status[u] for u in ups]
        bad = any(s in ("failed", "upstream_failed") for s in st_ups)
        if rule == ALL_DONE:
            runs = True
        elif rule == ONE_FAILED:
            if bad:
                runs = True
            else:
                status[name] = "skipped"
                continue
        elif bad:
            status[name] = "upstream_failed"
            continue
        elif rule == NONE_FAILED:
            runs = True
        else:  # all_success
            if any(s == "skipped" for s in st_ups):
                status[name] = "skipped"
                continue
            runs = True
        if runs:
            status[name] = "failed" if name in fails else "success"
    return status


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(dag=dags())
def test_scheduler_matches_declarative_semantics(spark, dag):
    tasks, fails = dag

    def mk(name):
        def fn(ctx):
            if name in fails:
                raise RuntimeError(f"{name} injected failure")
            return 1

        return fn

    p = Pipeline("prop", parallelism=4)
    for name, ups, rule in tasks:
        p.add_task(name, mk(name), upstream=ups, retries=0, trigger_rule=rule)
    run = p.run(spark, SF)

    expected = reference_eval(tasks, fails)
    got = {n: r.status for n, r in run.records.items()}
    assert got == expected
    # xcom holds values for exactly the tasks that ran to success
    assert set(run.xcom) == {n for n, s in got.items() if s == "success"}
    # every executed task recorded exactly one attempt (retries=0)
    for name, rec in run.records.items():
        if got[name] in ("success", "failed"):
            assert rec.attempts == 1
        else:
            assert rec.attempts == 0
    # dependencies were respected in time: no task started before every
    # SUCCESS/FAILED upstream finished (skipped upstreams never ran)
    for name, ups, _ in tasks:
        rec = run.records[name]
        if rec.started_ms is None:
            continue
        for u in ups:
            up = run.records[u]
            if up.finished_ms is not None:
                assert up.finished_ms <= rec.started_ms + 1
