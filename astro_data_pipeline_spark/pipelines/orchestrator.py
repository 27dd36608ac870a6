"""DAG orchestrator — the reference's Airflow control plane, Spark-first.

The reference sequences its pipeline with Airflow: task dependency
graphs with retries, execution timeouts, trigger rules, XCom value
passing, and a failure-notification task
(``airflow/dags/telescope_data_processing.py:31-41`` default_args
retries=2 / retry_delay / execution_timeout; ``:490-497`` dependency
wiring; ``:470-483`` trigger_rule='one_failed' notification;
``airflow/dags/batch_processing_dag.py:54-74`` batch knobs), backed by
a job state machine with explicit retry transitions
(``ProcessingJob.java:155-232``, ``ProcessingJobService.retryJob``).

The Spark restatement runs the whole DAG inside ONE SparkSession:

- Independent branches execute concurrently from a thread pool — each
  branch's Spark actions become concurrently-scheduled jobs on the
  shared cluster (Spark's scheduler interleaves their stages), which
  is the single-cluster analog of Airflow dispatching pods.
- Every attempt runs under its own Spark **job group**
  (``setJobGroup(..., interruptOnCancel=True)``, thread-local by
  design), so an execution timeout doesn't just abandon the thread —
  ``cancelJobGroup`` interrupts the attempt's running stages on the
  cluster, the analog of Airflow killing a timed-out pod.
- Task callables exchange values through the run context (the XCom
  analog) and report a ``rows_out`` data-plane metric that lands in
  the run manifest, mirroring the reference's per-task result dicts.

Scale design: the orchestrator itself is pure driver-side control flow
(a few dict updates per task) — all data movement stays inside the
tasks' DataFrame plans, so a DAG over 100 TB costs exactly what its
constituent queries cost; nothing is collected through the manifest
but per-task scalars.
"""

from __future__ import annotations

import math
import threading
import time
import traceback
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession

# terminal task states (Airflow names kept where they exist)
SUCCESS = "success"
FAILED = "failed"
UPSTREAM_FAILED = "upstream_failed"
SKIPPED = "skipped"

# trigger rules (telescope_data_processing.py:483 uses one_failed for
# the notification task; cleanup fan-in is the all_done shape;
# data_quality_monitoring.py:572 uses none_failed_or_skipped for the
# report that fans in the mutually-exclusive branch outcomes)
ALL_SUCCESS = "all_success"
ALL_DONE = "all_done"
ONE_FAILED = "one_failed"
NONE_FAILED = "none_failed"
_RULES = (ALL_SUCCESS, ALL_DONE, ONE_FAILED, NONE_FAILED)


@dataclass
class TaskSpec:
    name: str
    fn: Callable[["PipelineContext"], Any]
    upstream: tuple[str, ...] = ()
    retries: int = 2  # default_args retries=2 (telescope_data_processing.py:38)
    retry_delay_s: float = 0.0
    timeout_s: float | None = None
    trigger_rule: str = ALL_SUCCESS
    branch: bool = False  # BranchPythonOperator: fn returns the
    # downstream task name(s) to follow; other direct downstream
    # tasks short-circuit to skipped (data_quality_monitoring.py:525)


@dataclass
class TaskRecord:
    task: str
    status: str
    attempts: int = 0
    started_ms: int | None = None
    finished_ms: int | None = None
    rows_out: int | None = None
    error: str | None = None
    chosen: tuple[str, ...] | None = None  # branch tasks: followed names


@dataclass
class PipelineContext:
    """What a task callable sees: the shared session, the run's input
    locator, and upstream results (the XCom analog)."""

    spark: SparkSession
    sf_dir: str
    params: dict[str, Any] = field(default_factory=dict)
    _xcom: dict[str, Any] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def pull(self, task: str) -> Any:
        """Upstream task's returned value (XCom pull)."""
        with self._lock:
            return self._xcom[task]

    def _push(self, task: str, value: Any) -> None:
        with self._lock:
            self._xcom[task] = value


@dataclass
class PipelineRun:
    pipeline: str
    records: dict[str, TaskRecord]
    xcom: dict[str, Any] = field(default_factory=dict)  # task -> returned value

    @property
    def ok(self) -> bool:
        return all(
            r.status in (SUCCESS, SKIPPED) for r in self.records.values()
        )

    def manifest_rows(self) -> list[dict]:
        """Deterministic manifest projection (no wall-clock columns) —
        the query/oracle surface; timings stay on the full records."""
        return [
            {
                "task": r.task,
                "status": r.status,
                "attempts": r.attempts,
                "rows_out": r.rows_out,
            }
            for r in sorted(self.records.values(), key=lambda r: r.task)
        ]


class Pipeline:
    """A named DAG of :class:`TaskSpec`. ``add_task`` wires one task;
    ``run`` executes the graph and returns the :class:`PipelineRun`."""

    def __init__(self, name: str, parallelism: int = 4):
        self.name = name
        self.parallelism = max(int(parallelism), 1)
        self._tasks: dict[str, TaskSpec] = {}

    def add_task(
        self,
        name: str,
        fn: Callable[[PipelineContext], Any],
        upstream: tuple[str, ...] | list[str] = (),
        retries: int = 2,
        retry_delay_s: float = 0.0,
        timeout_s: float | None = None,
        trigger_rule: str = ALL_SUCCESS,
        branch: bool = False,
    ) -> "Pipeline":
        if name in self._tasks:
            raise ValueError(f"duplicate task {name!r}")
        if trigger_rule not in _RULES:
            raise ValueError(f"unknown trigger_rule {trigger_rule!r}")
        for up in upstream:
            if up not in self._tasks:
                raise ValueError(f"task {name!r}: unknown upstream {up!r}")
        self._tasks[name] = TaskSpec(
            name=name,
            fn=fn,
            upstream=tuple(upstream),
            retries=retries,
            retry_delay_s=retry_delay_s,
            timeout_s=timeout_s,
            trigger_rule=trigger_rule,
            branch=branch,
        )
        return self

    # ------------------------------------------------------------- run

    def _ready_status(
        self, spec: TaskSpec, records: dict[str, TaskRecord]
    ) -> str | None:
        """Given all upstream tasks terminal, decide: run (None) or the
        terminal status this task short-circuits to."""
        ups = [records[u].status for u in spec.upstream]
        # branch deselection first, before any trigger rule: a succeeded
        # upstream branch task that did not choose this task skips it
        # regardless of the rule (Airflow's NotPreviouslySkippedDep —
        # even an all_done cleanup wired directly under a branch must
        # not execute the not-taken path)
        for u in spec.upstream:
            up_rec = records[u]
            if (
                self._tasks[u].branch
                and up_rec.status == SUCCESS
                and spec.name not in (up_rec.chosen or ())
            ):
                return SKIPPED
        if spec.trigger_rule == ALL_DONE:
            return None
        bad = [s for s in ups if s in (FAILED, UPSTREAM_FAILED)]
        if spec.trigger_rule == ONE_FAILED:
            # notification shape: runs only when something upstream broke
            return None if bad else SKIPPED
        if bad:
            return UPSTREAM_FAILED
        if spec.trigger_rule == NONE_FAILED:
            # skipped upstreams are fine — the branch fan-in shape
            return None
        if any(s == SKIPPED for s in ups):
            return SKIPPED
        return None

    def _run_task(self, spec: TaskSpec, ctx: PipelineContext, rec: TaskRecord) -> None:
        """Execute one task with retries + job-group timeout enforcement."""
        sc = ctx.spark.sparkContext
        rec.started_ms = int(time.time() * 1000)
        last_err = ""
        for attempt in range(1, spec.retries + 2):
            rec.attempts = attempt
            group = f"{self.name}.{spec.name}#{attempt}"

            def run_attempt() -> Any:
                # thread-local: tags only this attempt's Spark jobs, so
                # cancelJobGroup on timeout interrupts exactly them
                sc.setJobGroup(group, f"pipeline {self.name} task {spec.name}",
                               interruptOnCancel=True)
                try:
                    return spec.fn(ctx)
                finally:
                    sc.setJobGroup("", "")

            try:
                if spec.timeout_s is None:
                    value = run_attempt()
                else:
                    # a daemon thread, not a ThreadPoolExecutor: pool
                    # workers are non-daemon and joined at interpreter
                    # exit, so an abandoned hung attempt would block
                    # process shutdown; a daemon thread can be walked
                    # away from. The box/event also keeps a task fn's
                    # OWN TimeoutError distinct from the wait timeout.
                    box: dict[str, Any] = {}
                    done = threading.Event()

                    def _attempt_runner() -> None:
                        try:
                            box["value"] = run_attempt()
                        except BaseException as err:  # noqa: BLE001
                            box["error"] = err
                        finally:
                            done.set()

                    threading.Thread(
                        target=_attempt_runner, daemon=True,
                        name=f"{group}-attempt",
                    ).start()
                    if not done.wait(timeout=spec.timeout_s):
                        # best-effort cluster-side interrupt of the
                        # attempt's running stages; the task fails NOW
                        # either way and the DAG moves on (the abandoned
                        # thread unwinds when its action dies or
                        # completes)
                        sc.cancelJobGroup(group)
                        if not done.wait(timeout=spec.timeout_s):
                            if attempt <= spec.retries:
                                # A retry would start while the cancelled
                                # attempt is STILL executing
                                # (cancelJobGroup interrupts Spark
                                # stages, not driver-side Python) — two
                                # live copies of a non-idempotent task.
                                # Airflow kills the worker process before
                                # retrying; a thread can't be killed, so
                                # after one extra timeout of grace we
                                # fail the task outright rather than
                                # retry concurrently.
                                rec.status = FAILED
                                rec.error = (
                                    f"execution timeout after "
                                    f"{spec.timeout_s}s; attempt still "
                                    "executing after cancelJobGroup"
                                    " — refusing concurrent retry"
                                )
                                rec.finished_ms = int(time.time() * 1000)
                                return
                            raise TimeoutError(
                                f"execution timeout after {spec.timeout_s}s"
                            )
                        if "value" not in box:
                            # attempt died during the grace wait (usually
                            # the cancellation unwinding) — it is no
                            # longer executing, so a sequential retry is
                            # safe.
                            raise TimeoutError(
                                f"execution timeout after {spec.timeout_s}s"
                            )
                        # The cancelled attempt COMPLETED during the
                        # grace wait: its side effects already happened.
                        # Accept its value rather than raising
                        # TimeoutError and re-running a non-idempotent
                        # task's effects a second time — the same hazard
                        # the refuse-concurrent-retry branch guards.
                    if "error" in box:
                        raise box["error"]
                    value = box["value"]
                # coerce the manifest metric BEFORE publishing anything,
                # so a coercion surprise can't leak a half-published
                # task; a non-finite float succeeds with a NULL rows_out
                # (the value still reaches xcom — the metric is merely
                # unavailable, pinned by
                # test_nonfinite_float_result_succeeds_with_null_rows_out)
                rows: int | None = None
                if isinstance(value, bool):
                    pass
                elif isinstance(value, float):
                    rows = int(value) if math.isfinite(value) else None
                elif isinstance(value, int):
                    rows = value
                elif isinstance(value, (list, tuple, dict)):
                    rows = len(value)  # records produced
                if spec.branch:
                    # Airflow BranchPythonOperator contract: a string or
                    # iterable of task names to follow; None chooses
                    # NOTHING (every direct downstream skips)
                    if value is None:
                        chosen = ()
                    elif isinstance(value, str):
                        chosen = (value,)
                    else:
                        chosen = tuple(value)
                    unknown = [c for c in chosen if c not in self._tasks]
                    if unknown:
                        raise ValueError(
                            f"branch chose unknown task(s) {unknown}"
                        )
                    rec.chosen = chosen
                ctx._push(spec.name, value)
                rec.rows_out = rows
                rec.status = SUCCESS
                rec.finished_ms = int(time.time() * 1000)
                return
            except Exception as e:  # noqa: BLE001 — any task error retries
                last_err = f"{type(e).__name__}: {e}"
                if attempt <= spec.retries and spec.retry_delay_s:
                    time.sleep(spec.retry_delay_s)
        rec.status = FAILED
        rec.error = last_err or traceback.format_exc(limit=1)
        rec.finished_ms = int(time.time() * 1000)

    def run(
        self, spark: SparkSession, sf_dir: str, params: dict | None = None
    ) -> PipelineRun:
        """Topological, branch-parallel execution. A task launches the
        moment its upstream set is terminal; independent subgraphs run
        concurrently up to ``parallelism`` driver threads (their Spark
        jobs share the cluster)."""
        ctx = PipelineContext(spark=spark, sf_dir=sf_dir, params=params or {})
        records = {n: TaskRecord(task=n, status="queued") for n in self._tasks}
        pending = dict(self._tasks)
        futures: dict[Future, str] = {}

        with ThreadPoolExecutor(max_workers=self.parallelism) as pool:
            while pending or futures:
                launched = True
                while launched:
                    launched = False
                    for name in list(pending):
                        spec = pending[name]
                        if any(
                            records[u].status
                            not in (SUCCESS, FAILED, UPSTREAM_FAILED, SKIPPED)
                            for u in spec.upstream
                        ):
                            continue
                        del pending[name]
                        short = self._ready_status(spec, records)
                        if short is not None:
                            records[name].status = short
                        else:
                            records[name].status = "running"
                            futures[pool.submit(self._run_task, spec, ctx,
                                                records[name])] = name
                        launched = True  # statuses changed: rescan
                if futures:
                    done, _ = wait(futures, return_when=FIRST_COMPLETED)
                    for fut in done:
                        futures.pop(fut)
                        fut.result()  # _run_task never raises; surface bugs
                elif pending:
                    # unreachable through add_task (which rejects forward
                    # references, so insertion order is a topological
                    # order) — guards post-construction mutation of
                    # TaskSpec.upstream from spinning forever
                    raise ValueError(
                        f"dependency cycle among {sorted(pending)}"
                    )
        return PipelineRun(
            pipeline=self.name, records=records, xcom=dict(ctx._xcom)
        )
