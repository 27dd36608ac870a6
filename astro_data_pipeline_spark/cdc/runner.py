"""Micro-batch replay loop with exactly-once resume (SURVEY.md §7 Phase 2).

Spark restatement of the reference's job state machine + retry
(ProcessingJob.java:155-232, ProcessingJobService.retryJob :142-164,
Airflow batch slicing batch_processing_dag.py:126-135):

- the change log is sliced into deterministic LSN ranges (batch identity
  is a pure function of the range, NOT of run attempt or wall clock);
- each batch commits atomically with its batch_id in the snapshot
  summary; a killed job restarted over the same log finds committed
  batch_ids in the snapshot chain and skips them — exactly-once end to
  end without any side-effecting UDFs (task retries inside a batch are
  safe because nothing observes a batch until its commit point);
- additive schema evolution is promoted table-first: new event columns →
  ``ALTER TABLE ADD COLUMN``-equivalent metadata commit, then the batch
  aligns to the evolved schema (Flyway-additive contract,
  V2_1__Add_Processing_Context_Tables.sql:76-84).
"""

from __future__ import annotations

import math
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import LakeTable
from ..lakehouse.table import is_lossless_widening
from ..perf import phase
from . import apply as A


class KilledError(RuntimeError):
    """Injected mid-run failure (kill/resume tests)."""


@dataclass
class BatchReport:
    batch_id: str
    lsn_lo: int
    lsn_hi: int
    status: str  # applied | skipped | empty
    totals: dict = field(default_factory=dict)
    n_quarantined: int = 0
    snapshot_id: int | None = None


def lsn_ranges(min_lsn: int, max_lsn: int, n_batches: int) -> list[tuple[int, int]]:
    """Deterministic half-open (lo, hi] LSN slices covering the log."""
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    width = math.ceil((max_lsn - min_lsn + 1) / n_batches)
    out = []
    lo = min_lsn - 1
    while lo < max_lsn:
        hi = min(lo + width, max_lsn)
        out.append((lo, hi))
        lo = hi
    return out


class CdcRunner:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        run_id: str | None = None,
        n_salts: int = 8,
        hot_share: float = 0.01,
        salt_auto: bool = True,
        mode: str = "mor",
        compact_every: int | None = None,
        fuse_buckets: bool = True,
        pipeline_depth: int = 4,
        prefilter_winners: bool = False,
        prefilter_max_winners: int = 20_000_000,
        native_sha: bool = True,
    ):
        """``mode``: 'mor' (merge-on-read appends — the 10^10-scale ingest
        path, zero write amplification) or 'cow' (copy-on-write join —
        read-optimal). ``compact_every``: in mor mode, fold deltas into
        base files after every N applied batches. ``pipeline_depth``: in
        mor mode, how many batch writes may be in flight at once (commits
        stay strictly ordered); >1 overlaps batch k+1's driver-side plan
        analysis with batch k's cluster execution — the per-batch serial
        time that otherwise caps scaling efficiency.

        ``prefilter_winners``: shuffle only winner payloads. A slim
        phase (content column read for nullity only, then dropped before
        any exchange) computes each key's winning LSN via a partially-
        aggregated groupBy — a few bytes per key over the wire — and the
        winning-LSN set broadcasts into a semi-join that drops loser rows
        BEFORE the content-bearing bucket shuffle. On update-heavy logs
        this cuts the bytes crossing the one big exchange by the
        events-per-key factor (~1.9x on the sf1.0 bench log). Correctness
        is unconditional: the broadcast set has no false negatives (every
        true winner's LSN is in it by construction), and the downstream
        collapse still dedupes duplicate deliveries sharing the winning
        LSN. DEFAULT OFF after measurement: validity needs content
        nullity, so the winners pass re-decodes the content column — a
        second full scan whose cost exceeds the shuffle-byte savings on
        this storage format (interleaved best-of-3 A/B, sf1.0 local[32],
        4 batches: 15.4 s ON vs 11.2 s OFF; sf0.1: 10.2 s vs 5.6 s). It
        stays available for deployments where the scan is cheaper than
        the wire (e.g. network shuffle + node-local NVMe columnar cache)
        — both paths are oracle-pinned in tests/test_cdc_engine.py.
        ``prefilter_max_winners``: above this per-batch key-count estimate
        the broadcast would not fit comfortably (~8 bytes/key hashed
        relation) and the runner falls back to the plain fused collapse —
        at that batch size the canonical full shuffle is the right plan.

        ``native_sha`` (default True): compute the content_sha256
        invariant with the JVM ``sha2`` expression instead of the Arrow
        pandas UDF. Digests are bit-identical (equality-pinned in
        tests/test_cdc_engine.py); the difference is purely physical —
        the JVM path keeps winner payloads inside whole-stage codegen,
        while the Arrow path copies every winner's content
        JVM→Arrow→Python→JVM, twice across the memory bus plus 32
        resident Python workers, exactly the shared resource the 8→32
        scaling rung contends for. Measured (sf1.0, interleaved
        best-of-3): local[32] 406k→644k ev/s (+58%), local[8]
        208k→306k (+47%), efficiency 0.49→0.53. The Arrow
        implementation remains the contract exhibit on the query
        surface (scalar_sha256_documents, dedup_exact_by_sha,
        text_document_fingerprint) where it IS the measured operator.
        """
        assert mode in ("mor", "cow")
        self.spark = spark
        self.table = table
        self.run_id = run_id or f"run_{uuid.uuid4().hex[:12]}"
        self.n_salts = n_salts
        self.hot_share = hot_share
        self.salt_auto = salt_auto
        self.mode = mode
        self.compact_every = compact_every
        self.fuse_buckets = fuse_buckets
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.prefilter_winners = prefilter_winners
        self.prefilter_max_winners = prefilter_max_winners
        self.native_sha = native_sha

    # ---------------------------------------------------------- evolution

    def _evolve_if_needed(self, events: DataFrame) -> None:
        """Promote additive event columns into the table schema
        (metadata-only commit) before applying the batch, and WIDEN table
        columns whose upstream type grew (the upstream ``ALTER COLUMN
        ... TYPE`` case: a counter outgrowing int32 mid-stream). Without
        the widen, ``to_table_rows``'s align-cast would silently narrow
        every wide value back to the stale table type. Both promotions
        are metadata-only commits; zero data files move."""
        self.table.evolve_to(
            events.schema,
            reserved={"lsn", "ts", "op"},
            summary={"run_id": self.run_id},
        )

    # -------------------------------------------------------------- apply

    def detect_hot_keys(self, events: DataFrame) -> list[tuple[str, str]]:
        """Heavy-hitter **keys** from a deterministic 2% sample of
        ``events`` (one cheap column-pruned job). Key-level, not
        repo-level: the collapse shuffles on the storage bucket =
        hash(repo, path), so a repo with many paths spreads evenly no
        matter how large — only a single key owning > hot_share of the
        batch (a file rewritten millions of times) can skew a reducer.
        Salting on repo hotness would trigger on Zipf repo-size skew the
        bucket hash already neutralizes. A key that hot is near-certain
        to surface in the sample; a full-scan count would cost a whole
        extra pass over the log."""
        # drop quarantine-bound rows (null repo/path are valid INPUTS —
        # valid_predicate filters them later): a large corrupt stripe
        # would otherwise form one null group that inflates max_n or even
        # returns a (None, None) "hot key", which the manifest join and
        # the salt expression cannot represent
        sample = (
            events.select("repo", "path")
            .filter(F.col("repo").isNotNull() & F.col("path").isNotNull())
            .sample(fraction=0.02, seed=42)
        )
        counts = sample.groupBy("repo", "path").agg(F.count("*").alias("n"))
        # phase 1 (always): one job, two scalars to the driver. The common
        # case — no key anywhere near hot — stops here.
        stats = counts.agg(
            F.sum("n").alias("total"), F.max("n").alias("max_n")
        ).collect()[0]
        total = int(stats["total"] or 0)
        if total == 0:
            return []
        # floor of 5 sampled hits: below that the "hot" signal is sampling
        # noise (Poisson), and a key too small to clear 5 hits is far too
        # small to skew a reducer anyway
        cutoff = max(int(total * self.hot_share), 5)
        if int(stats["max_n"]) <= cutoff:
            return []
        # phase 2 (rare): pull only the keys above the cutoff
        return [
            (r["repo"], r["path"])
            for r in counts.filter(F.col("n") > cutoff).collect()
        ]

    def _build_rows(
        self,
        events: DataFrame,
        snap,
        hot: list[tuple[str, str]],
        n_events_hint: int | None = None,
    ):
        """The per-batch lazy plan: quarantine-observed validation →
        bucket-fused salted LWW collapse → table-row derivation (sha256,
        schema align). Returns (observation, rows DataFrame); nothing runs
        until the sink action fires.

        Bucket-fused collapse: ONE content-bearing shuffle serves both
        the LWW groupBy and the sink's bucket alignment (hash on the
        bucket — a function of the group keys — satisfies the agg's
        required distribution, so no second exchange). The explicit
        fixed-width repartition also pins the downstream sha/write
        stage at n_buckets tasks; without it the work lands in an
        AQE-coalesced post-agg stage (~64MB advisory => a handful of
        partitions) and 2-4 tasks serialize the whole batch's content
        (measured 10x+ stage blowups with the Arrow sha; the same
        coalesce starves the parquet write even on the JVM path).
        """
        from pyspark.sql import Observation

        from ..lakehouse.table import bucket_expr

        # valid_predicate is coalesced to a real boolean internally, so
        # ~ok counts every quarantined row (three-valued logic can't
        # silently skip op=NULL rows)
        ok = A.valid_predicate()
        obs = Observation()
        observed = events.observe(
            obs, F.count(F.when(~ok, 1)).alias("rows_quarantined")
        )
        valid = observed.filter(ok)
        # Gate on the LSN-range width — a free driver-side upper bound on
        # this batch's key count (LSNs are unique per event). Above the
        # cap the winner set would not broadcast comfortably, and a batch
        # that large wants the canonical full shuffle anyway.
        prefilter = self.prefilter_winners and (
            n_events_hint is None or n_events_hint <= self.prefilter_max_winners
        )
        if prefilter:
            # Winning-LSN set from a slim plan: the scan evaluates the
            # full validity predicate (content read for nullity, dropped
            # immediately), the partially-aggregated groupBy ships only
            # (repo, path, max lsn) — the content column never crosses
            # this exchange. Built from the RAW events (not ``observed``)
            # so the quarantine Observation node executes exactly once,
            # in the main plan.
            winners = (
                events.filter(ok)
                .groupBy("repo", "path")
                .agg(F.max("lsn").alias("lsn"))
                .select("lsn")
            )
            # Loser rows drop BEFORE the content-bearing bucket shuffle.
            # No false negatives: every key's true winner LSN is in the
            # broadcast set by construction; duplicate deliveries of the
            # winning LSN pass through and collapse in the group-by below.
            valid = valid.join(F.broadcast(winners), "lsn", "leftsemi")
            # post-filter input is ~1 row/key — hot-key salting is moot
            hot = []
        if self.fuse_buckets:
            collapsed = A.lww_collapse(
                valid,
                hot_keys=hot,
                n_salts=self.n_salts,
                bucket=bucket_expr(snap.key_cols, snap.n_buckets),
                n_partitions=snap.n_buckets,
            )
        else:
            collapsed = A.lww_collapse(
                valid, hot_keys=hot, n_salts=self.n_salts
            ).repartition(snap.n_buckets, bucket_expr(snap.key_cols, snap.n_buckets))
        return obs, A.to_table_rows(collapsed, snap.schema, native_sha=self.native_sha)

    def apply_batch(
        self,
        events: DataFrame,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        hot_keys: list[tuple[str, str]] | None = None,
        committed: set[str] | None = None,
    ) -> BatchReport:
        """Validate → salted LWW → sha256 → MERGE, one atomic commit.

        Cost shape per batch: one column-pruned key scan (hot repos +
        touched buckets, content never read) and ONE content-heavy pass
        (validate-observe → collapse → sha → merge-join → write). The
        quarantine count and insert/update/delete split ride the write
        action via ``observe`` — zero extra passes.

        ``committed``: pass the ledger snapshot when replaying many
        batches — the per-batch fallback re-walks the whole snapshot
        chain (one JSON parse per snapshot), O(batches × snapshots) over
        a long-lived table.
        """
        with phase("runner.skip_check"):
            if committed is None:
                committed = self.table.committed_batch_ids()
            if batch_id in committed:
                return BatchReport(batch_id, lsn_lo, lsn_hi, status="skipped")

        with phase("runner.evolve"):
            self._evolve_if_needed(events)
            snap = self.table.current_snapshot()

        # --- slim pass: repo/path columns only — parquet column pruning.
        # ``hot_keys`` passed in (replay computes it ONCE for the whole
        # log) skips the per-batch sample job — driver-side jobs are the
        # serial fraction that caps scaling at high core counts.
        hot: list[tuple[str, str]] = hot_keys if hot_keys is not None else []
        touched: list[int] | None = None
        if (self.salt_auto and hot_keys is None) or self.mode == "cow":
            from ..lakehouse.table import bucket_expr

            slim = events.select("repo", "path")
            if self.salt_auto and hot_keys is None:
                hot = self.detect_hot_keys(slim)
            if self.mode == "cow":
                # quarantine-bound rows (null key cols) never reach the
                # merge — without this filter their hash bucket would be
                # spuriously rewritten on every batch carrying a corrupt
                # stripe
                keyed = slim
                for c in snap.key_cols:
                    keyed = keyed.filter(F.col(c).isNotNull())
                touched = [
                    r[0]
                    for r in keyed.select(bucket_expr(snap.key_cols, snap.n_buckets))
                    .distinct()
                    .collect()
                ]

        obs, rows = self._build_rows(
            events, snap, hot, n_events_hint=lsn_hi - lsn_lo
        )

        manifest = {
            "run_id": self.run_id,
            "run_scope": self.run_id,
            "batch_id": batch_id,
            "lsn_lo": lsn_lo,
            "lsn_hi": lsn_hi,
            "hot_keys": ["\x1f".join(k) for k in hot],
        }
        if self.mode == "mor":
            new_snap, metrics = self.table.merge_mor(
                rows,
                op_col="op",
                delete_op="delete",
                summary=manifest,
                bucket_aligned=True,
            )
        else:
            new_snap, metrics = self.table.merge(
                rows,
                op_col="op",
                delete_op="delete",
                touched_buckets=touched,
                summary=manifest,
            )
        with phase("runner.obs_get"):
            # Observation.get BLOCKS until an action runs over the observed
            # plan; a CoW merge over zero touched buckets commits an empty
            # snapshot without ever executing `rows` (sparse LSN ranges can
            # slice an empty batch), so waiting would hang the replay.
            # An empty batch has nothing to quarantine.
            if touched is not None and not touched:
                n_bad = 0
            else:
                try:
                    n_bad = int(obs.get.get("rows_quarantined", 0))
                except Exception:
                    # the optimizer can prune the observe node when the
                    # valid side folds statically empty (e.g. every lsn
                    # NULL) — exactly the batches that are ALL quarantine,
                    # so assuming 0 here would hide them; recompute
                    # directly (one extra job, only on this rare path)
                    n_bad = events.filter(~A.valid_predicate()).count()
        return BatchReport(
            batch_id,
            lsn_lo,
            lsn_hi,
            status="applied",
            totals=metrics["totals"],
            n_quarantined=n_bad,
            snapshot_id=new_snap.snapshot_id,
        )

    # ------------------------------------------------------------- replay

    def replay(
        self,
        events: DataFrame,
        n_batches: int = 4,
        fail_after: int | None = None,
    ) -> list[BatchReport]:
        """Replay a change log in deterministic LSN-range micro-batches.

        ``fail_after=k`` raises after k batches commit — the kill switch
        for resume tests. A rerun (new runner, same table+log) must skip
        the committed prefix and converge to the same final state.
        """
        with phase("runner.lsn_bounds"):
            # Footer-stats fast path: when the log came from
            # ``read_event_log`` the min/max LSN was already read from
            # parquet row-group statistics on the driver (microseconds) —
            # no cluster job. Anything else (filtered/limited/streaming
            # DataFrames) falls back to a real aggregation.
            lo_hi = getattr(events, "_adps_lsn_bounds", None)
            if lo_hi is None:
                lo_hi = events.agg(F.min("lsn"), F.max("lsn")).collect()[0]
        if lo_hi[0] is None:
            # no orderable LSNs at all. A truly empty log is a no-op, but
            # a non-empty all-null-lsn log must still flow through the
            # validate/quarantine path (not vanish with zero batches and
            # zero metrics) — same contract as the streaming bridge.
            if events.limit(1).count() == 0:
                return []
            return [
                self.apply_batch(events, "lsn:null-only", 0, 0, hot_keys=[])
            ]
        ranges = lsn_ranges(int(lo_hi[0]), int(lo_hi[1]), n_batches)
        if (
            self.mode == "mor"
            and self.pipeline_depth > 1
            and fail_after is None
            and self.compact_every is None
        ):
            # the pipelined path overlaps hot-key detection with the
            # first batch's write instead of paying it up front
            return self._replay_pipelined(events, ranges)
        # Hot-repo set once for the whole log: salting is correctness-
        # neutral (pre-MERGE key collapse), so a log-global hot set is as
        # valid as a per-batch one and saves one driver job per batch.
        with phase("runner.hot_detect"):
            hot = self.detect_hot_keys(events) if self.salt_auto else []
        reports: list[BatchReport] = []
        applied = 0
        # ledger snapshot ONCE per replay — the per-batch fallback walks
        # the whole snapshot chain each time (O(batches × snapshots));
        # batches this replay itself commits can't be in the skip set
        with phase("runner.skip_check"):
            committed = self.table.committed_batch_ids()
        for i, (lo, hi) in enumerate(ranges):
            batch_id = f"lsn:{lo}-{hi}"
            # LSN-range predicate pushes down to the event-log scan. A
            # NULL lsn falls outside EVERY (lo, hi] slice, so the first
            # batch adopts those rows — they are quarantine-bound (the
            # validity predicate requires a non-null lsn) and must be
            # counted, not silently excluded from all batches.
            in_range = (F.col("lsn") > lo) & (F.col("lsn") <= hi)
            if i == 0:
                in_range = in_range | F.col("lsn").isNull()
            batch = events.filter(in_range)
            rep = self.apply_batch(
                batch, batch_id, lo, hi, hot_keys=hot, committed=committed
            )
            reports.append(rep)
            if rep.status == "applied":
                applied += 1
                if (
                    self.mode == "mor"
                    and self.compact_every
                    and applied % self.compact_every == 0
                ):
                    self.table.compact(summary={"run_id": self.run_id})
                if fail_after is not None and applied >= fail_after:
                    raise KilledError(f"injected kill after {applied} batches")
        return reports

    def _prior_hot_keys(self) -> list[tuple[str, str]]:
        """Hot-key set recorded by the most recent committed batch
        manifest — the warm-start salt set for the pipelined path's
        first batch, whose plan is built while this run's own detection
        job is still in flight. A continuous ingest always has a prior
        manifest, so at 10^10-event scale batch 1 salts with the keys
        that were hot minutes ago — exactly the ones likeliest to still
        be hot. Salting is correctness-neutral either way."""
        for snap in self.table.snapshot_chain():
            keys = snap.summary.get("hot_keys")
            if keys is not None:
                return [
                    (parts[0], parts[1])
                    for k in keys
                    if len(parts := k.split("\x1f", 1)) == 2
                ]
        return []

    def _replay_pipelined(
        self, events: DataFrame, ranges: list[tuple[int, int]]
    ) -> list[BatchReport]:
        """MoR replay with up to ``pipeline_depth`` batch writes in flight.

        Safe because MoR delta writes are independent: batch k's files land
        under its own pre-assigned commit sequence and stay invisible until
        the ordered ``mor_finalize`` flips the version hint — so writes
        race, the ledger serializes (the async-checkpoint shape). Commit
        order — and therefore the LWW ``_seq`` order and exactly-once
        resume — is identical to the sequential path. Crash mid-pipeline
        leaves only uncommitted delta dirs: invisible to readers, re-done
        on resume, garbage-collected by ``expire_snapshots``.

        Why it pays: each batch has ~0.5-1s of driver-serial work (Catalyst
        analysis, AQE stage sync, commit bookkeeping) that a sequential
        loop adds to the critical path; overlapped behind the previous
        batch's cluster execution it disappears, which is the difference
        between ~0.4 and ~0.8+ N->4N scaling efficiency on short batches.

        Hot-key detection (one sampled cluster job, ~0.4 s at sf0.1) is
        likewise taken off the critical path: a synchronous loop pays it
        while every core idles, so here the first batch salts with the
        PRIOR run's recorded hot set (``_prior_hot_keys`` warm start —
        empty on a fresh table) while this log's detection job runs
        concurrently with that batch's write; every later batch blocks
        on the detection future, long since finished by then. The final
        table state is identical whichever batches salt (salting only
        re-routes pre-MERGE collapse work; ``test_pipelined_equals_
        sequential`` pins the equality), and each batch's manifest still
        records the exact salt set it used.
        """
        from concurrent.futures import ThreadPoolExecutor

        with phase("runner.skip_check"):
            committed = self.table.committed_batch_ids()
        with phase("runner.evolve"):
            # Evolve once up front: the unified log schema is constant
            # across batches, so per-batch evolution checks are redundant.
            self._evolve_if_needed(events)
            base = self.table.current_snapshot()
        hot: list[tuple[str, str]] = []
        hot_fut = None
        det_pool: ThreadPoolExecutor | None = None

        indexed: list[tuple[int, BatchReport]] = []
        inflight: list[tuple] = []
        # seed from the global allocator (not base+1): snapshot ids are
        # table-global, so sibling-branch commits or a crashed writer's
        # orphan claim may occupy ids above this ref's head
        next_commit = self.table._alloc_commit_id(base)

        def drain_one() -> None:
            idx, batch_id, lo, hi, commit_id, fut, obs, manifest = inflight.pop(0)
            w = fut.result()
            snap, metrics = self.table.mor_finalize(
                w, summary=manifest, expect_parent=commit_id - 1
            )
            with phase("runner.obs_get"):
                try:
                    n_bad = int(obs.get.get("rows_quarantined", 0))
                except Exception:
                    n_bad = 0
            indexed.append(
                (idx, BatchReport(
                    batch_id, lo, hi, status="applied", totals=metrics["totals"],
                    n_quarantined=n_bad, snapshot_id=snap.snapshot_id,
                ))
            )

        with ThreadPoolExecutor(max_workers=self.pipeline_depth) as ex:
            try:
                for idx, (lo, hi) in enumerate(ranges):
                    batch_id = f"lsn:{lo}-{hi}"
                    if batch_id in committed:
                        indexed.append(
                            (idx, BatchReport(batch_id, lo, hi, status="skipped"))
                        )
                        continue
                    # first range adopts null-lsn rows (quarantine-bound;
                    # outside every slice otherwise) — mirrors the
                    # sequential path so batch identity stays deterministic
                    in_range = (F.col("lsn") > lo) & (F.col("lsn") <= hi)
                    if idx == 0:
                        in_range = in_range | F.col("lsn").isNull()
                    batch = events.filter(in_range)
                    if self.salt_auto:
                        if det_pool is None:
                            # first real batch: warm-start salt set +
                            # async detection over the full log
                            det_pool = ThreadPoolExecutor(max_workers=1)
                            hot = self._prior_hot_keys()
                            with phase("runner.hot_submit"):
                                hot_fut = det_pool.submit(
                                    self.detect_hot_keys, events
                                )
                        elif hot_fut is not None:
                            with phase("runner.hot_wait"):
                                # REPLACE the warm-start set, don't union:
                                # unioning makes the hot set monotone
                                # across runs (manifest -> warm start ->
                                # union -> manifest), so a key hot once
                                # would stay salted forever and any
                                # non-empty set forces the two-stage
                                # collapse plan on every future batch
                                hot = sorted(set(hot_fut.result()))
                            hot_fut = None
                    obs, rows = self._build_rows(
                        batch, base, hot, n_events_hint=hi - lo
                    )
                    manifest = {
                        "run_id": self.run_id,
                        "run_scope": self.run_id,
                        "batch_id": batch_id,
                        "lsn_lo": lo,
                        "lsn_hi": hi,
                        "hot_keys": ["\x1f".join(k) for k in hot],
                    }
                    commit_id = next_commit
                    next_commit += 1
                    fut = ex.submit(
                        self.table.mor_write,
                        rows,
                        commit_id,
                        op_col="op",
                        delete_op="delete",
                        bucket_aligned=True,
                        snapshot=base,
                    )
                    inflight.append(
                        (idx, batch_id, lo, hi, commit_id, fut, obs, manifest)
                    )
                    while len(inflight) >= self.pipeline_depth:
                        drain_one()
                while inflight:
                    drain_one()
            except BaseException:
                # let in-flight writes finish (their dirs stay uncommitted),
                # then surface the original failure
                for item in inflight:
                    try:
                        item[5].result()
                    except Exception:
                        pass
                raise
            finally:
                if det_pool is not None:
                    # the detection future must not outlive replay(): an
                    # unconsumed running job (single-batch replay, or an
                    # exception before batch 2) would keep a sampled scan
                    # contending with the caller's next work and leave a
                    # non-daemon thread blocking interpreter exit. Cancel
                    # if not started; otherwise consume (sampled scan,
                    # bounded) and swallow its errors — detection is
                    # advisory, never a replay failure.
                    if hot_fut is not None and not hot_fut.cancel():
                        try:
                            hot_fut.result()
                        except Exception:
                            pass
                    det_pool.shutdown(wait=True)
        return [r for _, r in sorted(indexed, key=lambda t: t[0])]


def read_event_log(spark: SparkSession, *paths: str) -> DataFrame:
    """Read event-log segments with possibly-divergent (additively evolved)
    schemas as ONE scan — the engine's binlog tail.

    The unified schema is assembled on the driver from the parquet footers
    (milliseconds, no job) and handed to a single ``spark.read.schema(...)``:
    the vectorized reader null-fills columns a segment predates. Compared
    to a per-segment read + unionByName this halves the per-batch map jobs
    (a union's legs materialize as sequential AQE query stages) and keeps
    the plan tree small, which matters because Catalyst re-analyzes it for
    every micro-batch action — driver-serial time that caps scaling.

    The footer pass also records global min/max LSN from row-group
    statistics; ``replay`` picks it up and skips its bounds aggregation.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    # pyarrow's ParquetFile takes a single concrete file — expand globs and
    # directories on the driver first (spark.read handles them natively,
    # the footer pass must match what the scan will read).
    def _expand(p: str) -> list[str]:
        # A segment may itself be a directory (Spark writes datasets as
        # directories of part files, even when named '*.parquet' —
        # possibly nested, e.g. partitionBy subdirectories). A directory
        # that contributes zero parquet files is an error, not a silent
        # exclusion: replay over an incomplete log must not look green.
        if os.path.isdir(p):
            out = sorted(
                os.path.join(dirpath, f)
                for dirpath, _dirs, fns in os.walk(p)
                for f in fns
                if f.endswith(".parquet")
            )
            if not out:
                raise FileNotFoundError(f"no parquet files under segment dir {p}")
            return out
        return [p]

    files: list[str] = []
    for p in paths:
        if _glob.has_magic(p):
            for m in sorted(_glob.glob(p)):
                if os.path.isdir(m) or m.endswith(".parquet"):
                    files.extend(_expand(m))
                    continue
                # a loose glob ('seg-dir/*') also matches _SUCCESS/.crc
                # markers — those are skippable, but any OTHER plain file
                # the user's glob matched is a WAL segment we can't read:
                # silently dropping it would make replay over an
                # incomplete log look green (the same failure the
                # empty-dir guard in _expand prevents).
                base = os.path.basename(m)
                if (
                    base == "_SUCCESS"
                    or base.endswith(".crc")
                    or base == "meta.json"
                    or base.startswith((".", "_"))
                ):
                    continue
                raise ValueError(
                    f"glob {p!r} matched non-parquet file {m!r}; WAL "
                    "segments must be parquet files or directories of "
                    "parquet files (marker files _SUCCESS/*.crc/"
                    "meta.json/dotfiles are skipped automatically)"
                )
        else:
            files.extend(_expand(p))
    if not files:
        raise FileNotFoundError(f"no parquet segments matched {paths!r}")

    fields: list[T.StructField] = []
    field_idx: dict[str, int] = {}  # name -> position in `fields`
    seen: dict[str, tuple] = {}  # name -> (widest dataType so far, its file)
    lsn_lo: int | None = None
    lsn_hi: int | None = None
    stats_valid = True
    from pyspark.sql.pandas.types import from_arrow_schema

    for p in files:
        pf = pq.ParquetFile(p)
        md = pf.metadata
        # schema from the SAME footer the stats pass already decoded —
        # one footer read per segment (a per-file spark.read.parquet here
        # would re-list, re-open, and re-decode every footer a second
        # time just to convert types the arrow schema already carries)
        try:
            spark_fields = from_arrow_schema(pf.schema_arrow).fields
        except Exception:
            spark_fields = spark.read.parquet(p).schema.fields
        for f in spark_fields:
            prev = seen.get(f.name)
            if prev is None:
                seen[f.name] = (f.dataType, p)
                field_idx[f.name] = len(fields)
                fields.append(T.StructField(f.name, f.dataType, True))
            elif prev[0] != f.dataType:
                # Retyped columns are legal exactly when the retype is a
                # LOSSLESS WIDENING (upstream ALTER COLUMN ... TYPE, e.g.
                # a counter outgrowing int32): the unified read schema
                # takes the wider type and the vectorized reader upcasts
                # the narrow segments — the same promotion matrix the
                # lake table's widen_columns uses, so _evolve_if_needed
                # widens the sink to match. Anything else fails fast with
                # the offending file instead of an opaque reader error
                # mid-replay.
                if is_lossless_widening(prev[0], f.dataType):
                    seen[f.name] = (f.dataType, p)
                    fields[field_idx[f.name]] = T.StructField(f.name, f.dataType, True)
                elif not is_lossless_widening(f.dataType, prev[0]):
                    raise ValueError(
                        f"segment schema conflict on column {f.name!r}: "
                        f"{prev[0].simpleString()} in {prev[1]} vs "
                        f"{f.dataType.simpleString()} in {p} (not a "
                        "lossless widening in either direction)"
                    )
        # Bounds are only trustworthy if EVERY row group of EVERY segment
        # has lsn min/max stats: one stats-less segment must poison the
        # whole fast path, or replay would slice LSN ranges that miss it.
        if not stats_valid:
            continue
        try:
            idx = md.schema.names.index("lsn")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no lsn stats")
                lsn_lo = st.min if lsn_lo is None else min(lsn_lo, st.min)
                lsn_hi = st.max if lsn_hi is None else max(lsn_hi, st.max)
        except (ValueError, KeyError):
            stats_valid = False
            lsn_lo = lsn_hi = None
    df = spark.read.schema(T.StructType(fields)).parquet(*files)
    if stats_valid and lsn_lo is not None:
        df._adps_lsn_bounds = (int(lsn_lo), int(lsn_hi))
    return df
