"""Incremental aggregate materialized views maintained by the change feed.

The canonical downstream consumer of a CDC engine: a per-group aggregate
table (file counts, byte totals, latest-LSN watermarks per repo/lang)
kept current by applying the table's NET change feed
(``LakeTable.changes(..., with_preimage=True)``) instead of recomputing
the aggregate over the full base table on every refresh. Reference
analog: the processing-summary / quality-metrics rollups the Airflow DAGs
recompute per run (data_quality_monitoring.py:214-340 aggregates the
whole observation table each cycle); at 10^10 rows the only sustainable
shape is O(changed rows) maintenance — the Materialize/Flink "dynamic
table" restated on lake-table machinery.

Design:

- The view IS a :class:`LakeTable` keyed by the group columns, so it
  inherits the whole stack for free: bucketed MERGE apply, time travel,
  branches, optimistic concurrency, and — load-bearing here — the
  exactly-once batch ledger. Each refresh commits ONCE with
  ``batch_id = "mv:<from>-><to>"``; a crashed-and-retried refresh either
  re-runs from the same ``from`` (commit never landed) or is skipped by
  the ledger (it did), so the view never double-applies a delta range.
- **Retractable aggregates** (count / sum / avg) maintain running
  storage columns: ``new = old + Σ(post contributions) − Σ(pre-image
  contributions)``. One aggregation over the changed rows, one
  bucket-pruned join against the stored groups, one MERGE — refresh cost
  is O(changed rows), independent of base-table size.
- **Semi-retractable aggregates** (min / max) grow monotonically from
  post-images (``greatest(stored, batch_max)``); a retraction that ties
  the stored extreme marks the group DIRTY, and dirty groups alone are
  recomputed from the base table (semi-join pushdown). At 100 TB the
  rescan prunes to the dirty groups' rows only if the base is clustered
  by the group dimension (``cluster_by``); the docstring cost model is
  honest about that.
- A group whose live-row count reaches zero is DELETED from the view
  (and resurrects cleanly if rows return); a group column changing in an
  update moves the row's contribution between groups (pre-image retracts
  from the old group, post-image adds to the new one) — both fall out of
  the union-of-signed-contributions shape rather than special cases.

Exactness contract: the "incremental ≡ full recompute" invariant is
bit-exact for integral measures (count, and sum/avg over integer
columns — double storage is exact below 2^53). For sums of ARBITRARY
doubles it holds only to floating-point associativity: ``old + Σpost −
Σpre`` and a fresh single-pass sum can differ in the last ulp after
retraction cycles. Consumers comparing such a view against a recompute
should use a tolerance (or carry a decimal measure column); the shipped
gate query aggregates integer LSNs, where equality is exact.

Nothing here is a port: the reference recomputes its rollups from
scratch per DAG run and has no incremental-view machinery.
"""

from __future__ import annotations

import functools
import json
import operator
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..perf import phase
from .table import LakeTable, bucket_expr, null_safe_join as _null_safe_join

_KINDS = ("count", "sum", "avg", "min", "max")
_RETRACTABLE = ("count", "sum", "avg")


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: ``kind`` ∈ count|sum|avg|min|max,
    ``col`` the base column (None for count), ``alias`` the output name."""

    kind: str
    col: str | None
    alias: str

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"unknown agg kind {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"{self.kind} needs a source column")


def _sum_type(src: T.DataType) -> T.DataType:
    if isinstance(
        src, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return T.LongType()
    return T.DoubleType()


class IncrementalAggView:
    """A per-group aggregate LakeTable maintained from the base table's
    net change feed. See module docstring for the maintenance algebra."""

    _META = "mv.json"
    _N = "_mv_n"  # live rows per group (group-death detector)
    _SCOPE = "mv-refresh"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        base: LakeTable,
        specs: list[AggSpec],
        write_mode: str = "cow",
    ):
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"unknown write_mode {write_mode!r}")
        self.spark = spark
        self.root = root
        self.base = base
        self.specs = specs
        self.write_mode = write_mode
        self.table = LakeTable.load(spark, root)
        self.group_cols = list(self.table.current_snapshot().key_cols)

    # -- lifecycle -----------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        base: LakeTable,
        group_cols: list[str],
        specs: list[AggSpec],
        n_buckets: int = 8,
        write_mode: str = "cow",
    ) -> "IncrementalAggView":
        """Create the view table and seed it with a FULL computation at
        the base's current snapshot (the one O(base) pass the view ever
        makes outside dirty-extreme rescans).

        ``write_mode``: how refreshes commit. ``cow`` (default) rewrites
        touched view buckets — read-optimal, right for a leaf view.
        ``mor`` appends refresh deltas, which keeps the view's own
        row-level changelog alive: ``changes()`` works across refreshes,
        so REPLICAS AND FURTHER VIEWS can stack on this one (cascaded
        incremental maintenance); compact the view on your own cadence."""
        aliases = [s.alias for s in specs]
        if len(set(aliases)) != len(aliases):
            raise ValueError("duplicate agg aliases")
        if write_mode not in ("cow", "mor"):
            # validate BEFORE touching disk: failing in __init__ after
            # LakeTable.create leaves an orphaned half-initialized view
            raise ValueError(f"unknown write_mode {write_mode!r}")
        base_snap = base.current_snapshot()
        base_types = {f.name: f for f in base_snap.schema.fields}
        for c in group_cols:
            if c not in base_types:
                raise ValueError(f"group column {c!r} not in base schema")
        for s in specs:
            if s.col is not None and s.col not in base_types:
                raise ValueError(f"agg column {s.col!r} not in base schema")

        fields = [
            T.StructField(c, base_types[c].dataType, base_types[c].nullable)
            for c in group_cols
        ]
        fields.append(T.StructField(cls._N, T.LongType(), False))
        for s in specs:
            if s.kind == "count":
                fields.append(T.StructField(s.alias, T.LongType(), False))
            elif s.kind in ("sum", "avg"):
                st = (
                    T.DoubleType()
                    if s.kind == "avg"
                    else _sum_type(base_types[s.col].dataType)
                )
                fields.append(T.StructField(f"{s.alias}__s", st, True))
                fields.append(T.StructField(f"{s.alias}__n", T.LongType(), False))
            else:  # min / max
                fields.append(
                    T.StructField(s.alias, base_types[s.col].dataType, True)
                )
        LakeTable.create(
            spark, root, T.StructType(fields), group_cols, n_buckets=n_buckets
        )
        meta = {
            "base_root": base.root,
            "group_cols": group_cols,
            "specs": [{"kind": s.kind, "col": s.col, "alias": s.alias} for s in specs],
            "write_mode": write_mode,
        }
        with open(os.path.join(root, cls._META), "w") as f:
            json.dump(meta, f)
        view = cls(spark, root, base, specs, write_mode=write_mode)
        state = view._full_storage(base_snap)
        view.table.merge(
            state.withColumn("op", F.lit("insert")),
            summary={
                "batch_id": f"mv:init->{base_snap.snapshot_id}",
                "run_scope": cls._SCOPE,
                "mv_refresh_to": base_snap.snapshot_id,
            },
        )
        return view

    @classmethod
    def load(
        cls, spark: SparkSession, root: str, base: LakeTable | None = None
    ) -> "IncrementalAggView":
        with open(os.path.join(root, cls._META)) as f:
            meta = json.load(f)
        if base is None:
            base = LakeTable.load(spark, meta["base_root"])
        specs = [AggSpec(**d) for d in meta["specs"]]
        return cls(
            spark, root, base, specs, write_mode=meta.get("write_mode", "cow")
        )

    def last_refresh_to(self) -> int:
        """The base snapshot id the view is current through — read from
        the newest refresh commit's summary (authoritative: it lands
        atomically WITH the refreshed state). If maintenance commits have
        pushed every refresh summary out of the retained chain the
        horizon is genuinely unknown and resuming from a guess would
        double-apply a delta range — refuse loudly; ``refresh(full=True)``
        rebuilds from the base head."""
        for snap in self.table.snapshot_chain():
            to = snap.summary.get("mv_refresh_to")
            if to is not None:
                return int(to)
        raise ValueError(
            "refresh horizon lost (refresh commits expired from the view's "
            "chain); run refresh(full=True) to rebuild"
        )

    # -- reads ---------------------------------------------------------

    def _emit(self, storage: DataFrame) -> DataFrame:
        """Storage columns → user-facing aggregate columns (SQL null
        semantics: sum/avg/min/max over zero non-null inputs are NULL)."""
        cols = [F.col(c) for c in self.group_cols]
        for s in self.specs:
            if s.kind == "count":
                cols.append(F.col(s.alias))
            elif s.kind == "sum":
                cols.append(
                    F.when(F.col(f"{s.alias}__n") > 0, F.col(f"{s.alias}__s")).alias(
                        s.alias
                    )
                )
            elif s.kind == "avg":
                cols.append(
                    F.when(
                        F.col(f"{s.alias}__n") > 0,
                        F.col(f"{s.alias}__s") / F.col(f"{s.alias}__n"),
                    ).alias(s.alias)
                )
            else:
                cols.append(F.col(s.alias))
        return storage.select(*cols)

    def read(self) -> DataFrame:
        """The view's current contents in user-facing shape."""
        return self._emit(self.table.read())

    def full_compute(self, snapshot=None) -> DataFrame:
        """The same user-facing aggregate computed directly from the base
        table (the equivalence oracle for tests / audits)."""
        return self._emit(self._full_storage(snapshot))

    def _full_storage(self, snapshot=None) -> DataFrame:
        rows = self.base.read(snapshot=snapshot)
        aggs = [F.count(F.lit(1)).alias(self._N)]
        for s in self.specs:
            if s.kind == "count":
                aggs.append(F.count(F.lit(1)).alias(s.alias))
            elif s.kind in ("sum", "avg"):
                st = self._storage_type(s)
                aggs.append(
                    F.coalesce(F.sum(F.col(s.col).cast(st)), F.lit(0).cast(st)).alias(
                        f"{s.alias}__s"
                    )
                )
                aggs.append(F.count(F.col(s.col)).alias(f"{s.alias}__n"))
            elif s.kind == "min":
                aggs.append(F.min(s.col).alias(s.alias))
            else:
                aggs.append(F.max(s.col).alias(s.alias))
        return rows.groupBy(*self.group_cols).agg(*aggs)

    def _storage_type(self, s: AggSpec) -> T.DataType:
        f = {x.name: x for x in self.table.current_snapshot().schema.fields}
        return f[f"{s.alias}__s"].dataType

    # -- incremental maintenance ---------------------------------------

    def refresh(self, full: bool = False) -> dict:
        """Advance the view to the base's current snapshot.

        Incremental path: one ``changes(from, to, with_preimage=True)``
        scan (O(changed rows)), signed-contribution aggregation per
        group, a bucket-pruned join against stored state, dirty-extreme
        rescan only where a retraction tied a stored min/max, one MERGE.
        ``full=True`` recomputes every group from the base head instead
        (the escape hatch for a lost horizon or a CoW/compacted range the
        changelog cannot replay)."""
        with phase("mv.pre"):
            base_snap = self.base.current_snapshot()
            to = base_snap.snapshot_id
            if full:
                return self._refresh_full(base_snap)
            frm = self.last_refresh_to()
            if to == frm:
                return {"from": frm, "to": to, "noop": True}
            batch_id = f"mv:{frm}->{to}"
            skip = batch_id in self.table.committed_batch_ids(run_scope=self._SCOPE)
        if skip:
            return {"from": frm, "to": to, "noop": True, "ledger_skip": True}

        gcols = self.group_cols
        need = {s.col for s in self.specs if s.col is not None}
        # every column the contribution rows carry, deduped (a group col
        # may double as an agg col)
        carry = gcols + [c for c in sorted(need) if c not in gcols]
        base_keys = set(base_snap.key_cols)
        # one snapshot read for all storage-type lookups (each
        # _storage_type call re-reads the snapshot json otherwise)
        _vfields = {
            f.name: f.dataType
            for f in self.table.current_snapshot().schema.fields
        }
        _stype = lambda s: _vfields[f"{s.alias}__s"]  # noqa: E731
        # projected changelog: the base's payload columns (content blobs)
        # must never ride the refresh shuffle
        with phase("mv.changes_plan"):
            ch = self.base.changes(
                frm,
                to,
                with_preimage=True,
                columns=[c for c in carry if c not in base_keys],
            )

        def _pre_src(c: str) -> F.Column:
            # base KEY columns have no pre-image (a key cannot change
            # under the same key) — the post value IS the pre value
            return F.col(c) if c in base_keys else F.col(f"_pre_{c}")

        post = ch.filter(F.col("change_type") != "delete").select(
            *carry, F.lit(1).alias("_w")
        )
        pre = ch.filter(F.col("change_type") != "insert").select(
            *[_pre_src(c).alias(c) for c in carry], F.lit(-1).alias("_w")
        )
        contrib = post.unionByName(pre)

        aggs = [F.sum("_w").alias("_dn")]
        has_extremes = False
        for s in self.specs:
            if s.kind == "count":
                aggs.append(F.sum("_w").alias(f"_d_{s.alias}"))
            elif s.kind in ("sum", "avg"):
                st = _stype(s)
                aggs.append(
                    F.coalesce(
                        F.sum(F.col("_w").cast(st) * F.col(s.col).cast(st)),
                        F.lit(0).cast(st),
                    ).alias(f"_ds_{s.alias}")
                )
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(F.col(s.col).isNotNull(), F.col("_w"))),
                        F.lit(0),
                    ).alias(f"_dnn_{s.alias}")
                )
            else:
                has_extremes = True
                grow = F.when(F.col("_w") == 1, F.col(s.col))
                shrink = F.when(F.col("_w") == -1, F.col(s.col))
                if s.kind == "max":
                    aggs.append(F.max(grow).alias(f"_g_{s.alias}"))
                    aggs.append(F.max(shrink).alias(f"_r_{s.alias}"))
                else:
                    aggs.append(F.min(grow).alias(f"_g_{s.alias}"))
                    aggs.append(F.min(shrink).alias(f"_r_{s.alias}"))
        delta = contrib.groupBy(*gcols).agg(*aggs)
        # one row per changed group, consumed by THREE jobs (bucket-id
        # collect, dirty-group probe, the merge) — pin it once instead of
        # re-running the changes() scan per consumer
        from ..session import materialize_barrier

        with phase("mv.delta_barrier"):
            delta = materialize_barrier(delta, eager=True)

        # stored state for exactly the touched groups: bucket-pruned read
        snap = self.table.current_snapshot()
        with phase("mv.bucket_collect"):
            tb = sorted(
                r[0]
                for r in delta.select(
                    bucket_expr(gcols, snap.n_buckets).alias("b")
                )
                .distinct()
                .collect()
            )
        with phase("mv.stored_plan"):
            stored = self.table.read_buckets(tb) if tb else self.table.read()
            merged = _null_safe_join(delta, stored, gcols, "left")

        n_new = F.coalesce(F.col(self._N), F.lit(0)) + F.col("_dn")
        out_cols = [F.col(c) for c in gcols] + [n_new.alias(self._N)]
        dirty_flags = []
        for s in self.specs:
            if s.kind == "count":
                out_cols.append(
                    (F.coalesce(F.col(s.alias), F.lit(0)) + F.col(f"_d_{s.alias}"))
                    .alias(s.alias)
                )
            elif s.kind in ("sum", "avg"):
                st = _stype(s)
                out_cols.append(
                    (
                        F.coalesce(F.col(f"{s.alias}__s"), F.lit(0).cast(st))
                        + F.col(f"_ds_{s.alias}")
                    ).alias(f"{s.alias}__s")
                )
                out_cols.append(
                    (
                        F.coalesce(F.col(f"{s.alias}__n"), F.lit(0))
                        + F.col(f"_dnn_{s.alias}")
                    ).alias(f"{s.alias}__n")
                )
            else:
                # monotone growth is safe; a retraction TOUCHING the stored
                # extreme may have removed the extreme row → group dirty
                ext = F.greatest if s.kind == "max" else F.least
                cand = ext(F.col(s.alias), F.col(f"_g_{s.alias}"))
                tie = (
                    F.col(f"_r_{s.alias}") >= F.col(s.alias)
                    if s.kind == "max"
                    else F.col(f"_r_{s.alias}") <= F.col(s.alias)
                )
                dirty = F.coalesce(
                    F.col(s.alias).isNotNull()
                    & F.col(f"_r_{s.alias}").isNotNull()
                    & tie,
                    F.lit(False),
                )
                out_cols.append(
                    F.when(dirty, F.lit(None)).otherwise(cand).alias(s.alias)
                )
                dirty_flags.append(dirty.alias(f"_dirty_{s.alias}"))
        rows = merged.select(*out_cols, *dirty_flags)
        if has_extremes and dirty_flags:
            # the dirty probe (count) and the merge both consume rows —
            # pin the stored-state join once
            with phase("mv.rows_barrier"):
                rows = materialize_barrier(rows, eager=True)

        n_dirty = 0
        if has_extremes and dirty_flags:
            any_dirty = None
            for s in self.specs:
                if s.kind in ("min", "max"):
                    f_ = F.col(f"_dirty_{s.alias}")
                    any_dirty = f_ if any_dirty is None else (any_dirty | f_)
            dirty_groups = rows.filter(any_dirty).select(*gcols)
            # rows is pinned, so this reads local blocks — but cap the
            # collect: a MASS retraction could have millions of dirty
            # groups, and the literal-predicate path only wants ≤1000;
            # limit(1001) proves which side we're on without ever
            # materializing an unbounded set on the driver
            with phase("mv.dirty_probe"):
                dirty_vals = dirty_groups.limit(1001).collect()
            n_dirty = (
                len(dirty_vals) if len(dirty_vals) <= 1000 else dirty_groups.count()
            )
            if n_dirty:
                # recompute extremes for dirty groups only. Small dirty
                # sets (the common case — a retraction must TIE a stored
                # extreme) compile to a LITERAL predicate, which pushes to
                # the parquet scan: on a base cluster_by'd on the group
                # dimension, file/row-group min-max stats skip everything
                # else, so the rescan reads ~the dirty groups' rows. Large
                # dirty sets fall back to a broadcast semi-join (runtime
                # filtering, no pushdown) — the honest full-scan cost of
                # mass retraction.
                ext_aggs = [
                    (F.min(s.col) if s.kind == "min" else F.max(s.col)).alias(
                        f"_rc_{s.alias}"
                    )
                    for s in self.specs
                    if s.kind in ("min", "max")
                ]
                base_rows = self.base.read(snapshot=base_snap)
                if n_dirty <= 1000:
                    if len(gcols) == 1:
                        g = gcols[0]
                        vals = [r[g] for r in dirty_vals]
                        non_null = [v for v in vals if v is not None]
                        pred = F.col(g).isin(non_null) if non_null else F.lit(False)
                        if len(non_null) < len(vals):  # NULL group is dirty
                            pred = pred | F.col(g).isNull()
                        pruned = base_rows.filter(pred)
                    else:
                        pred = functools.reduce(
                            operator.or_,
                            [
                                functools.reduce(
                                    operator.and_,
                                    [
                                        F.col(g).eqNullSafe(F.lit(r[g]))
                                        for g in gcols
                                    ],
                                )
                                for r in dirty_vals
                            ],
                        )
                        pruned = base_rows.filter(pred)
                else:
                    pruned = _null_safe_join(
                        base_rows, F.broadcast(dirty_groups), gcols, "left_semi"
                    )
                recomp = pruned.groupBy(*gcols).agg(*ext_aggs)
                rows = _null_safe_join(rows, recomp, gcols, "left")
                fixed = []
                for c in rows.columns:
                    if c.startswith("_rc_") or c.startswith("_dirty_"):
                        continue
                    s = next(
                        (
                            x
                            for x in self.specs
                            if x.kind in ("min", "max") and x.alias == c
                        ),
                        None,
                    )
                    if s is None:
                        fixed.append(F.col(c))
                    else:
                        fixed.append(
                            F.when(
                                F.col(f"_dirty_{s.alias}"), F.col(f"_rc_{s.alias}")
                            )
                            .otherwise(F.col(s.alias))
                            .alias(s.alias)
                        )
                rows = rows.select(*fixed)
            else:
                rows = rows.drop(*[c for c in rows.columns if c.startswith("_dirty_")])
        else:
            rows = rows.drop(*[c for c in rows.columns if c.startswith("_dirty_")])

        rows = rows.withColumn(
            "op", F.when(F.col(self._N) <= 0, "delete").otherwise("upsert")
        )
        refresh_summary = {
            "batch_id": batch_id,
            "run_scope": self._SCOPE,
            "mv_refresh_to": to,
        }
        with phase("mv.merge"):
            if self.write_mode == "mor":
                # delta-append refresh: the view keeps its own changelog
                # so cascaded consumers (replicas, views-over-views) can
                # follow
                _, metrics = self.table.merge_mor(rows, summary=refresh_summary)
            else:
                # the groups the merge touches are exactly the delta's
                # groups, whose buckets the stored-state read already
                # collected
                _, metrics = self.table.merge(
                    rows, summary=refresh_summary, touched_buckets=tb
                )
        return {
            "from": frm,
            "to": to,
            "noop": False,
            "dirty_rescans": n_dirty,
            **metrics,
        }

    def _refresh_full(self, base_snap) -> dict:
        """Full rebuild: recompute every group, delete groups that died."""
        to = base_snap.snapshot_id
        fresh = self._full_storage(base_snap)
        stored_keys = self.table.read().select(*self.group_cols)
        dead = _null_safe_join(stored_keys, fresh, self.group_cols, "left_anti")
        vcols = [c for c in fresh.columns if c not in self.group_cols]
        dead_rows = dead.select(
            *self.group_cols,
            *[F.lit(None).alias(c) for c in vcols],
        ).withColumn("op", F.lit("delete"))
        # _mv_n is non-null in the schema; deletes only need the key but
        # merge aligns to the table schema — null-fill is fine for deletes
        up = fresh.withColumn("op", F.lit("upsert"))
        fn = self.table.merge_mor if self.write_mode == "mor" else self.table.merge
        _, metrics = fn(
            up.unionByName(dead_rows, allowMissingColumns=True),
            summary={
                "batch_id": f"mv:full->{to}",
                "run_scope": self._SCOPE,
                "mv_refresh_to": to,
            },
        )
        return {"from": None, "to": to, "noop": False, "full": True, **metrics}
