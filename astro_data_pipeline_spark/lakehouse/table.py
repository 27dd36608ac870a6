"""LakeTable — a minimal Iceberg-style snapshot table format on parquet.

No lake-format jars exist in this environment, so the engine carries its
own table format with exactly the properties the north rule needs:

- **atomic commits**: a snapshot JSON + an atomically-replaced version
  hint file; readers only ever see a fully-committed snapshot (the commit
  manifest of SURVEY.md §7 Phase 2 — Spark restatement of the reference's
  processing_jobs status ledger, ProcessingJob.java:27-233);
- **idempotency / exactly-once**: every commit stamps application
  properties (run_id, batch_id) into the snapshot summary, so a resumed
  job can skip already-committed batches (reference analog: retry
  preserving job_id, ProcessingJobService.java:142-164);
- **bucketed copy-on-write**: data files live under hash buckets of the
  merge key; a MERGE rewrites only touched buckets and carries the rest
  forward by reference — at 100 TB a batch touching 1% of keys rewrites
  ~1% of files (reference analog: the {type}_{YYYYMM} partition pruning,
  V2_1__Add_Processing_Context_Tables.sql:48-69);
- **additive schema evolution**: schema rides in the snapshot; ADD COLUMN
  is a metadata-only commit, old files read back with nulls via an
  explicit read schema (reference analog: Flyway additive migrations,
  V2_2__Add_Workflow_Versioning_Support.sql:9-18);
- **time travel / lineage**: the snapshot chain is retained until
  expired; each snapshot records per-bucket files and summary metrics.

Layout::

    <root>/
      metadata/
        version-hint.txt        # current snapshot id (os.replace = commit)
        snapshot-<id>.json
        lineage.jsonl           # per-(batch, partition) lineage rows
      data/
        commit-<id>/_bucket=<k>/part-*.parquet
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "_bucket"


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_json: dict
    n_buckets: int
    key_cols: list[str]
    files: dict[str, list[str]]  # bucket (as str) -> relative file paths
    summary: dict[str, Any] = field(default_factory=dict)
    timestamp_ms: int = 0

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "schema": self.schema_json,
            "n_buckets": self.n_buckets,
            "key_cols": self.key_cols,
            "files": self.files,
            "summary": self.summary,
            "timestamp_ms": self.timestamp_ms,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            schema_json=d["schema"],
            n_buckets=d["n_buckets"],
            key_cols=d["key_cols"],
            files=d["files"],
            summary=d.get("summary", {}),
            timestamp_ms=d.get("timestamp_ms", 0),
        )


def bucket_expr(key_cols: list[str], n_buckets: int) -> F.Column:
    """Deterministic hash bucket of the merge key (stable across commits)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._meta = os.path.join(root, "metadata")
        self._data = os.path.join(root, "data")

    # ------------------------------------------------------------- create

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "LakeTable":
        t = cls(spark, root)
        os.makedirs(t._meta, exist_ok=True)
        os.makedirs(t._data, exist_ok=True)
        snap = Snapshot(
            snapshot_id=1,
            parent_id=None,
            schema_json=schema.jsonValue(),
            n_buckets=n_buckets,
            key_cols=key_cols,
            files={},
            summary={"operation": "create"},
            timestamp_ms=int(time.time() * 1000),
        )
        t._write_snapshot(snap)
        t._commit_hint(snap.snapshot_id)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        if t.current_snapshot() is None:
            raise FileNotFoundError(f"no committed snapshot at {root}")
        return t

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self._meta, "version-hint.txt"))

    # ---------------------------------------------------------- snapshots

    def current_snapshot(self) -> Snapshot | None:
        hint = os.path.join(self._meta, "version-hint.txt")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            sid = int(f.read().strip())
        return self._read_snapshot(sid)

    def snapshot_chain(self) -> list[Snapshot]:
        """Current snapshot back to root (most recent first)."""
        out: list[Snapshot] = []
        snap = self.current_snapshot()
        while snap is not None:
            out.append(snap)
            snap = self._read_snapshot(snap.parent_id) if snap.parent_id else None
        return out

    def committed_batch_ids(self, run_scope: str | None = None) -> set:
        """Batch ids already durably applied (exactly-once resume check)."""
        out = set()
        for snap in self.snapshot_chain():
            b = snap.summary.get("batch_id")
            if b is None:
                continue
            if run_scope is None or snap.summary.get("run_scope") == run_scope:
                out.add(b)
        return out

    def _read_snapshot(self, sid: int | None) -> Snapshot | None:
        if sid is None:
            return None
        p = os.path.join(self._meta, f"snapshot-{sid}.json")
        with open(p) as f:
            return Snapshot.from_json(json.load(f))

    def _write_snapshot(self, snap: Snapshot) -> None:
        p = os.path.join(self._meta, f"snapshot-{snap.snapshot_id}.json")
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(snap.to_json(), f)
        os.replace(tmp, p)

    def _commit_hint(self, sid: int) -> None:
        """THE commit point: atomic rename of the version hint."""
        hint = os.path.join(self._meta, "version-hint.txt")
        tmp = hint + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, hint)

    # --------------------------------------------------------------- read

    def read(self, snapshot: Snapshot | None = None) -> DataFrame:
        """Scan the table at a snapshot (default: current). Missing columns
        in old files null-fill via the explicit read schema — no
        mergeSchema inference pass over every footer."""
        snap = snapshot or self.current_snapshot()
        assert snap is not None, "table has no committed snapshot"
        paths = [os.path.join(self.root, p) for fs in snap.files.values() for p in fs]
        if not paths:
            return self.spark.createDataFrame([], snap.schema)
        return self.spark.read.schema(snap.schema).parquet(*paths)

    def read_buckets(self, buckets: list[int], snapshot: Snapshot | None = None) -> DataFrame:
        """Scan only the named buckets (partition pruning by file list)."""
        snap = snapshot or self.current_snapshot()
        assert snap is not None
        paths = [
            os.path.join(self.root, p)
            for b in buckets
            for p in snap.files.get(str(b), [])
        ]
        if not paths:
            return self.spark.createDataFrame([], snap.schema)
        return self.spark.read.schema(snap.schema).parquet(*paths)

    # ------------------------------------------------------------- evolve

    def add_columns(self, new_fields: list[T.StructField], summary: dict | None = None) -> Snapshot:
        """Additive schema evolution: metadata-only commit; existing files
        carry forward and read back with nulls for the new columns."""
        cur = self.current_snapshot()
        assert cur is not None
        schema = cur.schema
        existing = {f.name for f in schema.fields}
        for nf in new_fields:
            if nf.name in existing:
                continue
            schema = schema.add(nf)
        snap = Snapshot(
            snapshot_id=cur.snapshot_id + 1,
            parent_id=cur.snapshot_id,
            schema_json=schema.jsonValue(),
            n_buckets=cur.n_buckets,
            key_cols=cur.key_cols,
            files=cur.files,
            summary={"operation": "add-columns", **(summary or {})},
            timestamp_ms=int(time.time() * 1000),
        )
        self._write_snapshot(snap)
        self._commit_hint(snap.snapshot_id)
        return snap

    # -------------------------------------------------------------- merge

    def merge(
        self,
        updates: DataFrame,
        op_col: str = "op",
        delete_op: str = "delete",
        summary: dict | None = None,
    ) -> tuple[Snapshot, dict]:
        """Key-partitioned MERGE (upsert-or-delete), copy-on-write at
        bucket granularity.

        ``updates`` must be key-collapsed (≤1 row per key — LWW dedup
        upstream) and carry every table column plus ``op_col``.

        Emulates Iceberg ``MERGE INTO t USING s ON key WHEN MATCHED AND
        op='delete' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT
        MATCHED AND op!='delete' THEN INSERT`` as anti-join ∪ upserts
        (the composition SURVEY.md §2.3 J6 maps out), per touched bucket.

        Returns (snapshot, metrics) where metrics carries rows_inserted /
        rows_updated / rows_deleted and per-bucket lineage rows.
        """
        cur = self.current_snapshot()
        assert cur is not None
        key_cols = cur.key_cols
        table_cols = [f.name for f in cur.schema.fields]

        upd = updates.withColumn(BUCKET_COL, bucket_expr(key_cols, cur.n_buckets))
        upd.cache()
        try:
            # touched buckets: tiny collect (≤ n_buckets values)
            touched = sorted(
                r[0] for r in upd.select(BUCKET_COL).distinct().collect()
            )
            metrics = self._classify(upd, touched, cur, op_col, delete_op, key_cols)

            new_files: dict[str, list[str]] = {
                b: list(paths) for b, paths in cur.files.items() if int(b) not in touched
            }
            if touched:
                base = self.read_buckets(touched).withColumn(
                    BUCKET_COL, bucket_expr(key_cols, cur.n_buckets)
                )
                # survivors: base rows whose key is NOT in this batch
                survivors = base.join(
                    upd.select(*key_cols), on=key_cols, how="left_anti"
                )
                upserts = upd.filter(F.col(op_col) != delete_op).select(
                    *[F.col(c) for c in table_cols], F.col(BUCKET_COL)
                )
                result = survivors.select(
                    *[F.col(c) for c in table_cols], F.col(BUCKET_COL)
                ).unionByName(upserts)

                commit_id = cur.snapshot_id + 1
                rel_dir = os.path.join("data", f"commit-{commit_id}")
                out_dir = os.path.join(self.root, rel_dir)
                # co-locate buckets before the partitioned write: one shuffle,
                # files land one-per-bucket-per-task
                (
                    result.repartition(max(len(touched), 1), F.col(BUCKET_COL))
                    .write.partitionBy(BUCKET_COL)
                    .mode("overwrite")
                    .parquet(out_dir)
                )
                for b in touched:
                    bdir = os.path.join(out_dir, f"{BUCKET_COL}={b}")
                    rels = []
                    if os.path.isdir(bdir):
                        rels = [
                            os.path.join(rel_dir, f"{BUCKET_COL}={b}", fn)
                            for fn in sorted(os.listdir(bdir))
                            if fn.endswith(".parquet")
                        ]
                    if rels:
                        new_files[str(b)] = rels
            else:
                commit_id = cur.snapshot_id + 1

            snap = Snapshot(
                snapshot_id=commit_id,
                parent_id=cur.snapshot_id,
                schema_json=cur.schema_json,
                n_buckets=cur.n_buckets,
                key_cols=key_cols,
                files=new_files,
                summary={"operation": "merge", **metrics["totals"], **(summary or {})},
                timestamp_ms=int(time.time() * 1000),
            )
            self._write_snapshot(snap)
            self._commit_hint(snap.snapshot_id)
            self._append_lineage(snap, metrics["per_bucket"], summary or {})
            return snap, metrics
        finally:
            upd.unpersist()

    def _classify(
        self,
        upd: DataFrame,
        touched: list[int],
        cur: Snapshot,
        op_col: str,
        delete_op: str,
        key_cols: list[str],
    ) -> dict:
        """Per-bucket insert/update/delete counts (lineage + metrics).
        One small join: updates (key-collapsed, small) vs base keys of
        touched buckets only."""
        if not touched:
            return {
                "totals": dict(
                    rows_inserted=0, rows_updated=0, rows_deleted=0, rows_delete_noop=0
                ),
                "per_bucket": [],
            }
        base_keys = self.read_buckets(touched).select(*key_cols).withColumn("_m", F.lit(1))
        clf = (
            upd.join(base_keys, on=key_cols, how="left")
            .withColumn(
                "_kind",
                F.when((F.col(op_col) == delete_op) & F.col("_m").isNotNull(), "deleted")
                .when((F.col(op_col) == delete_op), "delete_noop")
                .when(F.col("_m").isNotNull(), "updated")
                .otherwise("inserted"),
            )
            .groupBy(BUCKET_COL, "_kind")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        per_bucket: dict[int, dict[str, int]] = {}
        totals = {"rows_inserted": 0, "rows_updated": 0, "rows_deleted": 0, "rows_delete_noop": 0}
        keymap = {"inserted": "rows_inserted", "updated": "rows_updated",
                  "deleted": "rows_deleted", "delete_noop": "rows_delete_noop"}
        for row in clf:
            b, kind, n = row[BUCKET_COL], row["_kind"], row["n"]
            per_bucket.setdefault(b, {v: 0 for v in keymap.values()})
            per_bucket[b][keymap[kind]] += n
            totals[keymap[kind]] += n
        rows = [
            {"partition_id": b, **counts} for b, counts in sorted(per_bucket.items())
        ]
        return {"totals": totals, "per_bucket": rows}

    def _append_lineage(self, snap: Snapshot, per_bucket: list[dict], summary: dict) -> None:
        """Append-only per-(batch, partition) lineage rows (reference:
        ProcessingContext.DataLineage, ProcessingContext.java:161-169)."""
        path = os.path.join(self._meta, "lineage.jsonl")
        with open(path, "a") as f:
            for row in per_bucket:
                rec = {
                    "run_id": summary.get("run_id"),
                    "batch_id": summary.get("batch_id"),
                    "lsn_lo": summary.get("lsn_lo"),
                    "lsn_hi": summary.get("lsn_hi"),
                    "snapshot_id": snap.snapshot_id,
                    "committed_at_ms": snap.timestamp_ms,
                    **row,
                }
                f.write(json.dumps(rec) + "\n")

    def lineage(self) -> DataFrame:
        path = os.path.join(self._meta, "lineage.jsonl")
        return self.spark.read.json(path)

    # ----------------------------------------------------------- maintain

    def expire_snapshots(self, keep_last: int = 5) -> int:
        """Drop snapshot metadata older than the last N and delete data
        files no live snapshot references (reference analog: S3 lifecycle
        transitions, terraform/01-data/s3.tf:51-84)."""
        chain = self.snapshot_chain()
        keep = chain[:keep_last]
        live_files = {p for s in keep for fs in s.files.values() for p in fs}
        removed = 0
        keep_ids = {s.snapshot_id for s in keep}
        for fn in os.listdir(self._meta):
            if fn.startswith("snapshot-") and fn.endswith(".json"):
                sid = int(fn[len("snapshot-"):-len(".json")])
                if sid not in keep_ids:
                    os.remove(os.path.join(self._meta, fn))
        # orphan data files
        for dirpath, _dirnames, filenames in os.walk(self._data):
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if fn.endswith(".parquet") and rel not in live_files:
                    os.remove(full)
                    removed += 1
        # break parent links that now dangle
        if keep:
            oldest = keep[-1]
            if oldest.parent_id is not None:
                oldest.parent_id = None
                self._write_snapshot(oldest)
        return removed
