"""LakeTable changelog as a Structured Streaming SOURCE (Spark 4 Python
DataSource API) — the read half of the CDC loop.

``spark.readStream`` over a lake table's commit history: every
merge-on-read commit's delta rows (upserts + tombstones, stamped with
their commit sequence) stream to downstream consumers in commit order —
the Delta ``readChangeFeed`` / Iceberg incremental-read analog, built on
the engine's own manifest format. Offsets ARE snapshot ids, so the
streaming checkpoint composes with the table's time travel: an offset
identifies an exact, immutable point in table history.

Semantics: this emits the EVENT-level changelog (one row per delta row,
``_change_commit`` = commit seq, ``_is_delete`` = tombstone), not the
net per-key diff — downstream state reconstruction is one LWW collapse
by ``(key, max _change_commit)``, the same primitive everything else in
the engine uses (and the stateful streaming twin already implements).
Maintenance commits (compact / rebucket / cluster) are skipped: they
fold rows the stream already delivered. A copy-on-write ``merge`` in
range FAILS the stream loudly — CoW keeps no row-level changelog, and
skipping it would silently lose its data (same contract as
``LakeTable.changes``).

Scale shape: a ``SimpleDataSourceStreamReader`` reads on the driver —
right for changelog tailing, where a micro-batch is one commit's delta
rows (the ingest path bounds those by batch size), and honest about its
ceiling: a fan-in of huge commits wants the partition-planning
``DataSourceStreamReader`` variant, where each delta FILE becomes an
``InputPartition`` read executor-side. The offset/planning logic below
is the part that carries over unchanged.

Usage::

    from astro_data_pipeline_spark.streaming.source import (
        register_changelog_source,
    )
    register_changelog_source(spark)
    df = (
        spark.readStream.format("laketable_changes")
        .option("root", table.root)
        .option("start_snapshot", "0")   # optional; default: tail from now
        .load()
    )
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_FORMAT = "laketable_changes"
_INTERNALS = [
    T.StructField("_change_commit", T.LongType(), False),
    T.StructField("_is_delete", T.BooleanType(), False),
]


def _read_hint(root: str) -> int:
    with open(os.path.join(root, "metadata", "version-hint.txt")) as f:
        return int(f.read().strip())


def _read_snapshot_json(root: str, sid: int) -> dict | None:
    p = os.path.join(root, "metadata", f"snapshot-{sid}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _table_schema(root: str) -> T.StructType:
    snap = _read_snapshot_json(root, _read_hint(root))
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    return T.StructType.fromJson(snap["schema"])


class _ChangelogReader(SimpleDataSourceStreamReader):
    """Driver-side changelog reader: offsets are snapshot ids; a batch is
    the delta rows of the commits in ``(start, end]``, in commit order."""

    def __init__(self, root: str, start_snapshot: int | None, field_names: list[str]):
        self.root = root
        self.start_snapshot = start_snapshot
        self.field_names = field_names

    def initialOffset(self) -> dict:
        if self.start_snapshot is not None:
            return {"snapshot_id": int(self.start_snapshot)}
        return {"snapshot_id": _read_hint(self.root)}

    def read(self, start: dict):
        end = {"snapshot_id": _read_hint(self.root)}
        return iter(self._rows(start["snapshot_id"], end["snapshot_id"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # recovery replay of a planned-but-uncommitted batch: offsets are
        # snapshot ids over immutable history, so the re-read is exact
        return iter(self._rows(start["snapshot_id"], end["snapshot_id"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: history lives in the table's snapshots

    def _rows(self, s0: int, s1: int) -> list[tuple]:
        import pyarrow.parquet as pq

        out: list[tuple] = []
        for sid in range(int(s0) + 1, int(s1) + 1):
            snap = _read_snapshot_json(self.root, sid)
            if snap is None:
                # expired or another ref's id gap — ids are globally
                # allocated across branches, so holes are expected
                continue
            op = snap.get("summary", {}).get("operation")
            if op == "merge":
                raise RuntimeError(
                    f"snapshot {sid} is a copy-on-write merge: CoW keeps "
                    "no row-level changelog, and skipping it would "
                    "silently lose its rows — use merge-on-read ingest "
                    "for streamed tables (LakeTable.changes contract)"
                )
            if op != "merge-mor":
                continue  # create/evolve/compact/rebucket/cluster: no new logical rows
            stem = os.path.join("data", f"delta-{sid}")
            prefixes = (stem + "-", stem + os.sep)
            rels = sorted(
                p
                for paths in snap.get("delta_files", {}).values()
                for p in paths
                if p.startswith(prefixes)
            )
            for rel in rels:
                tbl = pq.read_table(os.path.join(self.root, rel))
                cols = set(tbl.column_names)
                for row in tbl.to_pylist():
                    out.append(
                        tuple(
                            row.get(c) if c in cols else None
                            for c in self.field_names
                        )
                        + (int(row["_seq"]), bool(row.get("_tombstone") or False))
                    )
        return out


class LakeTableChangesDataSource(DataSource):
    """``spark.readStream.format("laketable_changes")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT

    def schema(self) -> T.StructType:
        root = self.options.get("root")
        if not root:
            raise ValueError("laketable_changes needs .option('root', <table dir>)")
        # schema pinned at stream start (file-source contract): additive
        # evolution mid-stream null-fills on restart with the new schema
        return T.StructType(list(_table_schema(root).fields) + _INTERNALS)

    def simpleStreamReader(self, schema: T.StructType) -> _ChangelogReader:
        root = self.options["root"]
        start = self.options.get("start_snapshot")
        field_names = [f.name for f in schema.fields[: -len(_INTERNALS)]]
        return _ChangelogReader(
            root, int(start) if start is not None else None, field_names
        )


def register_changelog_source(spark: SparkSession) -> str:
    """Register the format with this session; returns the format name."""
    spark.dataSource.register(LakeTableChangesDataSource)
    return _FORMAT
