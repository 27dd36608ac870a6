"""Per-file column statistics for manifest-level scan pruning.

The Iceberg-manifest / Delta-data-skipping analog: each base data file's
min/max per eligible column rides in the snapshot JSON, so a range scan
prunes files at PLANNING time — zero file opens for skipped files. This
matters at 100 TB where Spark's own parquet row-group skipping still
pays one footer open per file: with 10^5-10^6 files, planning-time
pruning off the manifest is the difference between a driver-side dict
lookup and a distributed metadata storm (reference analog: the
{type}_{YYYYMM} partition-pruned queries,
V2_1__Add_Processing_Context_Tables.sql:48-69, generalized to any
clustered column).

Collection is pure metadata: parquet footers already carry per-row-group
min/max/null-count, so stats for a just-written commit cost one small
footer read per file (driver thread pool here; on a real cluster the
same function ships inside ``mapPartitions`` over the path list — the
read is pyarrow-only). Values are JSON-encoded with total order
preserved: integers/floats as-is, timestamps as epoch microseconds,
dates as epoch days. Float/double entries carry ``nan_hidden``: parquet
writers exclude NaN from min/max while Spark orders NaN above every
value, so only the ``min > hi`` prune rule is sound for them.

Safety contract consumed by ``LakeTable.read_between``: an entry may be
MISSING (file predates stats, column unreadable, NaN) — missing means
"cannot prune", never "no rows". Only a present entry proves a file's
value range.
"""

from __future__ import annotations

import datetime
import math
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import types as T

# columns whose parquet min/max give a usable total order
_ELIGIBLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)

_EPOCH_DAY0 = datetime.date(1970, 1, 1)


def eligible_stats_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, _ELIGIBLE)]


def encode_bound(val):
    """JSON-safe, order-preserving encoding of a stats bound (and of the
    caller's lo/hi in ``read_between`` — both sides of every comparison
    go through here, so mixed int/float widths compare correctly)."""
    if val is None:
        return None
    if isinstance(val, bool):
        raise TypeError("boolean bounds are not orderable stats")
    if isinstance(val, datetime.datetime):
        # naive and aware both reduce to epoch micros; parquet stats for
        # timestamp columns come back as UTC-normalized datetimes
        if val.tzinfo is not None:
            return int(val.timestamp() * 1_000_000)
        return int(
            (val - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
    if isinstance(val, datetime.date):
        return (val - _EPOCH_DAY0).days
    if isinstance(val, float) and math.isnan(val):
        return None  # NaN has no place in a total order — unknown
    if isinstance(val, (int, float)):
        return val
    return None  # unsupported type — unknown, never wrong


def _file_stats(
    path: str, columns: set[str], nan_cols: set[str], record_count: bool = True
) -> dict[str, dict]:
    """Aggregate one parquet file's row-group stats per column. Returns
    {col: {"min": x, "max": x[, "nan_hidden": True]} | {"allnull": True}};
    a column is simply absent when its range is unknown.

    Float/double columns carry ``nan_hidden``: parquet writers EXCLUDE
    NaN from min/max (empirically: a row group of [1.0, NaN] reports
    max=1.0), while Spark's ordering puts NaN ABOVE every value — so a
    recorded max may understate the file and only the ``min > hi`` prune
    rule is sound for them (``file_overlaps`` enforces this)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    acc: dict[str, dict] = {}
    known: dict[str, bool] = {c: True for c in columns}
    nulls: dict[str, list[int]] = {c: [0, 0] for c in columns}  # [null, total]
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in columns or not known.get(name, False):
                continue
            st = col.statistics
            if st is None:
                known[name] = False
                continue
            # chunk num_values INCLUDES nulls; statistics.num_values is
            # the non-null count (both verified empirically)
            nulls[name][0] += int(st.null_count or 0)
            nulls[name][1] += int(col.num_values)
            if int(st.num_values or 0) == 0:
                continue  # all-null row group: no range, but not unknown
            if not st.has_min_max:
                known[name] = False
                continue
            lo, hi = encode_bound(st.min), encode_bound(st.max)
            if lo is None or hi is None:
                known[name] = False
                continue
            cur = acc.get(name)
            if cur is None:
                acc[name] = {"min": lo, "max": hi}
            else:
                cur["min"] = min(cur["min"], lo)
                cur["max"] = max(cur["max"], hi)
    out: dict[str, dict] = {}
    for c in columns:
        if not known[c]:
            continue
        if c in acc:
            if c in nan_cols:
                acc[c]["nan_hidden"] = True
            out[c] = acc[c]
        elif nulls[c][1] > 0 and nulls[c][0] == nulls[c][1]:
            # provably every value is NULL: any range predicate prunes it
            out[c] = {"allnull": True}
    # file row count (footer metadata, free here): lets COUNT(*) on a
    # delta-free snapshot answer from the manifest with zero file opens.
    # Skipped when a REAL column claims the name — clobbering its range
    # entry would crash every pruning read of that column; the table just
    # loses the fast count (row_count() returns None for it).
    if record_count:
        out["_n_rows"] = {"n": int(md.num_rows)}
    return out


def collect_file_stats(
    root: str, rel_paths: list[str], schema: T.StructType
) -> dict[str, dict[str, dict]]:
    """Footer-stats for freshly written files, keyed by relative path.
    Unreadable files or columns degrade to ABSENT entries (unprunable),
    never to wrong bounds."""
    cols = set(eligible_stats_cols(schema))
    if not rel_paths:
        return {}
    # zero eligible range columns still collects row counts ({} cols is
    # fine for _file_stats); row_count() depends on every file having one.
    # A user column named "_n_rows" owns the name — no count recorded.
    record_count = "_n_rows" not in {f.name for f in schema.fields}
    nan_cols = {
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    }

    def one(rel: str) -> tuple[str, dict]:
        try:
            return rel, _file_stats(
                os.path.join(root, rel), cols, nan_cols, record_count=record_count
            )
        except Exception:
            return rel, {}

    with ThreadPoolExecutor(max_workers=min(16, len(rel_paths))) as pool:
        return {rel: st for rel, st in pool.map(one, rel_paths) if st}


def file_overlaps(entry: dict | None, lo, hi) -> bool:
    """May this file contain a row with ``lo <= col <= hi`` under SPARK
    comparison semantics (NaN greatest)? Open bounds pass None. Missing
    entry -> True (cannot prune)."""
    if entry is None:
        return True
    if entry.get("allnull"):
        return False  # range predicates never match NULL
    if lo is not None and entry["max"] < lo and not entry.get("nan_hidden"):
        # a hidden NaN would satisfy col >= lo (NaN outranks everything),
        # so the max-based rule is only sound for NaN-free types
        return False
    if hi is not None and entry["min"] > hi:
        return False
    return True
