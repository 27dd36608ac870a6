"""Custom stateful streaming operator: per-key LWW state machine via
``applyInPandasWithState`` (SURVEY.md §2.11 "state store / progress
tracking").

The batch engine materializes current-state into the lake table; this is
the *continuous* twin — a keyed state store that carries each
``(repo, path)``'s winning ``(last_lsn, alive, content_sha256)`` across
micro-batches and emits a changelog row whenever a batch advances a key.
Reference analog: the ``processing_jobs`` status state machine persisted
between polls (ProcessingJob.java:155-232) and the catalog's
insert-or-update current row (CatalogService.java:153-174) — here the
"database" is Spark's versioned state store, checkpointed with the
query, so a restart resumes with state intact.

Semantics (same contract as ``cdc.oracle.replay_reference``):
- within a batch the highest-LSN event per key wins (vectorized pandas
  idxmax over the Arrow batches);
- the batch winner only applies if its LSN exceeds the stored one —
  cross-batch LWW even if the source delivers out of LSN order across
  triggers;
- delete flips ``alive`` to false but KEEPS the tombstone in state (a
  later re-insert must still compare LSNs — dropping state would let a
  stale pre-delete update resurrect the key);
- duplicate deliveries (same LSN) never advance state — idempotent;
- a MALFORMED same-LSN conflict resolves by the SAME
  ``(lsn, xxhash64(commit, op))`` order as the batch collapse: the tie
  hash is computed JVM-side before the state operator and carried in
  state, so batch replay and the streaming twin converge to the same
  winner within a batch, across batches, and across restarts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_lsn", T.LongType()),
        T.StructField("last_tie", T.LongType()),
        T.StructField("alive", T.BooleanType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("lang_meta", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("last_lsn", T.LongType()),
        # the tie-break hash rides along: a malformed same-LSN conflict
        # split across micro-batches emits TWO rows with one last_lsn,
        # and without the tie a consumer ordering by last_lsn alone
        # picks the key's "current" row arbitrarily — order by
        # (last_lsn, last_tie)
        T.StructField("last_tie", T.LongType()),
        T.StructField("alive", T.BooleanType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("lang_meta", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)


def _lww_state_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """One key's state transition for one micro-batch."""
    best: pd.Series | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        # winner order (lsn, _tie) — _tie is the JVM-computed shared
        # lww_tie_expr hash, the batch collapse's exact tie rule;
        # lexsort keeps the pick vectorized (last = max)
        win = np.lexsort((pdf["_tie"].values, pdf["lsn"].values))[-1]
        row = pdf.iloc[win]
        if best is None or (int(row["lsn"]), int(row["_tie"])) > (
            int(best["lsn"]), int(best["_tie"])
        ):
            best = row
    if best is None:
        return
    new_lsn, new_tie = int(best["lsn"]), int(best["_tie"])
    if state.exists and (new_lsn, new_tie) <= (int(state.get[0]), int(state.get[1])):
        return  # stale or duplicate delivery — state unchanged, no emit
    alive = best["op"] != "delete"
    content = best["content"]
    sha = (
        hashlib.sha256(str(content).encode("utf-8")).hexdigest()
        if alive and content is not None
        else None
    )

    def _s(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)

    commit = _s(best.get("commit")) if alive else None
    lang = _s(best.get("lang")) if alive else None
    lang_meta = _s(best.get("lang_meta")) if alive else None
    state.update((new_lsn, new_tie, bool(alive), commit, lang, lang_meta, sha))
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "path": [key[1]],
            "last_lsn": [new_lsn],
            "last_tie": [new_tie],
            "alive": [bool(alive)],
            "commit": [commit],
            "lang": [lang],
            "lang_meta": [lang_meta],
            "content_sha256": [sha],
        }
    )


def stateful_current_state_changelog(events: DataFrame) -> DataFrame:
    """Streaming changelog of per-key current state.

    ``events`` must be a streaming DataFrame with the event-log schema.
    Emits one row per (key, batch) where the batch advanced the key.
    The last emitted row per key IS the key's current state — downstream
    can sink it to a changelog topic or merge it into a serving table.
    """
    from pyspark.sql import functions as F

    from ..cdc.apply import lww_tie_expr, valid_predicate

    # Same quarantine gate as the batch path (valid_predicate): without
    # it one null-lsn event poisons the stream — Arrow hands the kernel
    # a float64 lsn column (NaN), int(NaN) raises, the task dies, and
    # the restart replays the same micro-batch forever. Null repo/path
    # would likewise mint bogus state keys. The tie hash is the batch
    # collapse's own rule (shared builder — a drifting private copy
    # would let the two paths crown different same-LSN winners).
    tie = lww_tie_expr(events.columns)
    if tie is None:
        # minimal frames without any identity column: bare-lsn ordering,
        # same degrade as the batch collapse (a constant tie never
        # discriminates, matching lww_collapse's bare-lsn _ord)
        tie = F.lit(0).cast("long")
    tagged = events.filter(valid_predicate()).withColumn("_tie", tie)
    return tagged.groupBy("repo", "path").applyInPandasWithState(
        _lww_state_update,
        outputStructType=CHANGELOG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
