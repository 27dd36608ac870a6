"""Single-threaded pandas reference replayer — the correctness oracle.

Plays the exact role of the reference's scheduled consistency checks
(data_quality_monitoring.py:321-382): an independent, trivially-auditable
computation of the expected final table state. ~60 LoC, no Spark.

Semantics (the contract the engine must match):
- events apply in LSN order (file order is irrelevant);
- duplicate deliveries of the same LSN apply once (payloads are identical
  by construction of an at-least-once source). A MALFORMED log carrying
  two DIFFERENT events under one LSN is outside this oracle's model: the
  engine resolves it deterministically via the (lsn, xxhash64(commit, op))
  tie order in lww_collapse (pinned by
  test_lsn_tie_resolves_deterministically), but this replayer assumes
  redeliveries are byte-identical and keeps an arbitrary one;
- insert/update upsert the row; delete removes it;
- a later event always wins (last-writer-wins);
- ``content_sha256`` = sha256 hex of content (the per-row invariant,
  BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def replay_reference(events: pd.DataFrame) -> pd.DataFrame:
    """Expected final state: one row per live (repo, path)."""
    # per LSN keep one delivery (first in file order) — identical-payload
    # redeliveries make the choice immaterial; a conflicting pair is
    # outside this oracle's model (see module docstring)
    ev = (
        events.sort_values("lsn", kind="stable")
        .drop_duplicates(subset=["lsn"], keep="first")
    )
    state: dict[tuple[str, str], dict] = {}
    has_meta = "lang_meta" in ev.columns
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "delete":
            state.pop(key, None)
        else:
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "lang_meta": getattr(row, "lang_meta", None) if has_meta else None,
                "content_sha256": hashlib.sha256(row.content.encode("utf-8")).hexdigest(),
                "last_lsn": int(row.lsn),
            }
    if not state:
        return pd.DataFrame(
            columns=["repo", "path", "commit", "lang", "lang_meta", "content_sha256", "last_lsn"]
        )
    out = pd.DataFrame(list(state.values()))
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
