"""Deterministic CDC fixtures (seed=42) — FIXTURES.md §1–3.

Mirrors the reference's seeded simulator (fits_generator.py:46: the
simulator fixes ``random_seed: 42`` and generates physically-plausible
inputs); here the domain is source-code repositories per BASELINE.json
``input_hint``: key ``(repo, path)``, payload ``(commit, lang, content)``.

Produces:
- ``change_events_v1.parquet``  — events with lsn ≤ evolution_lsn,
  WITHOUT the ``lang_meta`` column (pre-evolution file schema);
- ``change_events_v2.parquet``  — events after the boundary WITH
  ``lang_meta`` (additive schema evolution mid-stream);
- adversarial properties (each a pytest case): ~2% duplicate LSN
  deliveries, bounded out-of-order shuffling, delete→reinsert of the
  same key, Zipf-hot repos with a hot-key burst.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42

# Bump when generated data changes shape/content: cached fixture dirs
# (bench .bench/sf*, the e2e gate fixture) regenerate on version mismatch
# instead of silently serving stale segments.
FIXTURE_VERSION = 2
EXTS = {"py": "python", "java": "java", "sql": "sql", "md": "markdown",
        "yml": "yaml", "ts": "typescript"}
_WORDS = (
    "def class return import for while if else try except yield lambda "
    "select from where group join order limit insert update delete merge "
    "fn let const var async await struct impl trait match enum pub mod"
).split()


def _content(rng_ints: np.ndarray, repos: np.ndarray, paths: np.ndarray,
             versions: np.ndarray) -> list[str]:
    """Deterministic pseudo-source text, function of (repo, path, version)
    so every update changes sha256(content). Length 200–4000 chars."""
    out = []
    nw = len(_WORDS)
    for h, repo, path, ver in zip(rng_ints, repos, paths, versions):
        h = int(h)  # numpy uint64 + python int arithmetic promotes to float64
        length = 200 + (h % 3801)
        start = h % nw
        body = " ".join(_WORDS[(start + k) % nw] for k in range(24))
        text = f"// {repo}/{path} v{ver}\n" + (body + "\n") * (length // (len(body) + 1) + 1)
        out.append(text[:length])
    return out


def _hash_rows(*arrays) -> np.ndarray:
    """Vectorized stable row hash (content/commit derivation)."""
    acc = np.zeros(len(arrays[0]), dtype=np.uint64)
    for a in arrays:
        if a.dtype.kind in ("U", "O", "S"):
            vals = pd.util.hash_array(np.asarray(a, dtype=object), hash_key="0123456789abcdef")
        else:
            vals = pd.util.hash_array(np.asarray(a))
        acc = acc * np.uint64(1000003) + vals.astype(np.uint64)
    return acc


def generate_change_log(
    out_dir: str,
    n_repos: int = 50,
    n_keys: int = 2000,
    n_events: int = 10000,
    dup_frac: float = 0.02,
    shuffle_window: int = 500,
    hot_burst_frac: float = 0.3,
    evolution_frac: float = 0.6,
    seed: int = SEED,
) -> dict:
    """Write the two event-log segments; return metadata (paths, boundary).

    Event mix after the initial inserts: ~70% update / 15% delete /
    15% (re)insert; delete targets live keys, reinsert targets dead ones
    (exercising the delete→reinsert LWW path).
    """
    rng = np.random.default_rng(seed)

    # --- keys: Zipf-skewed repo sizes (hot-key realism, FIXTURES.md §1)
    repo_weights = 1.0 / np.power(np.arange(1, n_repos + 1), 1.2)
    repo_weights /= repo_weights.sum()
    key_repo_idx = rng.choice(n_repos, size=n_keys, p=repo_weights)
    repos = np.array([f"repo_{i:05d}" for i in range(n_repos)])
    exts = list(EXTS)
    key_paths = np.array(
        [
            f"src/m{rng.integers(0, 40)}/f{j}.{exts[int(h % len(exts))]}"
            for j, h in enumerate(rng.integers(0, 1 << 31, size=n_keys))
        ]
    )
    key_repos = repos[key_repo_idx]

    # --- op sequence: every key inserted once, then random churn
    n_churn = max(n_events - n_keys, 0)
    churn_key = rng.choice(n_keys, size=n_churn)
    # hot burst: a contiguous slice of churn targets the hottest repo's
    # keys — repo 0, the Zipf head by construction (key_repo_idx[0] was
    # whatever repo KEY 0 landed in, which can be a 1-key tail repo that
    # barely exercises the salting path this burst exists to stress)
    hot_keys = np.flatnonzero(key_repo_idx == 0)
    if not len(hot_keys):
        hot_keys = np.flatnonzero(key_repo_idx == key_repo_idx[0])
    if len(hot_keys) and n_churn > 100:
        lo = n_churn // 3
        hi = lo + int(n_churn * hot_burst_frac)
        churn_key[lo:hi] = rng.choice(hot_keys, size=hi - lo)
    churn_roll = rng.random(n_churn)

    key_order = rng.permutation(n_keys)
    ev_key = np.concatenate([key_order, churn_key])
    n_total = len(ev_key)

    # assign ops walking the log (live-set aware for delete/reinsert)
    ops = np.empty(n_total, dtype=object)
    ops[:n_keys] = "insert"
    alive = np.ones(n_keys, dtype=bool)
    for i in range(n_churn):
        k = churn_key[i]
        r = churn_roll[i]
        if not alive[k]:
            ops[n_keys + i] = "insert"
            alive[k] = True
        elif r < 0.15:
            ops[n_keys + i] = "delete"
            alive[k] = False
        else:
            ops[n_keys + i] = "update"

    lsn = np.arange(1, n_total + 1, dtype=np.int64) * 10  # gaps allowed
    version = np.zeros(n_total, dtype=np.int64)
    vc = np.zeros(n_keys, dtype=np.int64)
    for i, k in enumerate(ev_key):
        vc[k] += 1
        version[i] = vc[k]

    ev_repo = key_repos[ev_key]
    ev_path = key_paths[ev_key]
    h = _hash_rows(ev_repo, ev_path, version)
    # 40 hex chars (sha1-like, the FIXTURES.md contract): 16 + 16 + 8
    h2 = h * np.uint64(31)
    h3 = (h ^ (h >> np.uint64(13))) * np.uint64(0x27D4EB2F)
    commit = np.array(
        [
            f"{int(a):016x}{int(b):016x}{int(c) & 0xFFFFFFFF:08x}"
            for a, b, c in zip(h, h2, h3)
        ]
    )
    lang = np.array([EXTS[p.rsplit(".", 1)[-1]] for p in ev_path])
    content = np.array(_content(h, ev_repo, ev_path, version), dtype=object)
    content[ops == "delete"] = None

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "ts": pd.Timestamp("2025-01-01") + pd.to_timedelta(lsn, unit="ms"),
            "op": ops,
            "repo": ev_repo,
            "path": ev_path,
            "commit": commit,
            "lang": lang,
            "content": content,
        }
    )

    # --- schema evolution: lang_meta only after the boundary LSN
    evolution_lsn = int(df["lsn"].iloc[int(n_total * evolution_frac)])
    v2 = df[df["lsn"] > evolution_lsn].copy()
    tok = v2["content"].str.len().fillna(0).astype(int)
    v2["lang_meta"] = np.where(
        v2["op"].values == "delete", None, ('{"loc": ' + (tok // 40).astype(str) + "}")
    )

    v1 = df[df["lsn"] <= evolution_lsn].copy()

    # --- duplicate deliveries (~2%, same lsn & payload — at-least-once)
    def with_dups(seg: pd.DataFrame) -> pd.DataFrame:
        k = max(int(len(seg) * dup_frac), 1)
        dup_rows = seg.sample(n=k, random_state=seed)
        return pd.concat([seg, dup_rows], ignore_index=True)

    v1, v2 = with_dups(v1), with_dups(v2)

    # --- bounded out-of-order shuffle (replay must order by LSN)
    def windowed_shuffle(seg: pd.DataFrame) -> pd.DataFrame:
        seg = seg.sort_values("lsn", kind="stable").reset_index(drop=True)
        idx = np.arange(len(seg))
        local_rng = np.random.default_rng(seed + len(seg))
        for lo in range(0, len(seg), shuffle_window):
            hi = min(lo + shuffle_window, len(seg))
            idx[lo:hi] = local_rng.permutation(idx[lo:hi])
        return seg.iloc[idx].reset_index(drop=True)

    v1, v2 = windowed_shuffle(v1), windowed_shuffle(v2)

    os.makedirs(out_dir, exist_ok=True)
    p1 = os.path.join(out_dir, "change_events_v1.parquet")
    p2 = os.path.join(out_dir, "change_events_v2.parquet")
    # Spark rejects TIMESTAMP(NANOS) parquet — write microsecond timestamps.
    # Small row groups (32k rows ≈ 5-8 MB) mirror real WAL segment files:
    # Spark parallelizes a parquet scan at row-group granularity, so a
    # single huge row group would serialize the whole log through one
    # task; and since disorder is bounded (shuffle_window), each group's
    # lsn min/max stats let batch-range predicates prune most groups.
    kw = dict(
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        row_group_size=32768,
    )
    v1.to_parquet(p1, **kw)
    v2.to_parquet(p2, **kw)
    return {
        "v1_path": p1,
        "v2_path": p2,
        "evolution_lsn": evolution_lsn,
        "n_events": int(len(v1) + len(v2)),
        "max_lsn": int(df["lsn"].max()),
        "n_keys": n_keys,
        "n_repos": n_repos,
        "seed": seed,
        "fixture_version": FIXTURE_VERSION,
    }


def load_events_pandas(meta: dict) -> pd.DataFrame:
    """Both segments as one pandas frame (v1 gets lang_meta = NaN)."""
    v1 = pd.read_parquet(meta["v1_path"])
    v2 = pd.read_parquet(meta["v2_path"])
    v1["lang_meta"] = None
    return pd.concat([v1, v2], ignore_index=True)


def publish_fixture_dir(tmp: str, target: str, read_valid) -> dict:
    """Atomically publish a fully-built fixture directory at ``target``.

    The ONE copy of the concurrency-critical publish protocol, shared by
    ``cdc.queries._ensure_e2e_fixture`` and ``bench.cdc_fixture_dir``
    (hand-synchronized twins drift; this one gets the lock).

    Protocol: the whole validate → clear-invalid-occupant → rename
    sequence runs under an exclusive flock on ``<target>.lock``, which
    closes the validate/rmtree TOCTOU two unlocked publishers have —
    without the lock, publisher B can validate an occupant as invalid,
    publisher A can rename its valid fixture in, and B's rmtree then
    deletes A's just-published files out from under A's readers. Under
    the lock, whoever publishes first wins and the loser re-validates
    and ADOPTS the winner's (deterministic, byte-equivalent) fixture.
    Readers never take the lock: they only ever see no-dir or a
    fully-renamed dir.

    ``read_valid()`` must return the fixture's meta dict if ``target``
    currently holds a usable fixture, else None. Returns the published
    (or adopted) meta; the caller's ``tmp`` is consumed or discarded.
    """
    import fcntl
    import shutil

    lock_path = target + ".lock"
    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            winner = read_valid()
            if winner is not None:
                shutil.rmtree(tmp, ignore_errors=True)
                return winner
            # occupant (if any) is invalid — safe to clear under the lock
            shutil.rmtree(target, ignore_errors=True)
            os.rename(tmp, target)
            meta = read_valid()
            if meta is None:
                raise OSError(
                    f"fixture published at {target} failed its own validity check"
                )
            return meta
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
