"""Lightweight phase profiler for driver-side serial-time hunts.

The replay's scaling ceiling is Amdahl serial fraction: per-batch driver
work (plan analysis, commit bookkeeping, metrics retrieval) that doesn't
shrink with cores. ``phase("name")`` wraps suspect sections; timings
accumulate only when ``SPARK_GRAFT_PROFILE=1`` so production runs pay a
single dict lookup. Compare dumps at local[8] vs local[32]: phases whose
wall time doesn't drop ~4x are the serial fraction.
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

ENABLED = os.environ.get("SPARK_GRAFT_PROFILE", "") == "1"

# name -> [total_seconds, n_calls]
TIMINGS: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])
# the pipelined runner times phases from pool worker threads — the
# read-modify-write accumulation below must not lose increments
_LOCK = threading.Lock()


@contextmanager
def phase(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        with _LOCK:
            cell = TIMINGS[name]
            cell[0] += dt
            cell[1] += 1


def reset() -> None:
    TIMINGS.clear()


def dump() -> dict[str, dict]:
    return {
        k: {"total_s": round(v[0], 3), "calls": int(v[1])}
        for k, v in sorted(TIMINGS.items(), key=lambda kv: -kv[1][0])
    }
