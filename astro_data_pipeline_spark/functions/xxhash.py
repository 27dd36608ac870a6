"""Driver-side twin of Spark's ``xxhash64`` expression (XXH64, seed 42).

Purpose: bucket pruning for point lookups WITHOUT a cluster round-trip.
``LakeTable.read_key`` must map a literal key to its hash bucket; doing
that with ``spark.range(1).select(xxhash64(...)).collect()`` costs one
scheduled job per lookup — pure latency under concurrent load, and a
driver-side queue wait on a busy cluster. The key is a handful of
literal scalars, so hash it in-process.

Algorithm: the public xxHash XXH64 specification
(github.com/Cyan4973/xxHash), which Spark implements JVM-side
(org.apache.spark.sql.catalyst.expressions.XxHash64, seed 42, one pass
per column with the running hash as the next column's seed). Bit-for-bit
equality with ``F.xxhash64`` is pinned by
tests/test_xxhash_twin.py over ascii/unicode/empty/long strings, ints,
longs, and multi-column chains.

Only the types the engine uses as merge keys are supported (string,
long, int); anything else falls back to the Spark job at the call site.
"""

from __future__ import annotations

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SEED = 42  # Spark's fixed xxhash64 seed (XxHash64.seed)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` with ``seed`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    seed &= _M
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _avalanche(h)


_SUPPORTED = (T.StringType, T.LongType, T.IntegerType)


def supports(datatypes) -> bool:
    """True if every column type has a driver-side hash twin here."""
    return all(isinstance(dt, _SUPPORTED) for dt in datatypes)


def spark_xxhash64(values, datatypes) -> int:
    """Spark's ``F.xxhash64(c1, c2, ...)`` for literal scalars: one XXH64
    pass per column, previous hash as the next seed, initial seed 42.
    NULLs are skipped (leave the running hash unchanged), matching the
    JVM expression. Returns the SIGNED 64-bit value Spark produces."""
    h = SEED
    for v, dt in zip(values, datatypes):
        if v is None:
            continue
        if isinstance(dt, T.StringType):
            h = xxh64(str(v).encode("utf-8"), h)
        elif isinstance(dt, T.LongType):
            h = xxh64(int(v).to_bytes(8, "little", signed=True), h)
        elif isinstance(dt, T.IntegerType):
            h = xxh64(int(v).to_bytes(4, "little", signed=True), h)
        else:
            raise TypeError(f"no driver-side xxhash64 twin for {dt}")
    return h - (1 << 64) if h >= (1 << 63) else h


def key_bucket(values, datatypes, n_buckets: int) -> int:
    """Driver-side twin of lakehouse ``bucket_expr``:
    ``pmod(xxhash64(keys), n_buckets)`` — Python's floored ``%`` on the
    signed hash equals Spark's pmod for positive n."""
    return spark_xxhash64(values, datatypes) % n_buckets
