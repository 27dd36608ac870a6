"""Bit-equality of the driver-side XXH64 twin (functions/xxhash.py) with
Spark's ``F.xxhash64`` — the contract that lets point lookups bucket-prune
without a cluster round-trip."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from astro_data_pipeline_spark.functions.xxhash import (
    key_bucket,
    spark_xxhash64,
    supports,
    xxh64,
)


def _spark_hash(spark, values, datatypes):
    cols = [
        F.lit(v).cast(dt).alias(f"c{i}")
        for i, (v, dt) in enumerate(zip(values, datatypes))
    ]
    df = spark.range(1).select(F.xxhash64(*cols).alias("h"))
    return df.collect()[0]["h"]


CASES = [
    (["repo/alpha"], [T.StringType()]),
    ([""], [T.StringType()]),
    (["ü"], [T.StringType()]),
    (["日本語のテキスト — unicode over the 4-byte tail"], [T.StringType()]),
    (["x" * 31], [T.StringType()]),
    (["x" * 32], [T.StringType()]),   # first 32-byte stripe boundary
    (["y" * 1000], [T.StringType()]), # multi-stripe + tail
    ([0], [T.LongType()]),
    ([-1], [T.LongType()]),
    ([2**63 - 1], [T.LongType()]),
    ([-(2**63)], [T.LongType()]),
    ([42], [T.IntegerType()]),
    ([-7], [T.IntegerType()]),
    # multi-column chains (seed threading)
    (["repo/a", "src/main.py"], [T.StringType(), T.StringType()]),
    (["repo/a", 123456789], [T.StringType(), T.LongType()]),
    ([None, "path"], [T.StringType(), T.StringType()]),  # NULL skipped
]


@pytest.mark.parametrize("values,datatypes", CASES)
def test_twin_matches_spark(spark, values, datatypes):
    assert supports(datatypes)
    assert spark_xxhash64(values, datatypes) == _spark_hash(spark, values, datatypes)


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200), st.integers(-(2**63), 2**63 - 1))
def test_twin_matches_spark_property(spark_global, s, n):
    dts = [T.StringType(), T.LongType()]
    assert spark_xxhash64([s, n], dts) == _spark_hash(spark_global, [s, n], dts)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_known_vector():
    """Published XXH64 test vector (xxHash spec): empty input, seed 0."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


def test_key_bucket_matches_bucket_expr(spark):
    from astro_data_pipeline_spark.lakehouse.table import bucket_expr

    rows = [("repo/%d" % i, "path/%d.py" % (i * 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "repo string, path string")
    got = df.select(
        "repo", "path", bucket_expr(["repo", "path"], 64).alias("b")
    ).collect()
    for r in got:
        assert (
            key_bucket([r["repo"], r["path"]], [T.StringType(), T.StringType()], 64)
            == r["b"]
        )
