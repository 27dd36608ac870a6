"""Declarative MERGE builder: clause routing (first-match-wins),
conditional update/delete/insert, partial-column SET, accumulate-on-
merge, out-of-order guards, CoW/MoR parity, no-clause rows untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from astro_data_pipeline_spark.lakehouse import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
)


def _src(spark, rows, cols="k string, v long, tag string, lsn long"):
    return spark.createDataFrame(rows, schema=cols)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    t.merge(
        _src(
            spark,
            [
                ("a", 1, "x", 10),
                ("b", 2, "x", 10),
                ("c", 3, "y", 10),
            ],
        ).withColumn("op", F.lit("insert"))
    )
    return t


def _state(table):
    return {
        r["k"]: (r["v"], r["tag"], r["lsn"]) for r in table.read().collect()
    }


def test_conditional_update_and_insert(spark, table):
    src = _src(spark, [("a", 100, "z", 20), ("b", 200, "z", 5), ("d", 7, "new", 20)])
    table.merge_builder(src).when_matched_update(
        set={"v": F.col("s.v"), "lsn": F.col("s.lsn")},
        condition=F.col("s.lsn") > F.col("t.lsn"),
    ).when_not_matched_insert().execute()
    st = _state(table)
    # a: guard passes (20>10), v updated, tag KEPT (partial update)
    assert st["a"] == (100, "x", 20)
    # b: out-of-order event (5<10) — untouched
    assert st["b"] == (2, "x", 10)
    # c: not in source — untouched
    assert st["c"] == (3, "y", 10)
    # d: inserted with source columns
    assert st["d"] == (7, "new", 20)


def test_first_match_wins_and_delete(spark, table):
    src = _src(spark, [("a", -1, None, 20), ("b", 5, None, 20)])
    table.merge_builder(src).when_matched_delete(
        condition=F.col("s.v") < 0
    ).when_matched_update(set={"v": F.col("s.v")}).execute()
    st = _state(table)
    assert "a" not in st  # delete clause matched first
    assert st["b"][0] == 5  # fell through to update


def test_accumulate_on_merge(spark, table):
    src = _src(spark, [("a", 10, None, 20), ("e", 5, "e", 1)])
    table.merge_builder(src).when_matched_update(
        set={"v": F.col("t.v") + F.col("s.v")}
    ).when_not_matched_insert(
        values={"tag": F.lit("seeded")}
    ).execute()
    st = _state(table)
    assert st["a"][0] == 11  # 1 + 10
    assert st["e"] == (5, "seeded", 1)  # explicit value overrides source col


def test_conditional_insert_filters(spark, table):
    src = _src(spark, [("f", 1, "keep", 1), ("g", 2, "drop", 1)])
    table.merge_builder(src).when_not_matched_insert(
        condition=F.col("s.tag") == "keep"
    ).execute()
    st = _state(table)
    assert "f" in st and "g" not in st


def test_mor_mode_matches_cow(spark, tmp_path, table):
    src = _src(spark, [("a", 50, None, 30), ("z", 9, "z", 1), ("c", 0, None, 30)])

    def run(t, mode):
        t.merge_builder(src).when_matched_delete(
            condition=F.col("s.v") == 0
        ).when_matched_update(set={"v": F.col("s.v"), "lsn": F.col("s.lsn")}).\
            when_not_matched_insert().execute(mode=mode)
        return _state(t)

    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, ["k"], n_buckets=4)
    t2.merge(
        _src(spark, [("a", 1, "x", 10), ("b", 2, "x", 10), ("c", 3, "y", 10)])
        .withColumn("op", F.lit("insert"))
    )
    assert run(table, "cow") == run(t2, "mor")


def test_no_clauses_raises(spark, table):
    with pytest.raises(ValueError, match="no clauses"):
        table.merge_builder(_src(spark, [("a", 1, None, 1)])).execute()


def test_source_missing_key_raises(spark, table):
    bad = spark.createDataFrame([(1,)], schema="v long")
    with pytest.raises(ValueError, match="merge key"):
        table.merge_builder(bad).when_not_matched_insert().execute()


def test_narrow_source_key_type_is_conformed(spark, tmp_path):
    """bucket_expr is type-sensitive: an int32 source key over a bigint
    table must be cast BEFORE hashing, else existing keys prune the wrong
    buckets and every match is silently classified NOT MATCHED."""
    schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("v", T.LongType(), True)]
    )
    t = LakeTable.create(spark, str(tmp_path / "kt"), schema, ["id"], n_buckets=8)
    t.merge(
        spark.createDataFrame([(1, 10), (2, 20)], schema="id long, v long")
        .withColumn("op", F.lit("insert"))
    )
    narrow_src = spark.createDataFrame([(1, 111), (3, 333)], schema="id int, v long")
    t.merge_builder(narrow_src).when_matched_update(
        set={"v": F.col("s.v")}
    ).when_not_matched_insert().execute()
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: 111, 2: 20, 3: 333}


def test_incompatible_source_key_type_refused(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("v", T.LongType(), True)]
    )
    t = LakeTable.create(spark, str(tmp_path / "kt2"), schema, ["id"], n_buckets=4)
    t.merge(
        spark.createDataFrame([(1, 10)], schema="id long, v long")
        .withColumn("op", F.lit("insert"))
    )
    stringy = spark.createDataFrame([("1", 5)], schema="id string, v long")
    with pytest.raises(ValueError, match="key column"):
        t.merge_builder(stringy).when_not_matched_insert().execute()


def test_null_merge_key_matches_null_safely(spark, tmp_path):
    """The clause join uses eqNullSafe: a NULL key row must MATCH its
    stored NULL-key row (update), not be classified NOT MATCHED (which
    would duplicate it)."""
    schema = T.StructType(
        [T.StructField("k", T.StringType(), True), T.StructField("v", T.LongType(), True)]
    )
    t = LakeTable.create(spark, str(tmp_path / "nk"), schema, ["k"], n_buckets=2)
    t.merge(
        spark.createDataFrame([(None, 1), ("a", 2)], "k string, v long")
        .withColumn("op", F.lit("insert"))
    )
    src = spark.createDataFrame([(None, 100)], "k string, v long")
    t.merge_builder(src).when_matched_update(
        set={"v": F.col("s.v")}
    ).when_not_matched_insert().execute()
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {None: 100, "a": 2}
    assert t.read().count() == 2  # matched, not duplicated


def test_key_assignment_in_update_set_refused(spark, table):
    """A SET on a merge-key column was previously dropped silently (the
    compiled output always carries source-side keys); Delta raises, and
    now so do we — same guard as update_where."""
    src = _src(spark, [("a", 100, "z", 20)])
    with pytest.raises(ValueError, match="merge key"):
        table.merge_builder(src).when_matched_update(
            set={"k": F.lit("hijack"), "v": F.col("s.v")}
        )


def test_key_value_in_insert_values_refused(spark, table):
    src = _src(spark, [("d", 7, "new", 20)])
    with pytest.raises(ValueError, match="merge key"):
        table.merge_builder(src).when_not_matched_insert(
            values={"k": F.lit("other"), "v": F.col("s.v")}
        )
