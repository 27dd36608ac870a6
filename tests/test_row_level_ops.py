"""Row-level DELETE WHERE / UPDATE WHERE statements compiled onto the
merge machinery: predicate-selected keys/rows, MoR tombstone vs CoW
rewrite parity, key-SET refusal, NULL-predicate semantics."""

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
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [
                ("a", 1, "keep"),
                ("b", 2, "drop"),
                ("c", 3, "drop"),
                ("d", None, "keep"),
                ("e", 9, None),
            ],
            schema="k string, v long, tag string",
        ).withColumn("op", F.lit("insert"))
    )
    return t


def _state(table):
    return {r["k"]: (r["v"], r["tag"]) for r in table.read().collect()}


def test_delete_where_mor_tombstones_only(spark, table):
    base_files_before = dict(table.current_snapshot().files)
    snap, metrics = table.delete_where(F.col("tag") == "drop")
    assert set(_state(table)) == {"a", "d", "e"}
    # MoR: base files untouched, only tombstone deltas appended
    assert dict(snap.files) == base_files_before
    assert any(snap.delta_files.values())
    assert snap.summary["statement"] == "delete_where"


def test_delete_where_cow_matches_mor(spark, tmp_path, table):
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, ["k"], n_buckets=4)
    t2.merge(
        spark.createDataFrame(
            [("a", 1, "keep"), ("b", 2, "drop"), ("c", 3, "drop"),
             ("d", None, "keep"), ("e", 9, None)],
            schema="k string, v long, tag string",
        ).withColumn("op", F.lit("insert"))
    )
    table.delete_where(F.col("v") >= 2, mode="mor")
    t2.delete_where(F.col("v") >= 2, mode="cow")
    assert _state(table) == _state(t2)
    # NULL v (row d) and NULL tag (deleted e has v=9) follow SQL
    # three-valued matching: NULL predicate -> not deleted
    assert "d" in _state(table)


def test_update_where_applies_set_exprs(spark, table):
    table.update_where(
        {"v": F.col("v") * 10, "tag": F.upper("tag")},
        F.col("tag") == "drop",
    )
    st = _state(table)
    assert st["b"] == (20, "DROP") and st["c"] == (30, "DROP")
    assert st["a"] == (1, "keep")  # unmatched untouched
    assert st["e"] == (9, None)  # NULL tag: predicate unknown -> untouched


def test_update_where_refuses_key_and_unknown_columns(spark, table):
    with pytest.raises(ValueError, match="key column"):
        table.update_where({"k": F.lit("z")}, F.lit(True))
    with pytest.raises(ValueError, match="unknown column"):
        table.update_where({"nope": F.lit(1)}, F.lit(True))


def test_update_then_delete_composes(spark, table):
    table.update_where({"v": F.col("v") + 100}, F.col("tag") == "keep")
    table.delete_where(F.col("v") > 101)
    st = _state(table)
    assert st["a"] == (101, "keep")
    assert "d" in st  # v NULL: neither statement matched
    assert set(st) == {"a", "b", "c", "d", "e"} - set()  # nothing else deleted


def test_delete_where_empty_match_is_still_sound(spark, table):
    before = _state(table)
    table.delete_where(F.col("v") > 10_000)
    assert _state(table) == before
