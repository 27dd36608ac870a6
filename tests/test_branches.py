"""Branches + write-audit-publish (WAP): fork, isolated writes, audited
fast-forward publish, branch-scoped exactly-once, maintenance guards.

Reference analog: the reference stages ingest into staging tables and
promotes to the catalog only after its quality-verification DAG passes
(data_quality_monitoring.py); Iceberg expresses the same flow as branch
refs + fast-forward. Snapshots and data files are shared across refs —
a branch is one tiny ref file.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from astro_data_pipeline_spark.lakehouse import CommitConflictError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _updates(spark, rows):
    return spark.createDataFrame(rows, schema="repo string, path string, v long, op string")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    t.merge(_updates(spark, [("r1", "a", 1, "insert"), ("r1", "b", 2, "insert")]))
    return t


def _state(t):
    return {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}


def test_branch_writes_invisible_on_main(spark, table):
    b = table.create_branch("staging")
    b.merge_mor(_updates(spark, [("r2", "c", 3, "insert"), ("r1", "a", 10, "update")]))
    assert _state(table) == {("r1", "a"): 1, ("r1", "b"): 2}
    assert _state(b) == {("r1", "a"): 10, ("r1", "b"): 2, ("r2", "c"): 3}
    assert table.refs().keys() == {"main", "staging"}


def test_fast_forward_publishes(spark, table):
    b = table.create_branch("staging")
    b.merge_mor(_updates(spark, [("r2", "c", 3, "insert")]), summary={"batch_id": "b1"})
    snap = table.fast_forward("staging")
    assert table.current_snapshot().snapshot_id == snap.snapshot_id
    assert _state(table) == {("r1", "a"): 1, ("r1", "b"): 2, ("r2", "c"): 3}
    # publish is a ref move, not new snapshots: heads now equal
    assert table.refs()["main"] == table.refs()["staging"]


def test_fast_forward_refuses_diverged_main(spark, table):
    b = table.create_branch("staging")
    b.merge_mor(_updates(spark, [("r2", "c", 3, "insert")]))
    # main moves after the fork: the branch no longer contains its history
    table.merge_mor(_updates(spark, [("r9", "z", 9, "insert")]))
    with pytest.raises(CommitConflictError, match="not a fast-forward"):
        table.fast_forward("staging")
    # and a stale branch can never rewind main
    with pytest.raises(CommitConflictError):
        LakeTable.load(spark, table.root, ref="staging").fast_forward(
            "main", target_ref="staging"
        ) and table.fast_forward("staging")


def test_branch_scoped_exactly_once_ledger(spark, table):
    """A batch committed on the branch is, after publish, visible to
    main's ledger — a resumed main replay skips it."""
    b = table.create_branch("staging")
    b.merge_mor(
        _updates(spark, [("r2", "c", 3, "insert")]),
        summary={"batch_id": "wap-1", "run_scope": "s"},
    )
    assert "wap-1" in {x for x in b.committed_batch_ids(run_scope="s")}
    assert "wap-1" not in {x for x in table.committed_batch_ids(run_scope="s")}
    table.fast_forward("staging")
    assert "wap-1" in {x for x in table.committed_batch_ids(run_scope="s")}


def test_audit_reject_path(spark, table):
    """The audit fails: drop the branch — main never saw the bad batch,
    and re-forking the same name works."""
    before = _state(table)
    b = table.create_branch("staging")
    b.merge_mor(_updates(spark, [("r1", "a", -99, "update")]))  # fails audit
    bad = [r for r in b.read().collect() if r["v"] is not None and r["v"] < 0]
    assert bad  # audit catches it on the branch view
    table.drop_branch("staging")
    assert _state(table) == before
    b2 = table.create_branch("staging")
    assert _state(b2) == before


def test_expire_refuses_with_live_branches(spark, table):
    table.create_branch("staging")
    with pytest.raises(RuntimeError, match="live branches"):
        table.expire_snapshots(keep_last=1)
    table.drop_branch("staging")
    table.expire_snapshots(keep_last=1)  # now fine
    assert _state(table) == {("r1", "a"): 1, ("r1", "b"): 2}


def test_expire_runs_from_main_only(spark, table):
    b = table.create_branch("staging")
    with pytest.raises(RuntimeError, match="main"):
        b.expire_snapshots(keep_last=1)


def test_branch_restore_and_schema_evolution_isolated(spark, table):
    b = table.create_branch("staging")
    b.add_columns([T.StructField("lang", T.StringType(), True)])
    assert "lang" in [f.name for f in b.current_snapshot().schema.fields]
    assert "lang" not in [f.name for f in table.current_snapshot().schema.fields]
    # restore on the branch rewinds the branch only
    b.restore(table.current_snapshot().snapshot_id)
    assert "lang" not in [f.name for f in b.current_snapshot().schema.fields]


def test_create_branch_duplicate_and_reserved(spark, table):
    table.create_branch("staging")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("staging")
    with pytest.raises(ValueError, match="reserved"):
        table.create_branch("main")
    with pytest.raises(ValueError, match="invalid ref"):
        table.create_branch("bad/name")


def test_branch_diff_previews_publish(spark, table):
    """branch_diff = the net change publish would apply: insert, update,
    and delete classified against main's state; diverged main raises."""
    table.merge_mor(_updates(spark, [("r2", "c", 3, "insert")]))
    b = table.create_branch("staging")
    b.merge_mor(
        _updates(
            spark,
            [("r3", "d", 4, "insert"), ("r1", "a", 11, "update"), ("r2", "c", 0, "delete")],
        )
    )
    diff = {
        (r["repo"], r["path"]): (r["change_type"], r["v"])
        for r in table.branch_diff("staging").collect()
    }
    assert diff == {
        ("r3", "d"): ("insert", 4),
        ("r1", "a"): ("update", 11),
        ("r2", "c"): ("delete", None),
    }
    # diverged main: the ancestor guard refuses (publish would conflict)
    table.merge_mor(_updates(spark, [("r9", "z", 9, "insert")]))
    with pytest.raises(ValueError):
        table.branch_diff("staging")
    with pytest.raises(ValueError, match="unknown branch"):
        table.branch_diff("nope")
