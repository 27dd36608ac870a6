"""LakeTable.restore — rollback to a retained ancestor as a new commit.

Delta ``RESTORE TABLE ... TO VERSION AS OF`` / Iceberg rollback analog
(reference analog: re-running a failed job from its last good
processing_jobs checkpoint, ProcessingJobService.java:142-164, restated
at table granularity). The design choice under test: the restore
snapshot's PARENT is the restore target, so the undone commits fall off
the snapshot chain — which makes the exactly-once batch ledger rewind
(WAL replay re-applies rolled-back batches), makes ``changes()`` correct
across a restore with no special cases, and lets ``expire_snapshots``
garbage-collect the undone commits without ever folding their batch ids
into the inherited ledger.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from astro_data_pipeline_spark.cdc.fixtures import generate_change_log, load_events_pandas
from astro_data_pipeline_spark.cdc.oracle import replay_reference
from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
from astro_data_pipeline_spark.lakehouse import LakeTable

from tests.test_cdc_engine import _final_state, _new_table, _normalize

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("tag", T.StringType(), True),
    ]
)


def _upd(spark, rows):
    return spark.createDataFrame(rows, schema="id long, v double, tag string, op string")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    t.merge(
        _upd(spark, [(1, 1.0, "a", "insert"), (2, 2.0, "b", "insert"), (3, 3.0, "c", "insert")]),
        summary={"batch_id": "b1", "run_scope": "rs"},
    )
    return t


def _state(table, snapshot=None) -> dict:
    return {r["id"]: (r["v"], r["tag"]) for r in table.read(snapshot=snapshot).collect()}


def test_restore_is_metadata_only_and_reverts_state(spark, table):
    good = table.current_snapshot()
    want = _state(table)
    table.merge(
        _upd(spark, [(1, -999.0, "BAD", "update"), (2, None, None, "delete")]),
        summary={"batch_id": "b2", "run_scope": "rs"},
    )
    bad = table.current_snapshot()
    assert _state(table) != want

    snap = table.restore(good.snapshot_id)
    # pure metadata commit: target's files/deltas re-referenced verbatim
    assert snap.files == good.files
    assert snap.delta_files == good.delta_files
    assert snap.parent_id == good.snapshot_id
    assert snap.snapshot_id == bad.snapshot_id + 1
    assert snap.summary["operation"] == "restore"
    assert snap.summary["restored_from"] == good.snapshot_id
    assert snap.summary["undone_snapshots"] == [bad.snapshot_id]
    assert snap.summary["rolled_back_batches"] == [{"batch_id": "b2", "run_scope": "rs"}]
    assert _state(table) == want
    # the ledger rewound: b2 can be re-applied, b1 still cannot
    assert table.committed_batch_ids() == {"b1"}
    # the undone snapshot stays readable by id until expiry (audit)
    assert _state(table, snapshot=table.snapshot(bad.snapshot_id)) != want
    # history shows the restore as the newest row, chain bypasses `bad`
    ids = [s.snapshot_id for s in table.snapshot_chain()]
    assert bad.snapshot_id not in ids and ids[0] == snap.snapshot_id


def test_restore_reverts_schema_evolution(spark, table):
    good = table.current_snapshot()
    table.add_columns([T.StructField("extra", T.LongType(), True)])
    assert "extra" in table.read().columns
    table.restore(good.snapshot_id)
    assert table.current_snapshot().schema == good.schema
    assert "extra" not in table.read().columns
    # and the name is reusable again — it was never written to any file
    # the restored snapshot references
    table.add_columns([T.StructField("extra", T.LongType(), True)])
    assert "extra" in table.read().columns


def test_restore_reinstates_dropped_name_poison(spark, table):
    table.drop_columns(["tag"])
    poisoned = table.current_snapshot()
    assert "tag" in poisoned.dropped_cols
    # rebucket rewrites every file -> the name becomes reusable
    table.rebucket(8)
    table.add_columns([T.StructField("tag", T.StringType(), True)])
    assert "tag" in table.read().columns
    # restoring to the poisoned snapshot re-references the PRE-rebucket
    # files (which still physically carry the old tag values), so the
    # poison must come back with them
    table.restore(poisoned.snapshot_id)
    assert "tag" in table.current_snapshot().dropped_cols
    with pytest.raises(ValueError, match="resurrect"):
        table.add_columns([T.StructField("tag", T.StringType(), True)])


def test_restore_refusals(spark, table):
    good = table.current_snapshot()
    table.merge(_upd(spark, [(1, 9.0, "z", "update")]), summary={"batch_id": "b2"})
    undone = table.current_snapshot()
    restored = table.restore(good.snapshot_id)
    # current snapshot
    with pytest.raises(ValueError, match="already current"):
        table.restore(restored.snapshot_id)
    # a snapshot undone by a prior restore is off the chain
    with pytest.raises(ValueError, match="not a retained ancestor"):
        table.restore(undone.snapshot_id)
    # a snapshot id newer than current never existed
    with pytest.raises(ValueError, match="not a retained ancestor"):
        table.restore(restored.snapshot_id + 10)
    # an expired snapshot: cut out of the retained chain
    for i in range(3):
        table.merge(_upd(spark, [(1, float(i), "w", "update")]), summary={"batch_id": f"m{i}"})
    table.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="not a retained ancestor"):
        table.restore(good.snapshot_id)


def test_changes_across_restore(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    root = t.current_snapshot()
    t.merge_mor(_upd(spark, [(1, 1.0, "a", "insert"), (2, 2.0, "b", "insert")]))
    good = t.current_snapshot()
    t.merge_mor(_upd(spark, [(1, -1.0, "BAD", "update"), (3, 3.0, "BAD", "insert")]))
    bad = t.current_snapshot()
    restored = t.restore(good.snapshot_id)
    t.merge_mor(_upd(spark, [(2, 20.0, "b2", "update"), (2, None, None, "delete")]))

    # state(restore) == state(target): the true diff is empty
    assert t.changes(good.snapshot_id, restored.snapshot_id).count() == 0
    # target -> current: only the post-restore commit's net effect;
    # the undone commit's deltas are off the walk
    diff = {r["id"]: r["change_type"] for r in t.changes(good.snapshot_id).collect()}
    assert diff == {2: "delete"}
    # root -> current spans the restore: pre-target + post-restore deltas
    full = {r["id"]: r["change_type"] for r in t.changes(root.snapshot_id).collect()}
    assert full == {1: "insert"}  # 2 nets out (insert then delete), 3 was rolled back
    # an undone snapshot is not an ancestor — refused, never diffed
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(bad.snapshot_id)


def test_expire_after_restore_garbage_collects_undone(spark, table):
    good = table.current_snapshot()
    table.merge(
        _upd(spark, [(1, -1.0, "x", "update")]), summary={"batch_id": "b2", "run_scope": "rs"}
    )
    table.merge(
        _upd(spark, [(2, -2.0, "y", "update")]), summary={"batch_id": "b3", "run_scope": "rs"}
    )
    undone_ids = [table.snapshot_chain()[0].snapshot_id, table.snapshot_chain()[1].snapshot_id]
    want = _state(table, snapshot=good)
    restored = table.restore(good.snapshot_id)

    table.expire_snapshots(keep_last=2)  # keeps [restore, good]
    meta = os.path.join(table.root, "metadata")
    kept = {
        int(fn[len("snapshot-"):-len(".json")])
        for fn in os.listdir(meta)
        if fn.startswith("snapshot-")
    }
    assert kept == {restored.snapshot_id, good.snapshot_id}
    for sid in undone_ids:
        assert sid not in kept
    # undone data files gone, restored state intact
    assert _state(table) == want
    # rolled-back batch ids were NEVER folded into the inherited ledger
    assert table.committed_batch_ids() == {"b1"}


def test_restore_rewind_then_replay_reapplies(spark, tmp_path, tmp_path_factory):
    """The reason a CDC sink restores at all: fix-the-bug, rewind, resume.
    Rolling back mid-replay removes the undone batches from the
    exactly-once ledger, so a second replay over the same WAL re-applies
    exactly those batches and converges to the same final state as an
    uninterrupted replay."""
    meta = generate_change_log(
        str(tmp_path_factory.mktemp("restore_wal")), n_repos=6, n_keys=60, n_events=500
    )
    events_pd = load_events_pandas(meta)
    oracle = _normalize(replay_reference(events_pd))

    table = _new_table(spark, tmp_path)
    events = read_event_log(spark, meta["v1_path"], meta["v2_path"])
    CdcRunner(spark, table, run_id="r1").replay(events, n_batches=4)
    full_ledger = table.committed_batch_ids()
    pd.testing.assert_frame_equal(_final_state(table), oracle, check_dtype=False)

    # rewind two commits (the last two applied batches)
    chain = table.snapshot_chain()
    target = chain[2]
    table.restore(target.snapshot_id)
    rewound = table.committed_batch_ids()
    assert rewound < full_ledger and len(full_ledger - rewound) == 2

    # resume: rolled-back batches re-apply, earlier ones skip
    reports = CdcRunner(spark, table, run_id="r2").replay(events, n_batches=4)
    statuses = [r.status for r in reports]
    assert statuses.count("applied") == 2
    assert statuses.count("skipped") == 2
    assert table.committed_batch_ids() == full_ledger
    pd.testing.assert_frame_equal(_final_state(table), oracle, check_dtype=False)
