"""Structured Streaming replay tests (SURVEY.md §2.11): the event-push
trigger path must converge to the same oracle state as the batch loop,
survive restarts without double-applying, and bound windowed-agg state
with a watermark."""

from __future__ import annotations

import pandas as pd
import pytest

from astro_data_pipeline_spark.cdc import apply as A
from astro_data_pipeline_spark.cdc.fixtures import generate_change_log, load_events_pandas
from astro_data_pipeline_spark.cdc.oracle import replay_reference
from astro_data_pipeline_spark.lakehouse import LakeTable
from astro_data_pipeline_spark.streaming import (
    event_log_stream,
    stream_replay_available_now,
    stream_windowed_op_counts,
)
from pyspark.sql import types as T

FINAL_COLS = ["repo", "path", "commit", "lang", "lang_meta", "content_sha256", "last_lsn"]


@pytest.fixture(scope="module")
def fixture_meta(tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_fixtures")
    return generate_change_log(str(out), n_repos=10, n_keys=200, n_events=1500)


@pytest.fixture(scope="module")
def oracle_state(fixture_meta) -> pd.DataFrame:
    return replay_reference(load_events_pandas(fixture_meta))


def _glob(fixture_meta) -> str:
    import os

    return os.path.join(os.path.dirname(fixture_meta["v1_path"]), "change_events_*.parquet")


def _new_table(spark, tmp_path) -> LakeTable:
    return LakeTable.create(
        spark,
        str(tmp_path / "lake"),
        T.StructType(A.BASE_TABLE_FIELDS),
        key_cols=A.KEY_COLS,
        n_buckets=8,
    )


def _final_state(table: LakeTable) -> pd.DataFrame:
    pdf = table.read().toPandas()
    for c in FINAL_COLS:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[FINAL_COLS].sort_values(["repo", "path"]).reset_index(drop=True)
    pdf["lang_meta"] = pdf["lang_meta"].where(pd.notna(pdf["lang_meta"]), None)
    return pdf


def test_stream_replay_matches_oracle(spark, tmp_path, fixture_meta, oracle_state):
    table = _new_table(spark, tmp_path)
    reports = stream_replay_available_now(
        spark,
        _glob(fixture_meta),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        run_id="stream-test",
    )
    assert [r["status"] for r in reports].count("applied") >= 2  # one per segment
    final = _final_state(table)
    expected = oracle_state[FINAL_COLS].reset_index(drop=True)
    expected = expected.assign(
        lang_meta=expected["lang_meta"].where(pd.notna(expected["lang_meta"]), None)
    )
    pd.testing.assert_frame_equal(final, expected, check_dtype=False)


def test_stream_restart_is_exactly_once(spark, tmp_path, fixture_meta, oracle_state):
    table = _new_table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    stream_replay_available_now(spark, _glob(fixture_meta), table, ckpt, run_id="s1")
    snap_before = table.current_snapshot().snapshot_id
    # restart over the same checkpoint: no new files -> no new commits
    reports2 = stream_replay_available_now(spark, _glob(fixture_meta), table, ckpt, run_id="s2")
    assert all(r["status"] != "applied" for r in reports2)
    assert table.current_snapshot().snapshot_id == snap_before
    pd.testing.assert_frame_equal(
        _final_state(table),
        _final_state(table),  # deterministic read
        check_dtype=False,
    )


def test_stream_epoch_dedupe_closes_foreachbatch_gap(spark, tmp_path, fixture_meta):
    """Simulate 'merge committed but checkpoint lost': replaying the same
    epoch id against the table must be skipped by the manifest check."""
    from astro_data_pipeline_spark.streaming.runner_bridge import apply_stream_batch
    from astro_data_pipeline_spark.cdc.runner import read_event_log

    table = _new_table(spark, tmp_path)
    events = read_event_log(spark, fixture_meta["v1_path"], fixture_meta["v2_path"])
    r1 = apply_stream_batch(events, epoch_id=7, table=table, run_id="r", mode="mor")
    assert r1["status"] == "applied"
    r2 = apply_stream_batch(events, epoch_id=7, table=table, run_id="r", mode="mor")
    assert r2["status"] == "skipped"
    assert table.current_snapshot().snapshot_id == r1["snapshot_id"]


def test_stream_windowed_op_counts_with_watermark(spark, tmp_path, fixture_meta):
    stream = event_log_stream(spark, _glob(fixture_meta), max_files_per_trigger=1)
    assert stream.isStreaming
    # fixture timestamps advance 1 ms per LSN -> the log spans ~15 s of
    # event time; 5 s windows + 1 s watermark close at least the first
    # windows by end-of-stream
    agg = stream_windowed_op_counts(stream, window="5 seconds", watermark="1 second")
    q = (
        agg.writeStream.format("memory")
        .queryName("op_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT op, SUM(n_events) AS n FROM op_counts GROUP BY op"
    ).toPandas()
    # append mode emits only watermark-closed windows; the final window
    # stays open, so totals are a lower bound over a subset of ops
    assert len(got) > 0
    assert set(got["op"]) <= {"insert", "update", "delete"}
    assert (got["n"] > 0).all()


def test_stateful_lww_changelog_converges_to_oracle(spark, tmp_path, fixture_meta, oracle_state):
    """applyInPandasWithState keyed LWW: the last changelog row per key
    must equal the batch oracle's final state (alive keys), with deleted
    keys tombstoned (alive=false)."""
    from astro_data_pipeline_spark.streaming import (
        event_log_stream,
        stateful_current_state_changelog,
    )

    stream = event_log_stream(spark, _glob(fixture_meta), max_files_per_trigger=1)
    changelog = stateful_current_state_changelog(stream)
    q = (
        changelog.writeStream.format("memory")
        .queryName("lww_changelog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM lww_changelog").toPandas()
    assert len(emitted) > 0
    # last emission per key = current state (emissions are strictly
    # LSN-increasing per key)
    # NB: groupby().last() would skip NaN per column and resurrect stale
    # payload values into tombstone rows — take whole rows instead
    last = emitted.sort_values("last_lsn").drop_duplicates(
        subset=["repo", "path"], keep="last"
    )
    alive = (
        last[last["alive"]][["repo", "path", "commit", "lang", "lang_meta",
                             "content_sha256", "last_lsn"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    alive["lang_meta"] = alive["lang_meta"].where(pd.notna(alive["lang_meta"]), None)
    want = oracle_state[FINAL_COLS].reset_index(drop=True)
    want = want.assign(lang_meta=want["lang_meta"].where(pd.notna(want["lang_meta"]), None))
    pd.testing.assert_frame_equal(alive[FINAL_COLS], want, check_dtype=False)
    # tombstones carry no payload
    dead = last[~last["alive"]]
    assert dead["content_sha256"].isna().all()


def test_streaming_progress_listener_one_row_per_epoch(spark, tmp_path, fixture_meta):
    """The StreamingQueryListener progress surface (reference analog:
    monitor_processing_jobs' 30 s poll loop,
    telescope_data_processing.py:210-293) must record exactly one
    progress row per applied epoch, with input-row counts that sum to
    the log size."""
    from astro_data_pipeline_spark.streaming.progress import recording_listener

    table = _new_table(spark, tmp_path)
    with recording_listener(spark) as rec:
        reports = stream_replay_available_now(
            spark,
            _glob(fixture_meta),
            table,
            checkpoint_dir=str(tmp_path / "ckpt"),
            run_id="progress-test",
        )
        n_epochs = len(reports)
        progress = rec.wait_for(n_epochs)
    applied = [p for p in progress if p["num_input_rows"] > 0]
    assert len(applied) == n_epochs, progress
    epochs = [p["epoch"] for p in applied]
    assert len(set(epochs)) == len(epochs)  # one row per epoch
    total_rows = sum(p["num_input_rows"] for p in applied)
    assert total_rows == fixture_meta["n_events"]
    assert all("triggerExecution" in p["duration_ms"] for p in applied)
