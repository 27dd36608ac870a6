"""Property-style replay invariance tests (SURVEY.md §5 "we add
randomized op-mix event logs").

Properties checked over randomized change logs (different seeds => very
different op mixes, dup rates, skew bursts):

  P1  replay(log) == pandas-oracle(log)            (correctness)
  P2  replay(log) == replay(physically-permuted log)  (order independence:
      only LSN order is semantic; file/row order is not)
  P3  replay with k batches == replay with 1 batch  (batch-slicing
      independence — micro-batch boundaries are physical, not logical)
  P4  kill after a seed-chosen batch + resume (new run id, compaction
      between) == straight replay  (exactly-once is restart-point- and
      maintenance-invariant, not just true at the one point the
      engine-core test picks)
  P5  copy-on-write mode == merge-on-read mode  (the storage strategy
      is a physical choice; the committed state is identical)
"""

from __future__ import annotations

import pandas as pd
import pytest

from astro_data_pipeline_spark.cdc import apply as A
from astro_data_pipeline_spark.cdc.fixtures import generate_change_log, load_events_pandas
from astro_data_pipeline_spark.cdc.oracle import replay_reference
from astro_data_pipeline_spark.cdc.runner import CdcRunner, KilledError, read_event_log
from astro_data_pipeline_spark.lakehouse import LakeTable
from pyspark.sql import types as T

FINAL_COLS = ["repo", "path", "commit", "lang", "lang_meta", "content_sha256", "last_lsn"]


def _replay(
    spark,
    tmp_path,
    meta,
    name: str,
    n_batches: int,
    permute: bool = False,
    mode: str = "mor",
    kill_after: int | None = None,
):
    table = LakeTable.create(
        spark,
        str(tmp_path / name),
        T.StructType(A.BASE_TABLE_FIELDS),
        key_cols=A.KEY_COLS,
        n_buckets=4,
    )
    events = read_event_log(spark, meta["v1_path"], meta["v2_path"])
    if permute:
        # physical permutation that preserves nothing but the rows
        # themselves: round-trip through a hash-ordered repartition
        from pyspark.sql import functions as F

        events = events.repartition(7, F.xxhash64("lsn", "repo"))
    if kill_after is not None:
        with pytest.raises(KilledError):
            CdcRunner(spark, table, run_id=f"prop-{name}-a", mode=mode).replay(
                events, n_batches=n_batches, fail_after=kill_after
            )
        assert len(table.committed_batch_ids()) == kill_after
        if mode == "mor":
            # background maintenance between the crash and the resume
            # must not change what the resume skips or applies
            table.compact()
        CdcRunner(spark, table, run_id=f"prop-{name}-b", mode=mode).replay(
            events, n_batches=n_batches
        )
    else:
        CdcRunner(spark, table, run_id=f"prop-{name}", mode=mode).replay(
            events, n_batches=n_batches
        )
    pdf = table.read().toPandas()
    for c in FINAL_COLS:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[FINAL_COLS].sort_values(["repo", "path"]).reset_index(drop=True)
    pdf["lang_meta"] = pdf["lang_meta"].where(pd.notna(pdf["lang_meta"]), None)
    return pdf


@pytest.mark.parametrize("seed", [7, 1234, 999983])
def test_replay_properties_random_logs(spark, tmp_path, seed):
    meta = generate_change_log(
        str(tmp_path / "log"),
        n_repos=8,
        n_keys=120,
        n_events=900,
        seed=seed,
    )
    oracle = replay_reference(load_events_pandas(meta))
    want = oracle[FINAL_COLS].copy()
    want["lang_meta"] = want["lang_meta"].where(pd.notna(want["lang_meta"]), None)
    want = want.reset_index(drop=True)

    got = _replay(spark, tmp_path, meta, f"base{seed}", n_batches=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)  # P1

    got_perm = _replay(spark, tmp_path, meta, f"perm{seed}", n_batches=3, permute=True)
    pd.testing.assert_frame_equal(got_perm, want, check_dtype=False)  # P2

    got_one = _replay(spark, tmp_path, meta, f"one{seed}", n_batches=1)
    pd.testing.assert_frame_equal(got_one, want, check_dtype=False)  # P3

    # P4: seed-chosen restart point (1..4 of 5 batches), compaction
    # between crash and resume
    kill_after = 1 + seed % 4
    got_resumed = _replay(
        spark, tmp_path, meta, f"res{seed}", n_batches=5, kill_after=kill_after
    )
    pd.testing.assert_frame_equal(got_resumed, want, check_dtype=False)

    got_cow = _replay(spark, tmp_path, meta, f"cow{seed}", n_batches=3, mode="cow")
    pd.testing.assert_frame_equal(got_cow, want, check_dtype=False)  # P5
