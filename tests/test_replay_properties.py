"""Property-style replay invariance tests (SURVEY.md §5 "we add
randomized op-mix event logs").

Properties checked over randomized change logs (different seeds => very
different op mixes, dup rates, skew bursts):

  P1  replay(log) == pandas-oracle(log)            (correctness)
  P2  replay(log) == replay(physically-permuted log)  (order independence:
      only LSN order is semantic; file/row order is not)
  P3  replay with k batches == replay with 1 batch  (batch-slicing
      independence — micro-batch boundaries are physical, not logical)
"""

from __future__ import annotations

import pandas as pd
import pytest

from astro_data_pipeline_spark.cdc import apply as A
from astro_data_pipeline_spark.cdc.fixtures import generate_change_log, load_events_pandas
from astro_data_pipeline_spark.cdc.oracle import replay_reference
from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
from astro_data_pipeline_spark.lakehouse import LakeTable
from pyspark.sql import types as T

FINAL_COLS = ["repo", "path", "commit", "lang", "lang_meta", "content_sha256", "last_lsn"]


def _replay(spark, tmp_path, meta, name: str, n_batches: int, permute: bool = False):
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
    CdcRunner(spark, table, run_id=f"prop-{name}", mode="mor").replay(
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
