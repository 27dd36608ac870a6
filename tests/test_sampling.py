"""Semantics + plan-shape tests for the sampling/decontamination ops.

The DuckDB value comparison runs in test_queries_vs_oracle; here we pin
the properties the oracle can't express: split stability, mixture
balance, contamination non-triviality, and the shuffle-free plan shapes
that make these ops viable at 10^10 documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_data_pipeline_spark import registry
from astro_data_pipeline_spark.textops.sampling import _BENCH_MOD

from .test_plans import plan

SF = "/root/testdata/sf0.01"


def test_hash_split_is_stable_and_proportional(spark):
    q = registry.get("sample_hash_split_assignments").fn
    a = {r["doc_id"]: r["split"] for r in q(spark, SF).collect()}
    b = {r["doc_id"]: r["split"] for r in q(spark, SF).collect()}
    assert a == b  # deterministic across runs
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    # 90% +- generous tolerance at n=500
    assert 0.8 * n <= train <= 0.97 * n, train


def test_hash_split_plan_has_no_shuffle(spark):
    df = registry.get("sample_hash_split_assignments").fn(spark, SF)
    assert "Exchange" not in plan(df, "simple")


def test_balanced_mixture_evens_strata(spark):
    df = registry.get("sample_balanced_mixture").fn(spark, SF)
    got = {r["lang"]: r["cnt"] for r in df.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    orig = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    rarest = min(orig.values())
    # every stratum lands within hash-sampling noise of the rarest count
    for lang, cnt in got.items():
        assert cnt <= orig[lang]
        assert abs(cnt - rarest) <= max(8, int(0.35 * rarest)), (lang, cnt, rarest)


def test_balanced_mixture_corpus_side_never_shuffles(spark):
    """Counts aggregate + broadcast back: the documents scan that feeds
    the output must reach the filter without an Exchange. The only
    exchanges allowed are on the tiny counts branch."""
    df = registry.get("sample_balanced_mixture").fn(spark, SF)
    p = plan(df, "formatted")
    # the rates side arrives via broadcast
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    # no sort-merge join: that would shuffle the corpus on lang (skewed)
    assert "SortMergeJoin" not in p


def test_contamination_flags_known_overlap(spark):
    rows = registry.get("text_benchmark_contamination").fn(spark, SF).collect()
    assert len(rows) > 0  # fixture engineered to have cross-set n-grams
    for r in rows:
        assert r["doc_id"] % _BENCH_MOD != 0  # benchmark docs never flagged
        assert 0 < r["n_hit_ngrams"] <= r["n_ngrams"]
        assert 0 < r["contamination_ratio"] <= 1.0


def test_contamination_benchmark_side_broadcasts(spark):
    df = registry.get("text_benchmark_contamination").fn(spark, SF)
    assert "BroadcastHashJoin" in plan(df, "simple")


def test_ngrams_empty_for_short_docs(spark):
    """Docs shorter than the n-gram length must yield ZERO n-grams —
    Spark's sequence() runs descending when start > stop, so a naive
    greatest(hi, -1) guard silently emits partial grams."""
    import pandas as pd

    from astro_data_pipeline_spark.textops.sampling import _NGRAM_LEN, _ngrams

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "one two",  # < _NGRAM_LEN tokens
                    " ".join(f"t{i}" for i in range(_NGRAM_LEN)),  # exactly
                    " ".join(f"t{i}" for i in range(_NGRAM_LEN + 2)),
                ],
            }
        )
    )
    got = _ngrams(docs).groupBy("doc_id").count().toPandas()
    cnt = dict(zip(got["doc_id"], got["count"]))
    assert 1 not in cnt
    assert cnt[2] == 1
    assert cnt[3] == 3


def test_split_contamination_rate_consistent_with_pairs(spark, sf_dir):
    """The rollup must be EXACTLY the pairs query rolled up: recompute
    n_leaked_docs and the rate from the pairs DataFrame in-test and
    compare row-for-row (the shared-CTE oracle guards the DuckDB side;
    this guards the Spark side against the two queries drifting)."""
    from astro_data_pipeline_spark import registry

    pairs = registry.get("sample_split_leakage_pairs").fn(spark, sf_dir).toPandas()
    roll = (
        registry.get("sample_split_contamination_rate")
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("split")
        .sort_index()
    )
    splits = (
        registry.get("sample_hash_split_assignments")
        .fn(spark, sf_dir)
        .toPandas()
    )
    import math

    totals = splits.groupby("split").size()
    leaked: dict[str, set] = {}
    for r in pairs.itertuples():
        leaked.setdefault(r.split_a, set()).add(r.doc_a)
        leaked.setdefault(r.split_b, set()).add(r.doc_b)
    assert set(roll.index) == set(totals.index)
    for split, n_docs in totals.items():
        row = roll.loc[split]
        n_leak = len(leaked.get(split, set()))
        assert row["n_docs"] == n_docs
        assert row["n_leaked_docs"] == n_leak
        expect = math.floor(n_leak / float(n_docs) * 1e6 + 0.5) / 1e6
        assert row["contamination_rate"] == expect, (split, row, expect)
