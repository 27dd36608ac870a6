"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC last-writer-wins query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator from
astro_data_pipeline_spark (SURVEY.md §2 coverage) for the driver's
DuckDB-oracle correctness gate.

Gate ordering: round-1 recorded correctness rows for exactly the first
50 entries of this dict (in iteration order) — a driver-side cap. The
dicts returned here are therefore ordered by evidence priority, not by
module: queries with no prior driver row (the round-1-dark LLM-pipeline
set), new queries, and queries whose implementation changed this round
come FIRST; queries that are byte-identical to their round-1-green
implementation come last, since their `CORRECTNESS_r01.json` rows remain
valid evidence. The union of per-round driver records covers the full
registry; local pytest (`tests/test_queries_vs_oracle.py`) additionally
checks every oracled query each run.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astro_data_pipeline_spark import registry

# Round-4 gate order (VERDICT_r03 "Next round" items 1 and 4). The
# first 50 names are exactly the queries whose latest driver row is
# missing, stale (implementation changed this round), or oldest
# (r1-latest); everything past the window has a green r2/r3 row on
# code unchanged since, which remains valid evidence. After this round
# every query's latest green row is ≤2 rounds old: the 8 changed + 3
# new queries get r4 rows, all 32 r1-latest names get r4 rows, 7 of
# the r2-latest names refresh to r4, and the remaining r2/r3-latest
# rows are at most two rounds old by construction.
#   1. changed THIS round (their old rows are rows of old code):
#      scalar_coordinate_transforms (tie-free floor rounding + signed-
#      zero normalization — the r3 FAIL's fix, kept first per the
#      verdict), scalar_photometric_calibration (same rounding sweep),
#      the three imaging queries re-scoped onto the golden-sample
#      oracle, img_quality_ranking (new name carrying the old
#      full-catalog workload, rows-only), sim_ivf_topk_cell_search
#      (fitted k-means centroids) + the new multiprobe and
#      split-leakage queries, grouped_series_stats_per_user (tie-free
#      kernel rounding) and dedup_incremental_index (oracle corrected
#      to derive canonical ids relationally).
#   2. all 32 r1-latest names — the verdict's rotation directive: no
#      query's latest evidence may stay 3 rounds old.
#   3. 7 r2-latest refreshes, most central first (tpch_q3, the WAL
#      source, the dedup trio, LSH census, FITS roundtrip) — the
#      standing rotation.
_GATE_PRIORITY = [
    # -- 1. changed this round -------------------------------------------
    "scalar_coordinate_transforms",
    "scalar_photometric_calibration",
    "img_quality_scores",
    "img_calibration_pipeline",
    "img_cosmic_ray_stats",
    "img_quality_ranking",
    "sim_ivf_topk_cell_search",
    "sim_ivf_multiprobe_topk",
    "sample_split_leakage_pairs",
    "grouped_series_stats_per_user",
    "dedup_incremental_index",
    # -- 2. r1-latest rotation (all of them) -----------------------------
    "tpch_q1_pricing_summary",
    "join_left_outer_order_counts",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "agg_conditional_count_pivot",
    "agg_cube_status_priority",
    "agg_duplicate_key_detection",
    "agg_global_catalog_stats",
    "agg_histogram_value_bins",
    "agg_quality_score_compound",
    "agg_rollup_status_priority",
    "agg_weighted_mean_per_group",
    "window_top1_order_per_customer",
    "window_scd2_intervals",
    "window_lag_order_gap_seconds",
    "window_running_spend_per_customer",
    "window_topk_parts_per_brand",
    "sort_topk_global_orders",
    "filter_null_and_validity_audit",
    "filter_time_window_recent_events",
    "filter_validate_split_documents",
    "project_derived_partition_key",
    "route_events_by_type",
    "scalar_astro_math_functions",
    "scalar_datetime_functions",
    "scalar_json_extract_props",
    "scalar_sha256_documents",
    "scalar_string_path_functions",
    "setop_except_lapsed_customers",
    "setop_intersect_retained_customers",
    "union_split_reconcile",
    "dedup_exact_by_sha",
    # -- 3. r2-latest refresh rotation (10 most central) -----------------
    "tpch_q3_shipping_priority",
    "cdc_json_wal_source",
    "dedup_jaccard_shingle_pairs",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_hamming_buckets",
    "sim_ann_lsh_bucket_census",
    # imaging module changed this round; this query's body did not, but
    # it shares the catalog/kernel plumbing — cheap insurance re-gate
    "img_fits_header_roundtrip",
]


def _gate_order(names) -> list[str]:
    prio = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    return sorted(names, key=lambda n: (prio.get(n, len(prio)), n))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC last-writer-wins
    current state per key (the engine's signature primitive)."""
    return registry.get("cdc_lww_current_state").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in gate
    order (see module docstring)."""
    qs = registry.all_queries()
    return {n: qs[n] for n in _gate_order(qs)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check),
    ordered identically to ``queries()``."""
    os_ = registry.all_oracles()
    return {n: os_[n] for n in _gate_order(os_)}
