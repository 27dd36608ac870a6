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

# The first 50 names are exactly the queries whose latest driver row
# is missing, stale (implementation changed this round), or oldest;
# everything past the window has a green row ≤2 rounds old on code
# unchanged since, which remains valid evidence (verified mechanically
# each round by replaying the CORRECTNESS_r*.json union).
_GATE_PRIORITY = [
    # Round-5 gate order (VERDICT_r04 "Next round" #6): after this round
    # r3∪r4∪r5 must cover all queries with nothing older than r3. The 50
    # slots: (1) the 11 queries changed or added this round, (2) all 20
    # remaining r2-latest names (their rows would otherwise age to 3
    # rounds), (3) 19 r3-latest refreshes, most central first.
    # -- 1. changed/added this round --------------------------------------
    "grouped_periodogram_peak",       # new golden-sample oracle
    "agg_approx_distinct_users",      # tolerance-band oracle, new columns
    "img_quality_ranking",            # re-scoped to oracled golden ranks
    "sample_split_contamination_rate",  # new rollup query
    "sample_split_leakage_pairs",     # oracle refactored into shared CTEs
    "sim_ivf_sqrtn_multiprobe_topk",  # new √n operating point
    "sim_ivf_topk_cell_search",       # fit/oracle helpers parameterized
    "sim_ivf_multiprobe_topk",        # body extracted to shared helper
    "grouped_series_stats_per_user",  # exact-µs interval kernel fix
    "dedup_duplicate_passage_fraction",  # new passage-level dedup gate
    "text_boilerplate_passages",      # new boilerplate census (shared CTEs)
    # -- 2. r2-latest rotation (all 20 remaining) -------------------------
    "agg_doclen_percentiles",
    "mm_decode_feature_stub",
    "mm_frame_sample_plan",
    "mm_media_metadata_stats",
    "sample_balanced_mixture",
    "sample_hash_split_assignments",
    "sample_pack_sequences",
    "sample_token_budget_per_source",
    "sim_cosine_topk_bruteforce",
    "sort_keyset_pagination_page3",
    "text_benchmark_contamination",
    "text_chunk_sliding_windows",
    "text_document_fingerprint",
    "text_langid_heuristic",
    "text_pii_redaction",
    "text_quality_filter_verdict",
    "text_quality_scores",
    "text_repetition_filter",
    "text_token_count_bpe_ish",
    "text_winnowing_fingerprints",
    # -- 3. r3-latest refresh rotation (19 most central) ------------------
    "cdc_lww_current_state",
    "cdc_replay_end_to_end",
    "cdc_conditional_merge",
    "cdc_row_level_ops",
    "cdc_salted_lww",
    "cdc_resume_from_checkpoint",
    "cdc_schema_evolution_audit",
    "cdc_incremental_matview",
    "cdc_incremental_changes",
    "cdc_time_travel_read",
    "cdc_streaming_replay_end_to_end",
    "cdc_streaming_stateful_changelog",
    "cdc_changelog_stream_source",
    "tpch_q5_local_supplier_volume",
    "join_three_way_nation_revenue",  # r4 watch item: re-gate + re-time
    "join_fact_dim_revenue_by_brand",
    "join_asof_last_click_before_purchase",
    "dedup_incremental_lsh",
    "dedup_embedding_cosine_pairs",
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
