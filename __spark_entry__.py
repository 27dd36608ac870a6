"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC last-writer-wins query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator from
astro_data_pipeline_spark (SURVEY.md §2 coverage) for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astro_data_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC last-writer-wins
    current state per key (the engine's signature primitive)."""
    return registry.get("cdc_lww_current_state").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return registry.all_oracles()
