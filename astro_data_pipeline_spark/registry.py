"""Query registry: the engine's public query surface.

Every implemented operator from SURVEY.md §2 registers here as
``(name, spark_fn, oracle_sql)``. ``spark_fn(spark, sf_dir) -> DataFrame``
is the Spark-first implementation; ``oracle_sql`` is the equivalent ANSI
SQL the driver runs on DuckDB over the same parquet tables. Non-SQL-
expressible operators register with ``oracle_sql=None`` (driver records a
rows-only check).

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (driver sorts columns by name before
hashing). Float aggregates are rounded on BOTH sides to dodge
summation-order ULP drift between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None = None
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a query implementation (and its DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        # loud, not last-wins: a name collision would silently replace an
        # earlier query (and its oracle) on the driver's gate surface
        prev = _REGISTRY.get(name)
        if prev is not None and prev.fn is not fn:
            raise ValueError(
                f"duplicate query registration {name!r}: "
                f"{prev.fn.__module__}.{prev.fn.__qualname__} vs "
                f"{fn.__module__}.{fn.__qualname__}"
            )
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {n: d.fn for n, d in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: d.oracle for n, d in _REGISTRY.items() if d.oracle is not None}


def get(name: str) -> QueryDef:
    _ensure_loaded()
    return _REGISTRY[name]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import relational, windows, joins, aggregations, spatial  # noqa: F401
    from .cdc import queries as cdc_queries  # noqa: F401
    from .textops import dedup, similarity, quality, cluster, sampling, chunking  # noqa: F401
    from .multimodal import binary, imaging  # noqa: F401
    from .operators import grouped_analytics  # noqa: F401
    from .pipelines import quality, research, telescope  # noqa: F401

    _LOADED = True
