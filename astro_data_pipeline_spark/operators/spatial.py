"""Spatial / non-equi range join operators (SURVEY.md §2.3 J3, J4).

The reference leans on PostGIS for its spatial theta-join
(``ST_DWithin(ao.position, obs.pointing, radius)`` —
db_performance_test.py:217-223 — backed by a GIST index,
V1__Create_astronomical_catalog_schema.sql:281-282). Catalyst has no
spatial strategy and no index, so the Spark-first restatement is the
classic grid-bucket decomposition:

1. assign every point to a coarse grid cell of side ``r`` (the search
   radius) — a pure column derivation, no UDF;
2. explode one side to its 3×3 neighbor-cell stencil — any pair within
   ``r`` must fall in adjacent cells, so the stencil equi-join has
   perfect recall;
3. equi-join on the cell (hash join — shuffle on the cell key, prunes
   the O(n²) pair space to co-located cells);
4. refine with the exact distance predicate.

Each candidate pair is produced exactly once (a point has ONE home
cell; the 9 stencil offsets are distinct), so no post-join dedup is
needed. At 10^10 rows this is one shuffle on a well-distributed key;
hot cells (dense sky regions) are bounded by cell size and can be
salted exactly like hot repos in the CDC path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

RADIUS = 0.05


@query(
    "join_range_within_radius",
    oracle=f"""
    SELECT a.vec_id AS probe_id, b.vec_id AS match_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        < {RADIUS} * {RADIUS}
    """,
)
def join_range_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 spatial theta-join via grid-bucket + refine (reference:
    ST_DWithin join db_performance_test.py:217-223). Points are the
    first two embedding dims; emits all unordered pairs closer than
    RADIUS. The oracle is the naive O(n²) cross join — same predicate,
    identical double arithmetic, so the match is exact."""
    return (
        _candidate_pairs(spark, sf_dir)
        .filter(F.col("probe_id") < F.col("match_id"))
        .select("probe_id", "match_id")
    )


@query(
    "join_nearest_neighbor_within_radius",
    oracle=f"""
    SELECT probe_id, match_id, round(dist2, 9) AS dist2_r
    FROM (
      SELECT a.vec_id AS probe_id, b.vec_id AS match_id,
             (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
           * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
           + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
           * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE)) AS dist2,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
                      * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
                      + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
                      * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE)),
                      b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
          * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
          + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
          * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
          < {RADIUS} * {RADIUS}
    ) WHERE rn = 1
    """,
)
def join_nearest_neighbor_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 nearest-neighbour cross-match: for each probe point the single
    closest other point within RADIUS (reference: findNearestObject
    CatalogService.java:105-130 — ORDER BY separation LIMIT 1 per probe,
    AstronomicalObjectRepository.java:217-236). Grid-bucket candidates,
    then the W1 top-1-per-group window — the exact LWW primitive."""
    from pyspark.sql import Window

    pairs = _candidate_pairs(spark, sf_dir)
    w = Window.partitionBy("probe_id").orderBy("dist2", "match_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "match_id", F.round("dist2", 9).alias("dist2_r"))
    )


def _candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed candidate pairs (both directions) within RADIUS, grid-pruned."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    ).withColumns(
        {
            "cx": F.floor(F.col("x") / RADIUS).cast("long"),
            "cy": F.floor(F.col("y") / RADIUS).cast("long"),
        }
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dx).cast("long").alias("dx"),
                    F.lit(dy).cast("long").alias("dy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    a = pts.select(
        F.col("vec_id").alias("probe_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "probe_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("vec_id").alias("match_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    return (
        a.join(b, on=["jx", "jy"])
        .filter(
            (F.col("probe_id") != F.col("match_id"))
            & (dx * dx + dy * dy < F.lit(RADIUS * RADIUS))
        )
        .select("probe_id", "match_id", (dx * dx + dy * dy).alias("dist2"))
    )
