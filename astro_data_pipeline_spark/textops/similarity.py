"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline; a deterministic
random-hyperplane LSH bucketing as the scale path (candidates within a
bucket only). Vector math is pure ``F.zip_with`` / ``F.aggregate`` — JVM
expression trees, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_TOP_K = 3
_N_PROBES = 5


def _cosine(a, b) -> F.Column:
    """Cosine similarity between two array<double> columns (JVM-side)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


@query(
    "sim_cosine_topk_bruteforce",
    oracle=f"""
    SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY round(list_cosine_similarity(
                                CAST(p.embedding AS DOUBLE[]),
                                CAST(n.embedding AS DOUBLE[])), 4) DESC,
                            n.vec_id) AS rn
        FROM embeddings p JOIN embeddings n ON n.vec_id <> p.vec_id
        WHERE p.vec_id < {_N_PROBES}
    ) WHERE rn <= {_TOP_K}
    """,
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: K probe vectors broadcast against the
    full corpus, per-probe heap via row_number. At cluster scale the
    probes stay broadcast and the corpus scan is embarrassingly parallel —
    the canonical exact-ANN baseline. Similarity is rounded to 4 dp
    *before* ranking on both sides so float32 summation-order ULP drift
    can't flip ranks between engines; vec_id breaks the (now coarser)
    ties deterministically."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    pairs = emb.crossJoin(F.broadcast(probes)).filter(F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("probe_emb"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("probe_id", "neighbor_id", F.col("rn").cast("int").alias("rank"))
    )


_N_PLANES = 8


def lsh_bucket_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → LSH bucket via deterministic random hyperplanes.

    Plane j's d-th coordinate is ±1 derived from xxhash64(j, d) parity —
    reproducible across runs/executors with zero driver state to ship.
    sign(v·p_j) bits pack into an int bucket id."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = 64
    bits = []
    for j in range(_N_PLANES):
        # ±1 pseudo-plane: parity of xxhash64(j, d)
        plane = F.array(
            *[
                (F.pmod(F.xxhash64(F.lit(j), F.lit(d)), F.lit(2)) * 2 - 1).cast("double")
                for d in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", bucket.cast("int").alias("bucket"))


@query("sim_ann_lsh_bucket_census")  # hash-derived buckets → rows-only check
def sim_ann_lsh_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket census. Query-time ANN
    probes only its own bucket (corpus/2^planes of the data); pytest
    checks recall of bucketed search vs the brute-force baseline."""
    assignments = lsh_bucket_assignments(spark, sf_dir)
    return assignments.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )
