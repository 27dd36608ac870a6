"""Duplicate-cluster resolution: connected components over near-dup edges.

Pair mining (exact-sha groups, shingle-Jaccard, MinHash/LSH) yields EDGES;
an actual dedup pass needs CLUSTERS — the transitive closure of those
edges — so each group keeps exactly one canonical document even when
A~B and B~C but A!~C. This module closes that gap with a distributed
connected-components operator and registers the end-to-end
pairs -> components -> canonical-doc query.

Reference analog: the candidate-match -> canonical-record collapse of the
reference's catalog cross-match flow (object dedup on repeated
observations, application/catalog-service AstronomicalObjectService
nearest-match upsert); restated here over the documents table, which is
where a training-data pipeline runs it.

Scale design: min-label propagation (hash-to-min). Each round is one
shuffle join (labels into the symmetrized edge list) plus one groupBy
min — both key-partitioned on node id, no broadcast of anything
unbounded, lineage truncated per round with materialize_barrier (localCheckpoint
locally; reliable checkpoint under spark.adps.checkpoint.mode=reliable)
so the plan stays O(1) deep. Rounds needed = graph diameter. Dedup graphs are
near-clique clusters (diameter 2-3 in practice), so this converges in a
handful of rounds at any corpus size; for adversarially long chains the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond") bounds rounds at O(log^2 n) — the
per-round plan here is the small-star half of that algorithm, so the
swap is local if a corpus ever needs it. Convergence is detected with a
driver-side count of changed labels (a scalar aggregate, not a collect
of data rows) and guarded by ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import sha256_arrow
from ..registry import query
from ..session import materialize_barrier
from ..sources import load_table
from .dedup import _DF_CAP, _JACCARD_MIN, _SHINGLE_SQL, dedup_jaccard_shingle_pairs


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Distributed connected components by min-label propagation.

    ``edges``: DataFrame with ``src``/``dst`` long columns, undirected
    (either orientation). Returns ``(node, comp)`` where ``comp`` is the
    minimum node id reachable from ``node`` — the component's canonical
    representative. Nodes are taken from the edge set (isolated nodes
    have no edges and trivially form their own singleton component, so
    callers that care about them union them back in).
    """
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialized once; re-read every round instead of recomputing the
    # (possibly expensive) pair-mining lineage
    sym = materialize_barrier(both.distinct(), eager=True)
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        nb = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("nb_node"))
            .agg(F.min("comp").alias("nb_comp"))
        )
        prop = labels.join(nb, labels["node"] == nb["nb_node"], "left").select(
            "node",
            F.col("comp").alias("prev"),
            F.least(F.col("comp"), F.coalesce("nb_comp", "comp")).alias("comp"),
        )
        # pointer jumping: follow comp -> comp(comp), halving every
        # label-chain each round — convergence in O(log diameter) rounds
        # instead of O(diameter), so a 25-version edit chain (a path
        # graph) no longer exhausts max_iter while plain propagation is
        # still walking it one hop per round
        jump = prop.select(
            F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
        )
        stepped = (
            prop.join(jump, prop["comp"] == jump["jnode"], "left")
            .select(
                "node",
                "prev",
                F.least(F.col("comp"), F.coalesce("jcomp", "comp")).alias("comp"),
            )
            .transform(lambda d: materialize_barrier(d, eager=True))
        )
        changed = stepped.filter(F.col("comp") < F.col("prev")).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(covers graph diameter ~2^{max_iter} with pointer jumping); "
        "the component structure is pathological for a dedup corpus"
    )


def duplicate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup edge list over documents: exact-sha star edges
    (each doc -> its group's min doc_id) unioned with shingle-Jaccard
    pairs at the module threshold. Star edges and clique edges induce the
    same components; the star form shuffles O(n) rows, never O(group^2)."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", sha256_arrow(F.col("text")).alias("sha")
    )
    star = hashed.withColumn("src", F.min("doc_id").over(Window.partitionBy("sha")))
    exact = star.filter(F.col("src") != F.col("doc_id")).select(
        "src", F.col("doc_id").alias("dst")
    )
    jac = dedup_jaccard_shingle_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return exact.unionByName(jac)


_CLUSTER_SQL = f"""
    WITH RECURSIVE
    sh AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {_DF_CAP}),
    posting AS (SELECT s.doc_id, s.shingle FROM sh s JOIN rare r USING (shingle)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT i.doc_a AS src, i.doc_b AS dst
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) >= {_JACCARD_MIN}
    ),
    hashed AS (
        SELECT doc_id, sha256(text) AS sha FROM documents WHERE text IS NOT NULL
    ),
    exact AS (
        SELECT src, dst FROM (
            SELECT min(doc_id) OVER (PARTITION BY sha) AS src, doc_id AS dst
            FROM hashed
        ) WHERE src <> dst
    ),
    e0 AS (SELECT src, dst FROM exact UNION SELECT src, dst FROM jac),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    walk(origin, reached) AS (
        SELECT src, src FROM edges
        UNION
        SELECT w.origin, e.dst FROM walk w JOIN edges e ON e.src = w.reached
    ),
    labels AS (
        SELECT origin AS doc_id, min(reached) AS canonical_doc_id
        FROM walk GROUP BY 1
    )
    SELECT doc_id, canonical_doc_id,
           count(*) OVER (PARTITION BY canonical_doc_id) AS cluster_size
    FROM labels
"""


@query("dedup_duplicate_clusters", oracle=_CLUSTER_SQL)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end duplicate clustering: exact-sha + Jaccard edges ->
    connected components -> (doc_id, canonical_doc_id, cluster_size) for
    every document in a duplicate cluster (size >= 2). The canonical doc
    is the component-min doc_id — the row a dedup pass would keep. The
    DuckDB oracle computes the identical transitive closure with a
    recursive CTE."""
    labels = connected_components(duplicate_edges(spark, sf_dir))
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("canonical_doc_id")
    )
    return out.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("canonical_doc_id"))
    )


_REP_SQL = f"""
    WITH comp AS ({_CLUSTER_SQL}),
    scored AS (
        SELECT c.canonical_doc_id, c.doc_id, c.cluster_size, d.n_chars,
               row_number() OVER (
                   PARTITION BY c.canonical_doc_id
                   ORDER BY d.n_chars DESC, c.doc_id) AS rn,
               sum(d.n_chars) OVER (
                   PARTITION BY c.canonical_doc_id) AS total_chars
        FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT canonical_doc_id AS cluster_id,
           doc_id AS rep_doc_id,
           n_chars AS rep_n_chars,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(total_chars AS BIGINT) AS total_chars
    FROM scored WHERE rn = 1
"""


@query("dedup_cluster_representatives", oracle=_REP_SQL)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection after clustering: for every duplicate
    cluster keep the single document a dedup pass would retain — the
    longest member (max n_chars, ties to the smallest doc_id), with the
    cluster's size and total character mass for shrinkage accounting.
    This is the second half of real near-dup dedup: pairs -> clusters ->
    ONE canonical row per cluster (the reference's repeated-observation
    collapse keeps the best-quality observation the same way).

    Scale shape: clusters join to the documents table on doc_id for
    n_chars only (column-pruned probe; text never moves), then one
    per-cluster top-1 window over cluster-sized groups — bounded
    partitions, no global ordering anywhere."""
    clusters = dedup_duplicate_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scored = clusters.join(docs, "doc_id")
    wrank = Window.partitionBy("canonical_doc_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wsum = Window.partitionBy("canonical_doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(wrank))
        .withColumn("total_chars", F.sum("n_chars").over(wsum))
        .filter(F.col("rn") == 1)
        .select(
            F.col("canonical_doc_id").alias("cluster_id"),
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("total_chars").cast("long").alias("total_chars"),
        )
    )
