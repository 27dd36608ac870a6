"""Corpus sampling + decontamination operators for training-data pipelines.

Three operators a large-scale pretraining pipeline runs constantly:

- deterministic hash-split (train/val/test assignment that is stable
  across reruns and machines — no randomness, no state),
- data-mixture balancing (downsample every stratum to the rarest
  stratum's share via a per-stratum keep-rate, applied as a hash
  threshold so the pass is a pure map — NO shuffle of the corpus),
- benchmark decontamination (flag documents sharing long word n-grams
  with an evaluation/benchmark set — the standard n-gram-overlap
  contamination check).

All three are deterministic and expressed identically in the DuckDB
oracle. The shared uniform hash is the first 8 hex chars of
``md5(cast(doc_id as string))`` read as a u32 — portable between Spark
(`conv(substring(md5(x),1,8),16,10)`) and DuckDB
(``('0x' || substr(md5(x),1,8))::BIGINT``), uniform in [0, 2^32).

Reference analog: the reference partitions its catalog workload with
deterministic modulo routing (db_performance_test.py batch routing) and
validates staging subsets before promotion; restated here as the
sampling primitives a 10^10-document corpus actually needs.

Scale design: hash-split and mixture sampling are shuffle-free maps
(the only aggregation is a per-stratum count — a few hundred rows —
broadcast back). Decontamination explodes corpus n-grams ONCE and
joins them against a broadcast benchmark n-gram set, so the corpus
never shuffles; cost is O(corpus tokens) map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# u32 in [0, 2^32) from the doc key — identical in Spark and DuckDB.
_U32_MAX = float(2**32)


def _u32(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def _u32_sql(expr: str) -> str:
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"


# --------------------------------------------------------------- split

_TRAIN_HI = int(0.90 * _U32_MAX)
_VAL_HI = int(0.95 * _U32_MAX)


@query(
    "sample_hash_split_assignments",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_u32_sql('doc_id')} < {_TRAIN_HI} THEN 'train'
                WHEN {_u32_sql('doc_id')} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_hash_split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by key hash. Stable
    across reruns, machines, and partitionings (a property random
    splits lack); a pure map — zero shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    u = _u32(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.when(u < F.lit(_TRAIN_HI), "train")
        .when(u < F.lit(_VAL_HI), "val")
        .otherwise("test")
        .alias("split"),
    )


# ------------------------------------------------------------- mixture


@query(
    "sample_balanced_mixture",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
    r AS (SELECT lang, (min(cnt) OVER ()) * 1.0 / cnt AS keep_rate FROM c)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN r USING (lang)
    WHERE {_u32_sql('d.doc_id')} < keep_rate * {_U32_MAX!r}
    """,
)
def sample_balanced_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture balancing: downsample every language stratum to
    (approximately) the rarest language's row count, via per-stratum
    keep-rate applied as a deterministic hash threshold.

    Scale shape: pass 1 aggregates per-lang counts (output = #langs
    rows, trivially small); pass 2 broadcast-joins the rates back and
    filters map-side. The corpus itself NEVER shuffles — the exact
    rank-per-stratum alternative (row_number window per lang) would
    shuffle all 10^10 rows on a skewed key for a marginally tighter
    count. Selection is reproducible: the same doc survives on any
    cluster, any partitioning, any run."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("min_cnt"))
    rates = counts.join(F.broadcast(mn)).select(
        "lang", (F.col("min_cnt") / F.col("cnt")).alias("keep_rate")
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(_u32(F.col("doc_id")) < F.col("keep_rate") * F.lit(_U32_MAX))
        .select("doc_id", "lang", "source")
    )


# ------------------------------------------------------ decontamination

# Long n-grams are the contamination signal (short ones hit boilerplate);
# production corpora use 8-13, sized so a match is vanishingly unlikely by
# chance. The synthetic documents fixture averages ~54 tokens with overlap
# engineered at shingle scale, so 4 is the length at which the check is
# non-trivially exercised here — the plan is length-independent.
# Benchmark membership is synthesized deterministically from the key
# space so the check is self-contained.
_NGRAM_LEN = 4
_BENCH_MOD = 97  # doc_id % 97 == 0 -> "benchmark/eval" document

_NGRAM_SQL = f"""
    SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(tokens) - {_NGRAM_LEN - 1}, 0)),
               i -> array_to_string(tokens[i:i+{_NGRAM_LEN - 1}], ' ')))) AS ngram
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
          FROM documents WHERE text IS NOT NULL)
"""


def _ngram_array(n: int = _NGRAM_LEN) -> F.Column:
    """Distinct n-word n-grams of a `tokens` array column (shared by the
    contamination miner here and the shingle miner in textops.dedup).
    Docs shorter than the n-gram length yield an EMPTY array — the
    guard must be a CASE, not greatest(hi, -1): Spark's `sequence`
    runs DESCENDING when start > stop, so sequence(0, -1) = [0, -1]
    and the transform would emit spurious partial grams."""
    parts = ", ".join(f"tokens[i+{j}]" for j in range(n))
    return F.expr(
        f"""CASE WHEN size(tokens) >= {n}
               THEN array_distinct(transform(
                        sequence(0, size(tokens) - {n}),
                        i -> concat_ws(' ', {parts})))
               ELSE array() END"""
    )


def _ngrams(docs: DataFrame) -> DataFrame:
    """doc_id -> exploded distinct _NGRAM_LEN-word n-grams (codegen array ops)."""
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    )
    return toks.select("doc_id", F.explode(_ngram_array()).alias("ngram"))


@query(
    "text_benchmark_contamination",
    oracle=f"""
    WITH ng AS ({_NGRAM_SQL}),
    bench AS (
        SELECT DISTINCT ngram FROM ng WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corpus AS (
        SELECT doc_id, ngram FROM ng WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM corpus GROUP BY 1),
    hits AS (
        SELECT c.doc_id, count(*) AS n_hit_ngrams
        FROM corpus c JOIN bench b USING (ngram)
        GROUP BY 1
    )
    SELECT h.doc_id, h.n_hit_ngrams, s.n_ngrams,
           round(h.n_hit_ngrams * 1.0 / s.n_ngrams, 4) AS contamination_ratio
    FROM hits h JOIN sizes s USING (doc_id)
    """,
)
def text_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word n-gram with the benchmark/eval set (doc_id % 97 == 0 stands
    in for the external benchmark — deterministic, self-contained).

    Scale shape: benchmark n-grams are small (eval sets are millions of
    rows, not billions) -> broadcast; the corpus side explodes n-grams
    ONCE (the per-doc n-gram total is computed IN-ROW as the distinct
    array's size, not by re-exploding the corpus a second time) and
    probes the broadcast hash map map-side, so the only shuffle is the
    per-doc hit count on (doc_id) — slim rows, after the broadcast join
    has already discarded every non-matching n-gram."""
    docs = load_table(spark, sf_dir, "documents")
    ng = _ngrams(docs)
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = ng.filter(is_bench).select("ngram").distinct()
    # No n_ngrams > 0 filter: the inner join with `hits` already implies
    # >=1 n-gram, and filtering on the aliased heavy expression makes
    # Catalyst push the predicate BELOW the tokens projection, re-inlining
    # split(trim(text)) into every lambda iteration of the n-gram
    # transform (~200 re-splits per row, interpreted — measured 60x).
    sizes = (
        docs.filter(F.col("text").isNotNull() & ~is_bench)
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("tokens"))
        .select("doc_id", F.size(_ngram_array()).alias("n_ngrams"))
    )
    hits = (
        ng.filter(~is_bench)
        .join(F.broadcast(bench), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_hit_ngrams",
        "n_ngrams",
        F.round(F.col("n_hit_ngrams") / F.col("n_ngrams"), 4).alias(
            "contamination_ratio"
        ),
    )


_PACK_BUDGET = 2048  # tokens per training pack
_PACK_SHARDS = 16


@query(
    "sample_pack_sequences",
    oracle=rf"""
    WITH sized AS (
        SELECT doc_id,
               CAST(doc_id % {_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT doc_id, shard, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS offset,
           CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {_PACK_BUDGET} AS BIGINT) AS pack_id
    FROM sized
    """,
)
def sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: assign each document a byte
    offset inside a fixed token budget ({_PACK_BUDGET}/pack) so the
    tokenize-and-concat writer downstream can emit fixed-length training
    examples without a driver-side loop.

    Scale shape: the prefix sum is computed INSIDE a shard (here
    ``doc_id % {_PACK_SHARDS}``; production uses a hash of the grouping
    key) — a partitioned window, never the global-ordered single-task
    window. Shards are independent, so 1000 executors pack 1000 shards
    concurrently; pack_id is the exclusive prefix sum integer-divided by
    the budget, which lets a doc straddle two packs exactly the way the
    concat-then-split tokenizer does."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.filter(F.col("text").isNotNull() & (F.trim("text") != "")).select(
        "doc_id",
        F.pmod("doc_id", F.lit(_PACK_SHARDS)).cast("int").alias("shard"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        offset.cast("long").alias("offset"),
        F.floor(offset / _PACK_BUDGET).cast("long").alias("pack_id"),
    )


# ---------------------------------------------------------- token budget

_SOURCE_TOKEN_BUDGET = 800  # tokens retained per source stratum


@query(
    "sample_token_budget_per_source",
    oracle=rf"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               {_u32_sql('doc_id')} AS h
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    run AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_tokens
        FROM sized
    )
    SELECT doc_id, source, n_tokens, running_tokens
    FROM run WHERE running_tokens <= {_SOURCE_TOKEN_BUDGET}
    """,
)
def sample_token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget subsampling: keep documents per source stratum, in
    deterministic hash order, until the stratum's cumulative token count
    reaches a fixed budget — how a pretraining mixture caps each source
    at an absolute token allocation (budgets are absolute, so the output
    is invariant to corpus growth; rerunning on a bigger crawl keeps the
    SAME prefix of documents plus any budget still unspent).

    Scale shape: the window runs over the slim (doc_id, source,
    n_tokens, hash) projection — the text payload never shuffles; the
    kept doc_ids semi-join back to the corpus map-side. One stratum =
    one window partition; a production run over few huge strata splits
    each into hash sub-shards with per-shard budgets (the same
    prefix-sum plan sample_pack_sequences uses) to keep partitions
    bounded."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.filter(F.col("text").isNotNull() & (F.trim("text") != "")).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        _u32(F.col("doc_id")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("running_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("running_tokens") <= _SOURCE_TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "running_tokens")
    )
