"""Document chunking + fingerprint sampling for training-data pipelines.

Two operators every pretraining/RAG corpus build runs per document:

- **sliding-window chunking** — split each document into fixed-size
  token windows with overlap (the tokenize-for-context-length pass and
  the retrieval-chunking pass are the same relational shape),
- **winnowing-style fingerprint sampling** — sample a deterministic
  ~1/(2w-1) subset of k-gram hashes per document (local-minimum
  selection, the symmetric-window variant of Schleimer/Wilkerson/Aiken
  "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
  for plagiarism / exact-substring-overlap detection at corpus scale.

Reference analog: the reference tiles large FITS mosaics into
fixed-size overlapping cutouts before per-tile processing
(application/image-processor ProcessingService tile dispatch); chunking
restates that tiling over text. Fingerprinting is the text analog of
its source-extraction "pick stable local extrema" detection pass.

Scale design (100 TB): both operators are ZERO-SHUFFLE maps. Chunking
derives every chunk from the row's own token array (one generator
explode, no window, no join). Fingerprinting computes the windowed
minimum *inside* the row's gram-hash array with higher-order functions
— the per-position window never leaves the row, so there is no
(doc_id, pos)-keyed exchange of O(corpus-tokens) gram rows — and
explodes only the selected ~1/(2w-1) fingerprints. Hashes are the
md5-u32 construction shared with textops.sampling, portable verbatim
to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import materialize_barrier
from ..sources import load_table
from .sampling import _u32_sql

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48

_WIN_K = 3  # words per k-gram
_WIN_W = 4  # selection window radius (min over [p-(w-1), p+(w-1)])


@query(
    "text_chunk_sliding_windows",
    oracle=rf"""
    WITH sized AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
           CAST(len(list_slice(toks, i * {_CHUNK_STRIDE} + 1,
                               i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}))
                AS BIGINT) AS n_chunk_tokens,
           sha256(array_to_string(
               list_slice(toks, i * {_CHUNK_STRIDE} + 1,
                          i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}), ' '))
               AS chunk_sha256
    FROM sized,
         UNNEST(generate_series(0, CAST(greatest(
             0, (n_tokens - {_CHUNK_TOKENS - _CHUNK_STRIDE} - 1)
                // {_CHUNK_STRIDE}) AS BIGINT)))
         AS t(i)
    """,
)
def text_chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size sliding-window chunking: 64-token chunks every 48
    tokens (16-token overlap), one row per (doc, chunk) with the
    chunk's sha256 so a downstream chunk-level dedup can run without
    re-materializing text.

    Scale shape: pure map + generator explode — chunk boundaries are a
    closed-form function of the row's own token count, so there is no
    window, no join, no shuffle; 1000 executors chunk 1000 partitions
    independently and output size is O(corpus tokens / stride)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.filter(F.col("text").isNotNull() & (F.trim("text") != "")).select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("toks"),
    )
    sized = sized.withColumn("n_tokens", F.size("toks"))
    # Last chunk id: greatest(0, floor((n - overlap - 1) / stride)), NOT
    # floor((n-1)/stride) — the naive bound emits a final chunk that is a
    # strict SUBSET of the previous one whenever n mod stride lands in
    # the overlap (e.g. 60 tokens: chunk 0 = 1..60 already covers chunk
    # 1 = 49..60). A subset chunk has a different sha, so chunk-level
    # dedup can't drop it and downstream indexes/packs duplicate text.
    last_id = F.greatest(
        F.lit(0),
        F.floor(
            (F.col("n_tokens") - (_CHUNK_TOKENS - _CHUNK_STRIDE) - 1) / _CHUNK_STRIDE
        ),
    )
    exploded = sized.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), last_id)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _CHUNK_STRIDE + 1
    chunk = F.slice(F.col("toks"), start, _CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.sha2(F.array_join(chunk, " "), 256).alias("chunk_sha256"),
    )


# winnowing selection as a reusable CTE chain: `fingerprints` is the
# (doc_id, pos, gram_hash) table both winnowing queries build on
_WINNOW_CTE = rf"""
    sized AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    grams AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               {_u32_sql(
                   "array_to_string(list_slice(toks, i, i + " + str(_WIN_K - 1) + "), ' ')"
               )} AS gram_hash
        FROM sized, UNNEST(generate_series(1, n_tokens - {_WIN_K - 1})) AS t(i)
        WHERE n_tokens >= {_WIN_K}
    ),
    sel AS (
        SELECT doc_id, pos, gram_hash,
               min({{'h': gram_hash, 'p': pos}}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {_WIN_W - 1} PRECEDING AND {_WIN_W - 1} FOLLOWING
               ) AS m
        FROM grams
    ),
    fingerprints AS (
        SELECT doc_id, pos, gram_hash
        FROM sel WHERE m.h = gram_hash AND m.p = pos
    )
"""


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH {_WINNOW_CTE}
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, gram_hash FROM fingerprints
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprints: hash every 3-word
    gram, keep a gram iff its (hash, pos) key is the minimum over the
    symmetric window of the 3 grams on either side — the
    local-minimum selection variant of SIGMOD'03 winnowing. Expected
    density 1/(2w-1); any shared run of ~w+k words between two documents
    shares a selected fingerprint, so substring-overlap detection joins
    these samples instead of all grams.

    Scale shape: the selection window is evaluated INSIDE each row's
    gram-hash array with higher-order functions (aggregate over the
    clamped index window), so — unlike the window-function formulation
    the DuckDB oracle uses — no O(corpus-grams) rows are ever shuffled
    to sort by (doc_id, pos); only the ~1/(2w-1) surviving fingerprints
    explode. Zero exchanges in the plan (asserted in test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    # explode(array(...)) barrier: filtering on the size of the computed
    # token array would otherwise be pushed below the projection,
    # re-inlining split(trim(text)) into the Filter and tokenizing every
    # document twice (the filter-below-projection pitfall, ROUND2.md)
    sized = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            F.explode(F.array(F.split(F.trim("text"), r"\s+"))).alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks"))
        .filter(F.col("n_tokens") >= _WIN_K)
    )
    # per-row gram-hash array: hs[i] = u32(md5(gram at 1-based pos i))
    hs = F.expr(
        f"""transform(sequence(1, n_tokens - {_WIN_K - 1}),
                i -> cast(conv(substring(
                        md5(array_join(slice(toks, i, {_WIN_K}), ' ')),
                        1, 8), 16, 10) as bigint))"""
    )
    # ng is provably n_tokens - (k-1): size(hs) would duplicate the whole
    # md5 gram-hash transform tree in the plan
    with_hs = sized.select(
        "doc_id", hs.alias("hs"), (F.col("n_tokens") - (_WIN_K - 1)).alias("ng")
    )
    # selected positions: p such that (hs[p], p) is the min over the
    # clamped window [p-(w-1), p+(w-1)] — computed in-row, no shuffle
    sel = F.expr(
        f"""filter(sequence(1, ng), p ->
                aggregate(
                    sequence(greatest(1, p - {_WIN_W - 1}),
                             least(ng, p + {_WIN_W - 1})),
                    named_struct('h', cast(9223372036854775807 as bigint),
                                 'p', cast(0 as int)),
                    (acc, q) -> IF(element_at(hs, q) < acc.h
                                   OR (element_at(hs, q) = acc.h AND q < acc.p),
                                   named_struct('h', element_at(hs, q),
                                                'p', cast(q as int)),
                                   acc)
                ).p = p)"""
    )
    return (
        with_hs.select("doc_id", "hs", F.explode(sel).alias("pos"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.element_at("hs", F.col("pos").cast("int")).alias("gram_hash"),
        )
    )


_OVERLAP_DF_CAP = 20  # drop fingerprint hashes present in more docs
_OVERLAP_MIN_SHARED = 2  # pairs must share >= this many fingerprints


@query(
    "dedup_substring_overlap_pairs",
    oracle=f"""
    WITH {_WINNOW_CTE},
    fp AS (
        SELECT DISTINCT doc_id, gram_hash FROM fingerprints
    ),
    rare AS (
        SELECT gram_hash FROM fp GROUP BY 1 HAVING count(*) <= {_OVERLAP_DF_CAP}
    ),
    posting AS (
        SELECT f.doc_id, f.gram_hash FROM fp f JOIN rare r USING (gram_hash)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM posting a JOIN posting b
      ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {_OVERLAP_MIN_SHARED}
    """,
)
def dedup_substring_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring overlap mining: document pairs sharing >= 2
    winnowing fingerprints — the MOSS-style plagiarism/copy detector,
    and the exact-substring complement to the Jaccard/MinHash whole-doc
    near-dup miners (a 60-word verbatim quote inside two otherwise
    unrelated documents is invisible to whole-doc Jaccard but shares
    ~8 fingerprints here).

    Scale shape: the standard inverted-index discipline of the shingle
    miner — fingerprints are already a ~1/(2w-1) sample of grams, the
    df-cap drops boilerplate hashes so per-hash fan-out is bounded at
    cap² pairs, and the slim deduped (doc_id, gram_hash) posting table
    is repartitioned BY THE JOIN KEY and checkpointed once so the
    in-row winnowing pass runs a single time and the self-join needs no
    further exchange (the dedup_lsh_candidate_pairs lesson: without the
    explicit partition count AQE coalesces the tiny posting table and
    serializes the expanding join)."""
    fp = (
        text_winnowing_fingerprints(spark, sf_dir)
        .select("doc_id", "gram_hash")
        .distinct()
    )
    n_parts = spark.sparkContext.defaultParallelism
    fp = materialize_barrier(fp.repartition(n_parts, "gram_hash"))
    rare = fp.groupBy("gram_hash").agg(F.count("*").alias("df")).filter(
        F.col("df") <= _OVERLAP_DF_CAP
    )
    posting = fp.join(rare.select("gram_hash"), "gram_hash")
    a = posting.select(F.col("doc_id").alias("doc_a"), "gram_hash")
    b = posting.select(F.col("doc_id").alias("doc_b"), "gram_hash")
    return (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _OVERLAP_MIN_SHARED)
    )
