"""Text-analysis operators for training-data pipelines.

Quality scoring, token counting, language-ID heuristic, document
fingerprinting — each a deterministic columnar plan (no Python in the hot
path) over the ``documents`` table, with a DuckDB oracle expressing the
identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sha256_arrow
from ..registry import query
from ..sources import load_table

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "text_quality_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT doc_id,
           CAST(len(tokens) AS INTEGER) AS token_cnt,
           round(n_chars * 1.0 / len(tokens), 4) AS avg_token_len,
           round(len(list_filter(tokens, t -> t IN ({_STOP_SQL}))) * 1.0
                 / len(tokens), 4) AS stopword_ratio,
           CAST(len(tokens) BETWEEN 10 AND 1000 AS BOOLEAN) AS length_ok
    FROM toks
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio features (the engine analog
    of the reference's per-record quality scorer, FitsProcessingService
    calculateImageQuality :761-802 — P5). Pure higher-order array
    functions: stays in codegen, zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .withColumn("tokens", F.split(F.trim("text"), r"\s+"))
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_tok = F.size("tokens")
    # occurrence count (array_intersect would dedup): filter + size
    n_stop = F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(stop_arr, t)))
    return toks.select(
        "doc_id",
        n_tok.cast("int").alias("token_cnt"),
        F.round(F.col("n_chars") / n_tok, 4).alias("avg_token_len"),
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        n_tok.between(10, 1000).alias("length_ok"),
    )


@query(
    "text_token_count_bpe_ish",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
               AS n_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens
    FROM documents WHERE text IS NOT NULL
    """,
)
def text_token_count_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex (letters runs / digit runs /
    single punctuation) — the pre-tokenizer split most BPE vocabularies
    start from."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_number_tokens"),
    )


@query(
    "text_langid_heuristic",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT doc_id, lang AS label_lang,
           CASE WHEN len(list_filter(tokens, t -> t IN ({_STOP_SQL}))) * 1.0
                     / len(tokens) >= 0.05
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM toks
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic: English-stopword density
    classifier (deterministic, expressed identically in the oracle).
    Real corpora would swap in per-language stopword tables broadcast to
    executors — same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .withColumn("tokens", F.split(F.trim("text"), r"\s+"))
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    ratio = F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(stop_arr, t))) / F.size(
        "tokens"
    )
    return toks.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("predicted_lang"),
    )


@query(
    "text_document_fingerprint",
    oracle=r"""
    SELECT doc_id,
           sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents WHERE text IS NOT NULL
    """,
)
def text_document_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: sha256 over whitespace-normalized lowercase
    text (reference lineage checksum analog, ProcessingContext.java:164) —
    the canonical-form hash exact-dedup keys on."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", sha256_arrow(normalized).alias("fingerprint")
    )
