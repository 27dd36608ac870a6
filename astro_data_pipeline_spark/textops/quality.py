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
from ..session import materialize_barrier
from ..sources import load_table

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


def _stopword_count(tokens: str = "tokens") -> F.Column:
    """Stopword OCCURRENCE count over a token-array column (filter+size,
    not array_intersect, which would dedup). One definition shared by
    the quality score, the langid heuristic, and the filter verdict —
    a stopword-list or matching-semantics change lands in all three."""
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    return F.size(F.filter(F.col(tokens), lambda t: F.array_contains(stop_arr, t)))


def _sorted_bigrams(tokens: str = "tokens") -> F.Column:
    """In-row word bigrams of a token array, array_sort'ed so multiplicity
    becomes run length (shared by the repetition filter and the verdict)."""
    n = F.size(tokens)
    return F.array_sort(
        F.zip_with(
            F.slice(tokens, 1, n - 1),
            F.slice(tokens, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )


def _longest_run(sorted_col: str = "bs") -> F.Column:
    """Longest run in a sorted array = the max element multiplicity —
    one aggregate HOF, no explode, no shuffle."""
    return F.expr(
        f"""aggregate({sorted_col},
               named_struct('prev', cast(null as string),
                            'run', cast(0 as bigint),
                            'best', cast(0 as bigint)),
               (acc, x) -> IF(x <=> acc.prev,
                   named_struct('prev', x, 'run', acc.run + 1L,
                                'best', greatest(acc.best, acc.run + 1L)),
                   named_struct('prev', x, 'run', 1L,
                                'best', greatest(acc.best, 1L))),
               acc -> acc.best)"""
    )


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
    n_tok = F.size("tokens")
    n_stop = _stopword_count()
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
    ratio = _stopword_count() / F.size("tokens")
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


@query(
    "text_repetition_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> '' AND
              len(regexp_split_to_array(trim(text), '\s+')) >= 2
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    ),
    cnt AS (
        SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ),
    agg AS (
        SELECT doc_id, max(c) AS top_bigram_cnt, sum(c) AS n_bigrams
        FROM cnt GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(a.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(a.top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
           round(a.top_bigram_cnt * 1.0 / a.n_bigrams, 4) AS top_bigram_frac,
           round(len(list_distinct(k.t)) * 1.0 / len(k.t), 4) AS distinct_token_ratio,
           CAST(a.top_bigram_cnt * 1.0 / a.n_bigrams > 0.05
                OR len(list_distinct(k.t)) * 1.0 / len(k.t) < 0.2 AS BOOLEAN)
               AS is_repetitive
    FROM agg a JOIN toks k USING (doc_id)
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction of
    word-bigram mass held by the single most frequent bigram, plus the
    distinct-token ratio; documents dominated by one repeated phrase (or
    with a tiny vocabulary) are flagged.

    Scale shape: every statistic is per-document, so the whole operator
    is computed IN-ROW — bigrams via a zip_with of the token list
    against itself shifted by one, the top-bigram count as the longest
    run in the array_sort'ed bigram list (one aggregate HOF) — and the
    plan has ZERO exchanges (asserted in test_plans.py). The previous
    formulation exploded every corpus bigram into a (doc_id, bigram)
    groupBy: a corpus-token-sized shuffle of strings to compute numbers
    each row already owned."""
    docs = load_table(spark, sf_dir, "documents")
    # explode(array(...)) barrier: a bare filter on size(tokens) gets
    # pushed below the projection and re-inlines split(trim(text)) into
    # the Filter — every document tokenized twice (the
    # filter-below-projection pitfall, ROUND2.md)
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            F.explode(F.array(F.split(F.trim("text"), r"\s+"))).alias("tokens"),
        )
        .filter(F.size("tokens") >= 2)
    )
    n = F.size("tokens")
    sized = toks.select(
        "doc_id",
        (F.size(F.array_distinct("tokens")) / n).alias("distinct_token_ratio_raw"),
        _sorted_bigrams().alias("bs"),
    )
    # longest run in the sorted bigram array = max multiplicity
    top_cnt = _longest_run("bs")
    agg = sized.select(
        "doc_id",
        "distinct_token_ratio_raw",
        F.size("bs").cast("long").alias("n_bigrams"),
        top_cnt.alias("top_bigram_cnt"),
    )
    top_frac = F.col("top_bigram_cnt") / F.col("n_bigrams")
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.col("top_bigram_cnt").cast("long").alias("top_bigram_cnt"),
        F.round(top_frac, 4).alias("top_bigram_frac"),
        F.round("distinct_token_ratio_raw", 4).alias("distinct_token_ratio"),
        ((top_frac > 0.05) | (F.col("distinct_token_ratio_raw") < 0.2)).alias(
            "is_repetitive"
        ),
    )


_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\b555-0[0-9]{3}\b"


@query(
    "text_pii_redaction",
    oracle=rf"""
    WITH enriched AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com for details'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' or call 555-0'
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       ELSE '' END AS raw
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_PAT}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_PAT}')) AS INTEGER) AS n_phones,
           regexp_replace(regexp_replace(raw, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                          '{_PHONE_PAT}', '<PHONE>', 'g') AS redacted
    FROM enriched
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training corpora: count and redact email / phone
    patterns with JVM ``regexp_replace`` (whole-stage codegen, no
    Python). The fixture text contains no PII, so a deterministic
    enrichment stripe (doc_id mod 5 → email, mod 7 → phone) is appended
    in-plan on BOTH the Spark and oracle side; the gate then checks the
    extraction counts and the redacted text byte-for-byte. Patterns are
    kept in the Java∩RE2 common subset so both engines compile them
    identically."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(
            F.pmod("doc_id", F.lit(5)) == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com for details"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(7)) == 0,
            F.concat(
                F.lit(" or call 555-0"),
                F.lpad(F.pmod("doc_id", F.lit(1000)).cast("string"), 3, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    enriched = docs.filter(F.col("text").isNotNull()).select("doc_id", raw.alias("raw"))
    return enriched.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_PAT), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(_PHONE_PAT), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>"
        ).alias("redacted"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf_cnt FROM toks GROUP BY doc_id, term
    ),
    doclen AS (
        SELECT doc_id, sum(tf_cnt) AS doc_len FROM tf GROUP BY doc_id
    ),
    df AS (
        SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
    ),
    scored AS (
        SELECT t.doc_id, t.term, t.tf_cnt,
               t.tf_cnt * 10000.0 / (l.doc_len * d.doc_freq) AS score
        FROM tf t JOIN doclen l USING (doc_id) JOIN df d USING (term)
    )
    SELECT doc_id, term, CAST(tf_cnt AS BIGINT) AS tf_cnt,
           round(score, 6) AS score, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    WHERE rnk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by tf-idf (inverse-df
    weighted term frequency). The score is a pure rational —
    ``tf * 10000 / (doc_len * doc_freq)`` — instead of the classic
    ``tf * ln(N/df)``: IEEE division of the same integers is bit-identical
    across engines, where ``ln`` is libm-dependent and would make the
    cross-engine hash flaky near ties. Ties break on the term string.

    Scale shape: tf is one map-side-combinable (doc_id, term) count,
    materialized ONCE behind a materialize_barrier (conf-gated local vs
    reliable checkpoint; see session.py) — without it
    Catalyst plans three independent corpus scans (one per branch), 3×
    the dominant cost at 100 TB. The document-frequency table is
    vocabulary-sized (≪ corpus) and joins broadcast (map-side combine
    absorbs hot stopword terms — a window-over-term formulation would
    skew); the top-3 is a bounded per-doc window, partitioned by doc_id
    — no global window, no all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf_cnt"))
        .transform(materialize_barrier)
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tf_cnt").alias("doc_len"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = (
        tf.join(doclen, "doc_id")
        # NO broadcast hint: the term vocabulary is corpus-sized at web
        # scale (every distinct token — URLs, hex blobs, typos), so
        # forcing a broadcast would collect it to the driver and OOM.
        # A plain equi-join co-partitions on term; AQE still upgrades to
        # broadcast at runtime whenever the vocabulary actually fits.
        .join(df_tbl, "term")
        .withColumn(
            "score", F.col("tf_cnt") * 10000.0 / (F.col("doc_len") * F.col("doc_freq"))
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf_cnt").cast("long").alias("tf_cnt"),
            F.round("score", 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@query(
    "text_unigram_rarity_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf_cnt FROM toks GROUP BY 1, 2
    ),
    vocab AS (
        SELECT term, CAST(sum(tf_cnt) AS BIGINT) AS corpus_cnt FROM tf GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(sum(t.tf_cnt) AS BIGINT) AS doc_len,
           CAST(sum(t.tf_cnt * v.corpus_cnt) AS BIGINT) AS sum_corpus_cnt,
           round(sum(t.tf_cnt * v.corpus_cnt) * 1.0 / sum(t.tf_cnt), 4)
               AS mean_token_df
    FROM tf t JOIN vocab v USING (term)
    GROUP BY t.doc_id
    """,
)
def text_unigram_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy: score each document by the mean corpus
    frequency of its tokens (with multiplicity) — the rational-arithmetic
    stand-in for mean log-probability under the corpus unigram LM (the
    two rank documents identically up to Jensen-gap; rational keeps the
    cross-engine hash bit-stable, the same trade text_tfidf_top_terms
    makes). Low score = rare/garbled vocabulary, high = stopword soup;
    both tails are what a quality filter drops.

    Scale shape: identical to tf-idf — one (doc_id, term) map-side-
    combinable count materialized ONCE behind a checkpoint barrier, a
    vocabulary-sized aggregate broadcast back onto it, one final
    groupBy(doc_id). The corpus scans once; hot stopword terms are
    absorbed by partial aggregation, never a skewed window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull() & (F.trim("text") != "")).select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf_cnt"))
        .transform(materialize_barrier)
    )
    vocab = tf.groupBy("term").agg(F.sum("tf_cnt").cast("long").alias("corpus_cnt"))
    return (
        # no broadcast hint — corpus-sized vocabulary at web scale; AQE
        # upgrades to broadcast at runtime when it fits (see tfidf)
        tf.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf_cnt").cast("long").alias("doc_len"),
            F.sum(F.col("tf_cnt") * F.col("corpus_cnt")).cast("long").alias("sum_corpus_cnt"),
            F.round(
                F.sum(F.col("tf_cnt") * F.col("corpus_cnt"))
                / F.sum("tf_cnt"),
                4,
            ).alias("mean_token_df"),
        )
    )


_MIN_TOKENS = 10
_MAX_TOKENS = 1000
_MIN_STOPWORD = 0.01
_MAX_TOP_BIGRAM = 0.05
_MIN_DISTINCT = 0.2


@query(
    "text_quality_filter_verdict",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tokens
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    feat AS (
        SELECT doc_id,
               len(tokens) AS n_tok,
               len(list_filter(tokens, t -> t IN ({_STOP_SQL}))) * 1.0
                   / len(tokens) AS stop_ratio,
               len(list_distinct(tokens)) * 1.0 / len(tokens) AS distinct_ratio,
               CASE WHEN len(tokens) >= 2 THEN (
                   SELECT max(c) * 1.0 / (len(tokens) - 1) FROM (
                       SELECT count(*) AS c
                       FROM unnest(list_transform(range(1, len(tokens)),
                                   i -> tokens[i] || ' ' || tokens[i + 1])) AS u(bg)
                       GROUP BY bg
                   )
               ) ELSE 0.0 END AS top_bigram_frac
        FROM toks
    )
    SELECT doc_id,
           CASE
               WHEN n_tok < {_MIN_TOKENS} THEN 'too_short'
               WHEN n_tok > {_MAX_TOKENS} THEN 'too_long'
               WHEN top_bigram_frac > {_MAX_TOP_BIGRAM} THEN 'repetitive'
               WHEN distinct_ratio < {_MIN_DISTINCT} THEN 'low_vocab'
               WHEN stop_ratio < {_MIN_STOPWORD} THEN 'no_stopwords'
               ELSE 'ok'
           END AS reason,
           CASE
               WHEN n_tok < {_MIN_TOKENS} THEN 'too_short'
               WHEN n_tok > {_MAX_TOKENS} THEN 'too_long'
               WHEN top_bigram_frac > {_MAX_TOP_BIGRAM} THEN 'repetitive'
               WHEN distinct_ratio < {_MIN_DISTINCT} THEN 'low_vocab'
               WHEN stop_ratio < {_MIN_STOPWORD} THEN 'no_stopwords'
               ELSE 'ok'
           END = 'ok' AS keep
    FROM feat
    """,
)
def text_quality_filter_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled quality-filter pass: one verdict row per document
    with `keep` and the FIRST failing rule as `reason` (length bounds →
    repetition → vocabulary → stopword floor) — the decision table a
    corpus build applies before tokenization, with reason codes for the
    drop-rate dashboard.

    Scale shape: every feature is per-document and computed IN-ROW in
    one scan (stopword/distinct ratios via array HOFs, top-bigram mass
    via the sorted-bigram longest-run aggregate) — zero exchanges,
    plan-asserted; the corpus is filtered in a single codegen'd map."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .withColumn("tokens", F.split(F.trim("text"), r"\s+"))
    )
    n_tok = F.size("tokens")
    sized = toks.select(
        "doc_id",
        n_tok.alias("n_tok"),
        (_stopword_count() / n_tok).alias("stop_ratio"),
        (F.size(F.array_distinct("tokens")) / n_tok).alias("distinct_ratio"),
        _sorted_bigrams().alias("bs"),
    )
    top_cnt = _longest_run("bs")
    feat = sized.select(
        "doc_id",
        "n_tok",
        "stop_ratio",
        "distinct_ratio",
        F.when(F.col("n_tok") >= 2, top_cnt / (F.col("n_tok") - 1))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )
    reason = (
        F.when(F.col("n_tok") < _MIN_TOKENS, F.lit("too_short"))
        .when(F.col("n_tok") > _MAX_TOKENS, F.lit("too_long"))
        .when(F.col("top_bigram_frac") > _MAX_TOP_BIGRAM, F.lit("repetitive"))
        .when(F.col("distinct_ratio") < _MIN_DISTINCT, F.lit("low_vocab"))
        .when(F.col("stop_ratio") < _MIN_STOPWORD, F.lit("no_stopwords"))
        .otherwise(F.lit("ok"))
    )
    return feat.select(
        "doc_id", reason.alias("reason"), (reason == "ok").alias("keep")
    )
