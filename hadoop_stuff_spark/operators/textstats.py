"""Text-analysis queries over the ``documents`` table (SURVEY.md §2.7 N3):
token counting, quality scoring, language ID, fingerprinting. All built on
hadoop_stuff_spark.functions.text — pure Catalyst expressions, one scan per
query, no shuffle except the final (tiny) aggregate where present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table, spread
from hadoop_stuff_spark.functions import text as T


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.size(T.tokens_regex("text")).alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


TOKEN_COUNTS_SQL = r"""
SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics + composite score (rounded for the
    oracle's value-hash)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.round(T.avg_token_length("text"), 4).alias("avg_token_len"),
        F.round(T.distinct_token_ratio("text"), 4).alias("distinct_ratio"),
        F.round(T.stopword_ratio("text"), 4).alias("stopword_ratio"),
        F.round(T.quality_score("text"), 4).alias("quality"),
    )


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         (n_chars - (len(toks) - 1)) * 1.0 / len(toks) AS avg_token_len,
         len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) * 1.0 / len(toks) AS stopword_ratio
  FROM t
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       round(avg_token_len, 4) AS avg_token_len,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(0.5 * distinct_ratio
             + 0.3 * least(avg_token_len / 8.0, 1.0)
             + 0.2 * (1.0 - stopword_ratio), 4) AS quality
FROM m
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring fused into ONE scan of documents
    (consolidates the former n3_token_counts / n3_text_quality queries —
    same Catalyst expressions, one pass instead of two; at 100 TB a second
    full-corpus scan is the thing to avoid)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.size(T.tokens_regex("text")).alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(T.avg_token_length("text"), 4).alias("avg_token_len"),
        F.round(T.distinct_token_ratio("text"), 4).alias("distinct_ratio"),
        F.round(T.stopword_ratio("text"), 4).alias("stopword_ratio"),
        F.round(T.quality_score("text"), 4).alias("quality"),
    )


TEXT_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS toks,
         length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id, text, n_chars,
         len(toks) AS n_tokens,
         (n_chars - (len(toks) - 1)) * 1.0 / len(toks) AS avg_token_len,
         len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) * 1.0 / len(toks) AS stopword_ratio
  FROM t
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(avg_token_len, 4) AS avg_token_len,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(0.5 * distinct_ratio
             + 0.3 * least(avg_token_len / 8.0, 1.0)
             + 0.2 * (1.0 - stopword_ratio), 4) AS quality
FROM m
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID per document, with per-language hit scores."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    scores = T.lang_scores("text")
    return docs.select(
        "doc_id",
        *[score.alias(f"score_{lang}") for lang, score in sorted(scores.items())],
        T.lang_id("text").alias("pred_lang"),
    )


LANGUAGE_ID_SQL = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), s AS (
  SELECT doc_id,
    CAST(len(list_intersect(toks, ['der','die','und','von','ist'])) AS INTEGER) AS score_de,
    CAST(len(list_intersect(toks, ['the','a','of','and','is'])) AS INTEGER) AS score_en,
    CAST(len(list_intersect(toks, ['el','la','y','de','es'])) AS INTEGER) AS score_es,
    CAST(len(list_intersect(toks, ['le','la','et','de','est'])) AS INTEGER) AS score_fr
  FROM t
), ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM (
    SELECT doc_id, 'de' AS lang, score_de AS score FROM s
    UNION ALL SELECT doc_id, 'en', score_en FROM s
    UNION ALL SELECT doc_id, 'es', score_es FROM s
    UNION ALL SELECT doc_id, 'fr', score_fr FROM s
  )
)
SELECT s.doc_id, s.score_de, s.score_en, s.score_es, s.score_fr,
       CASE WHEN r.score <= 0 THEN 'und' ELSE r.lang END AS pred_lang
FROM s JOIN ranked r ON s.doc_id = r.doc_id AND r.rn = 1
"""


def winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints per document (k=3-gram hashes,
    window w=4): fingerprint-set size + lexicographic min fingerprint —
    enough to certify the whole scheme against the oracle's list-
    comprehension reimplementation."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    fps = T.winnow_fingerprints("text", k=3, w=4)
    return docs.select(
        "doc_id",
        F.size(fps).alias("n_fps"),
        F.array_min(fps).alias("min_fp"),
    )


WINNOW_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(toks) - 2 >= 1
              THEN [md5(array_to_string(toks[i:i+2], ' ')) FOR i IN range(1, len(toks) - 2 + 1)]
              ELSE []::VARCHAR[] END AS hashes
  FROM t
), w AS (
  SELECT doc_id,
         CASE WHEN len(hashes) = 0 THEN []::VARCHAR[]
              WHEN len(hashes) - 3 >= 1
              THEN [list_min(hashes[i:i+3]) FOR i IN range(1, len(hashes) - 3 + 1)]
              ELSE [list_min(hashes)] END AS wins
  FROM g
)
SELECT doc_id,
       CAST(len(list_distinct(wins)) AS INTEGER) AS n_fps,
       list_min(wins) AS min_fp
FROM w
"""


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-word
    fraction, top-word fraction, top-bigram fraction. High values flag
    boilerplate/spam for corpus filtering.

    Pure Catalyst HOFs over the token array — one scan, zero shuffle (the
    per-doc histogram is computed inside the row via transform/filter, not
    via explode+groupBy), so at 100 TB this runs at scan speed map-only."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    bigs = T.bigrams("text")
    n_toks = F.size(toks)
    n_bigs = F.size(bigs)
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n_toks, 6).alias(
            "dup_word_frac"
        ),
        F.round(T.top_element_count(toks) / n_toks, 6).alias("top_word_frac"),
        F.when(
            n_bigs >= 1, F.round(T.top_element_count(bigs) / n_bigs, 6)
        ).alias("top_bigram_frac"),
    )


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), b AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) - 1 >= 1
              THEN [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
              ELSE []::VARCHAR[] END AS bigs
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 6) AS dup_word_frac,
       round(list_max(list_transform(list_distinct(toks),
                                     w -> len(list_filter(toks, x -> x = w))))
             * 1.0 / len(toks), 6) AS top_word_frac,
       CASE WHEN len(bigs) >= 1
            THEN round(list_max(list_transform(list_distinct(bigs),
                                               w -> len(list_filter(bigs, x -> x = w))))
                       * 1.0 / len(bigs), 6)
            ELSE NULL END AS top_bigram_frac
FROM b
"""


def vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 words by total term frequency (ties by
    word), with document frequency — the tokenizer-vocab building block.

    explode → hash-aggregate: the shuffle carries (word, partial counts)
    only, with map-side partial aggregation; top-k is a
    TakeOrderedAndProject, never a global sort. At 100 TB the word-key
    space is small (vocabulary-sized), so the agg state stays tiny."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("word"))
    return (
        tok.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), "word")
        .limit(100)
    )


VOCABULARY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS term_freq,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM tok GROUP BY word
ORDER BY term_freq DESC, word
LIMIT 100
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most characteristic term per document by TF-IDF (tf/doclen ×
    ln(N/df)), ties broken by word — keyword extraction for corpus
    curation. Two hash-agg shuffles (doc-term tf, word df) + one join on
    word; the corpus-size scalar is a broadcast single-row aggregate, not
    a driver collect."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.size(T.tokens("text")).alias("n_tokens"),
        F.explode(T.tokens("text")).alias("word"),
    )
    tf = tok.groupBy("doc_id", "n_tokens", "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") / F.col("n_tokens"))
            * F.log(F.col("n_docs") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_term"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         unnest(string_split(text, ' ')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, n_tokens, word, count(*) AS tf
  FROM tok GROUP BY 1, 2, 3
), dfreq AS (
  SELECT word, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.word,
         (tf.tf * 1.0 / tf.n_tokens) * ln(n.n_docs * 1.0 / dfreq.df) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY (tf.tf * 1.0 / tf.n_tokens)
                                     * ln(n.n_docs * 1.0 / dfreq.df) DESC,
                                     tf.word) AS rn
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word AS top_term, round(tfidf, 6) AS tfidf
FROM scored WHERE rn = 1
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (md5 of normalized text) + per-source
    distinct-fingerprint counts — the exact-dedup building block."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("source", T.fingerprint_md5("text").alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
        )
    )


FINGERPRINTS_SQL = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) AS n_distinct
FROM documents GROUP BY source
"""
