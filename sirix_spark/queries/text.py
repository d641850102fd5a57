"""Text-analysis operators for training-data pipelines over the
`documents` table: token counting, quality scoring, language-ID
heuristic, document fingerprinting.

These extend the reference's surface (it has no corpus operators) as
first-class engine components; all are pure JVM built-ins (split /
explode / regexp / md5), no Python boundary, one shuffle max.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load

# Small deterministic English stopword list shared with the oracle.
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "that", "it")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


# --- token counting (whitespace + BPE-ish subword estimate) ---------
def token_count(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    # BPE-ish upper bound: ceil(chars/4) is the classic token
    # estimate; emit both whitespace tokens and the estimate.
    return docs.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.ceil(F.length("text") / 4).cast("bigint").alias("n_bpe_est"),
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents
"""


# --- quality scoring -------------------------------------------------
def quality_score(spark, sf_dir):
    """Deterministic quality features: word count, stopword ratio,
    mean word length; score = weighted blend.

    Cross-engine determinism: fractional outputs are floor-scaled to
    1e-4 ticks (`*_e4` bigints) instead of round(x,4) — both engines
    compute bit-identical doubles here, and floor of identical bits
    is identical, while round() implementations legitimately disagree
    at .00005 boundaries (Spark rounds the shortest decimal repr,
    DuckDB rounds numerically)."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    avg_wl = (F.length("text") - n_words + 1) / n_words
    stop_ratio = n_stop.cast("double") / n_words
    score = F.lit(0.5) * stop_ratio + F.lit(0.5) * F.least(avg_wl / 10.0, F.lit(1.0))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        F.floor(avg_wl * 10000).cast("bigint").alias("avg_word_len_e4"),
        F.floor(score * 10000).cast("bigint").alias("quality_e4"),
    )


QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_SQL}))) AS n_stop,
       CAST(floor((length(text) - len(string_split(text, ' ')) + 1)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) * 10000) AS BIGINT)
         AS avg_word_len_e4,
       CAST(floor((0.5 * (len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_SQL})))
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 0.5 * least((length(text) - len(string_split(text, ' ')) + 1)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0))
           * 10000) AS BIGINT) AS quality_e4
FROM documents
"""


# --- language-ID heuristic ------------------------------------------
def lang_id(spark, sf_dir):
    """N-gram/stopword heuristic: predict 'en' when the English
    stopword ratio clears a threshold. Compared against the labeled
    `lang` column."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    ratio = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(words)
    pred = F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unknown"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("correct"),
    )


LANG_ID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_SQL})))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.08
            THEN 'en' ELSE 'unknown' END AS pred_lang,
       (CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_SQL})))
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.08
             THEN 'en' ELSE 'unknown' END) = lang AS correct
FROM documents
"""


# --- document fingerprint -------------------------------------------
def fingerprint(spark, sf_dir):
    """Content fingerprint over normalized text (lowercase, collapsed
    whitespace) — the exact-dedup key and audit identity."""
    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id", F.substring(F.md5(norm), 1, 16).alias("fingerprint")
    )


FINGERPRINT_SQL = r"""
SELECT doc_id,
       substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16)
         AS fingerprint
FROM documents
"""


QUERIES = {
    "token_count": Query(token_count, TOKEN_COUNT_SQL, ("text",)),
    "quality_score": Query(quality_score, QUALITY_SCORE_SQL, ("text",)),
    "lang_id": Query(lang_id, LANG_ID_SQL, ("text",)),
    "fingerprint": Query(fingerprint, FINGERPRINT_SQL, ("text",)),
}
