"""JSON navigation / array operators — the JSONiq document surface
(SURVEY.md §2.2, §2.9) over `events.props` (a JSON string column) and
`documents.text` tokenized into arrays.

Reference parity:
- object deref $r.field        → get_json_object / struct column access
  (DerefExpr, compiler/translator/DerefDescendantExpr.java:49).
- array unbox $doc[] / [i] / [i:j] → explode / element_at / slice
  (json/JsonDBArray.java, JsonDBArraySlice.java).
- count(E[]) → jn:size rewrite → size() on the array column
  (compiler/optimizer/ArrayCountToSizeStage.java).
- JSON construction {\"k\": v} → to_json(struct(...))
  (Brackit JSON constructors).

Scale notes: all pure JVM built-ins (get_json_object, split, explode,
slice) — no Python boundary; explode carries only the projected
columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load


# --- object deref from JSON string ----------------------------------
def json_deref_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count("*").alias("cnt")
    )


JSON_DEREF_SUM_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       count(*) AS cnt
FROM events GROUP BY event_type
"""
# NOTE the outer CAST: DuckDB sum(BIGINT) yields HUGEINT (int128); an
# Arrow-based fetch (the driver's) surfaces that as Decimal, which
# canonicalizes as '99111.0' vs Spark's long '99111' — a hash mismatch
# on identical values (round-1 driver-red row). Every oracle integer
# sum in this repo must carry the outer BIGINT cast; the local gate
# (tools/check_oracle.py) now hashes the Arrow fetch path too.


# --- predicate on a JSON-derived field ------------------------------
def json_field_filter(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 90)
        .select("event_id", "event_type", "k")
    )


JSON_FIELD_FILTER_SQL = """
SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
"""


# --- JSON construction ----------------------------------------------
def json_construct(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.to_json(F.struct(F.col("doc_id"), F.col("lang"), F.col("n_chars"))).alias("js"),
    )


JSON_CONSTRUCT_SQL = """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)) AS js
FROM documents WHERE doc_id < 100
"""


# --- array size (count(E[]) → jn:size) ------------------------------
def array_size(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select("doc_id", F.size(words).alias("n_words"))


ARRAY_SIZE_SQL = """
SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents
"""


# --- array index + negative index + slice ---------------------------
def array_index_slice(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.slice(words, 1, 3), " ").alias("first3"),
    )


ARRAY_INDEX_SLICE_SQL = """
SELECT doc_id,
       string_split(text, ' ')[1]  AS first_word,
       string_split(text, ' ')[-1] AS last_word,
       array_to_string(string_split(text, ' ')[1:3], ' ') AS first3
FROM documents
"""


# --- array unbox (explode) ------------------------------------------
def array_explode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )


ARRAY_EXPLODE_SQL = """
SELECT doc_id, unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id < 20
"""


# --- positional explode (for $i at $pos in ..., SURVEY.md §2.5) -----
def array_posexplode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    ).withColumn("pos", F.col("pos") + 1)  # 1-based like XQuery position()


ARRAY_POSEXPLODE_SQL = """
SELECT doc_id,
       generate_subscripts(string_split(text, ' '), 1) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id < 20
"""


QUERIES = {
    "json_deref_sum": Query(json_deref_sum, JSON_DEREF_SUM_SQL, ("json",)),
    "array_posexplode": Query(array_posexplode, ARRAY_POSEXPLODE_SQL, ("array",)),
    "json_field_filter": Query(json_field_filter, JSON_FIELD_FILTER_SQL, ("json",)),
    "json_construct": Query(json_construct, JSON_CONSTRUCT_SQL, ("json",)),
    "array_size": Query(array_size, ARRAY_SIZE_SQL, ("array",)),
    "array_index_slice": Query(array_index_slice, ARRAY_INDEX_SLICE_SQL, ("array",)),
    "array_explode": Query(array_explode, ARRAY_EXPLODE_SQL, ("array",)),
}
