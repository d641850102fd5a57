"""Registry queries that run through the JSONiq string entry point.

These prove the reference's user-facing query language
(SirixCompileChain.java:426-446 — every JsonIntegrationTest query is
a JSONiq string) end-to-end: string → parse → compile → DataFrame,
checked against the DuckDB oracle like every other registry entry.

Scale: the compiled plans are ordinary Catalyst plans over the same
table loads as the hand-written queries — pushdown/codegen/AQE apply
identically; the language layer adds zero runtime cost.

Determinism: aggregates stick to exact-on-double shapes (count, min,
max) or integral sums; oracle sums are CAST(... AS BIGINT) per the
round-1 HUGEINT lesson.
"""

from __future__ import annotations

from sirix_spark.jsoniq import execute
from sirix_spark.queries import Query
from sirix_spark.tables import load


def _run(spark, sf_dir, query: str, table: str):
    return execute(
        query, spark, tables={table: load(spark, sf_dir, table)}
    )


# --- FLWOR filter + projection --------------------------------------
def jsoniq_filter_project(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        "for $e in jn:doc('testdata','events') "
        "where $e.event_type eq 'click' and $e.value gt 200 "
        "return {'event_id': $e.event_id, 'user_id': $e.user_id, 'value': $e.value}",
        "events",
    )


JSONIQ_FILTER_PROJECT_SQL = """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'click' AND value > 200
"""


# --- FLWOR group by + aggregates ------------------------------------
def jsoniq_group_count(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        "for $e in jn:doc('testdata','events') "
        "group by $t := $e.event_type "
        "order by $t "
        "return {'event_type': $t, 'n': count($e), "
        "'lo': min($e.value), 'hi': max($e.value)}",
        "events",
    )


JSONIQ_GROUP_COUNT_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       min(value) AS lo, max(value) AS hi
FROM events GROUP BY event_type
"""


# --- let + arithmetic + conditional ---------------------------------
def jsoniq_let_conditional(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        "for $d in jn:doc('testdata','documents') "
        "let $kb := $d.n_chars idiv 1000 "
        "where $d.n_chars ge 200 "
        "return {'doc_id': $d.doc_id, 'kb': $kb, "
        "'size': if ($kb ge 2) then 'large' else 'small'}",
        "documents",
    )


JSONIQ_LET_CONDITIONAL_SQL = """
SELECT doc_id,
       CAST(n_chars // 1000 AS BIGINT) AS kb,
       CASE WHEN n_chars // 1000 >= 2 THEN 'large' ELSE 'small' END AS size
FROM documents WHERE n_chars >= 200
"""


# --- string function suite ------------------------------------------
def jsoniq_string_filter(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        "for $d in jn:doc('testdata','documents') "
        "where contains($d.source, '1') and starts-with($d.lang, 'e') "
        "return {'doc_id': $d.doc_id, 'lang': upper-case($d.lang), "
        "'len': string-length($d.text)}",
        "documents",
    )


JSONIQ_STRING_FILTER_SQL = """
SELECT doc_id, upper(lang) AS lang, CAST(length(text) AS INT) AS len
FROM documents
WHERE contains(source, '1') AND starts_with(lang, 'e')
"""


# --- standalone aggregate over a FLWOR ------------------------------
def jsoniq_count(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        "count(for $e in jn:doc('testdata','events') "
        "where $e.event_type eq 'purchase' return $e)",
        "events",
    )


JSONIQ_COUNT_SQL = """
SELECT CAST(count(*) AS BIGINT) AS count FROM events
WHERE event_type = 'purchase'
"""


QUERIES = {
    "jsoniq_filter_project": Query(
        jsoniq_filter_project, JSONIQ_FILTER_PROJECT_SQL, ("jsoniq", "flwor")
    ),
    "jsoniq_group_count": Query(
        jsoniq_group_count, JSONIQ_GROUP_COUNT_SQL, ("jsoniq", "groupby")
    ),
    "jsoniq_let_conditional": Query(
        jsoniq_let_conditional, JSONIQ_LET_CONDITIONAL_SQL, ("jsoniq",)
    ),
    "jsoniq_string_filter": Query(
        jsoniq_string_filter, JSONIQ_STRING_FILTER_SQL, ("jsoniq", "strings")
    ),
    "jsoniq_count": Query(jsoniq_count, JSONIQ_COUNT_SQL, ("jsoniq",)),
}
