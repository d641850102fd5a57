"""Document-COLLECTION operators: the document-mode node-table layout
(sirix_spark/store/docnodes.py — the representation the reference's
integration corpus runs on) produced DISTRIBUTEDLY for a whole corpus
of documents, not one driver-shredded resource.

This is the 100 TB shape of document mode: `shred_collection` fans
documents out over Arrow-batched ``mapInPandas`` (each document's key
space is independent → map-only, zero shuffle — the
ParallelJsonShredder.java:72 analog), and every structural query
becomes a relational op on ONE node table:

- path-summary statistics  → groupBy(path, kind) — one shuffle over
  already-tiny per-path groups;
- CAS index scan           → filter on (path, kind, value) — when the
  node table is persisted as parquet this is pushdown + row-group
  stats pruning, exactly the access pattern the reference answers
  from its CAS red-black trees (index/cas/), free at any scale;
- doc-level join-back      → equi-join on doc_id.

Documents here are synthesized per row from the driver `documents`
table (to_json of a struct — deterministic field order), so each
query has an exact DuckDB oracle over the same table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.store.docnodes import shred_collection
from sirix_spark.tables import load


def _shredded(spark, sf_dir):
    """documents → one JSON doc per row → distributed node table."""
    docs = load(spark, sf_dir, "documents")
    js = F.to_json(
        F.struct(
            F.col("lang"),
            F.col("source"),
            F.struct(F.col("n_chars").alias("chars")).alias("stats"),
        )
    )
    return shred_collection(
        docs.select("doc_id", js.alias("js")), "doc_id", "js"
    )


def doc_shred_path_stats(spark, sf_dir):
    """Path-summary stats over the shredded corpus: node count per
    (path, kind) — the PathSummaryReader stats table computed from a
    distributed shred instead of a stored tree."""
    return (
        _shredded(spark, sf_dir)
        .groupBy("path", "kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("path", "kind")
    )


# Each object field contributes a `field` node AND its value node at
# the same path (docnodes.py NODE_SCHEMA); JSON nulls are dropped by
# to_json, so per-path counts equal COUNT(col). The testdata has no
# NULLs, but COUNT(col) keeps the oracle honest if that changes.
DOC_SHRED_PATH_STATS_SQL = """
SELECT * FROM (
  SELECT '' AS path, 'object' AS kind, CAST(count(*) AS BIGINT) AS n FROM documents
  UNION ALL SELECT '/lang', 'field', CAST(count(lang) AS BIGINT) FROM documents
  UNION ALL SELECT '/lang', 'string', CAST(count(lang) AS BIGINT) FROM documents
  UNION ALL SELECT '/source', 'field', CAST(count(source) AS BIGINT) FROM documents
  UNION ALL SELECT '/source', 'string', CAST(count(source) AS BIGINT) FROM documents
  UNION ALL SELECT '/stats', 'field', CAST(count(*) AS BIGINT) FROM documents
  UNION ALL SELECT '/stats', 'object', CAST(count(*) AS BIGINT) FROM documents
  UNION ALL SELECT '/stats/chars', 'field', CAST(count(n_chars) AS BIGINT) FROM documents
  UNION ALL SELECT '/stats/chars', 'number', CAST(count(n_chars) AS BIGINT) FROM documents
) ORDER BY path, kind
"""


def doc_collection_cas_scan(spark, sf_dir):
    """CAS scan over the corpus node table — path + typed-value
    filter (the jn:scan-cas-index access pattern), then a doc-level
    rollup: matching docs per source."""
    nodes = _shredded(spark, sf_dir)
    hits = nodes.filter(
        (F.col("path") == "/lang")
        & (F.col("kind") == "string")
        & (F.col("json") == '"en"')
    ).select(F.col("doc_id").cast("long").alias("doc_id"))
    docs = load(spark, sf_dir, "documents")
    return (
        docs.join(hits, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


DOC_COLLECTION_CAS_SCAN_SQL = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE lang = 'en'
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "doc_shred_path_stats": Query(
        doc_shred_path_stats, DOC_SHRED_PATH_STATS_SQL, ("doccollection",)
    ),
    "doc_collection_cas_scan": Query(
        doc_collection_cas_scan, DOC_COLLECTION_CAS_SCAN_SQL, ("doccollection",)
    ),
}
