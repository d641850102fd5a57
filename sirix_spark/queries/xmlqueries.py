"""XML path-expression queries at table scale: construct XML from the
orders table, shred it distributed (expat mapInPandas,
sources/xml_source.py), and run XPath steps as relational axis joins
(jsoniq/xpath.py) — the reference's Brackit path compilation over its
node store (SirixCompileChain.java), here over a document COLLECTION
so every step is one join across all documents at once.

The oracle is the equivalent relational predicate over the same rows
the XML was built from, so the whole construct→shred→navigate→
aggregate pipeline is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load


def xml_path_filter(spark, sf_dir):
    """One XML document per order; XPath
    //order[@prio='1-URGENT']/key/text() then aggregate the matched
    keys. Shred is map-only (one task per input split), each axis
    step one join keyed by (doc, structural cols)."""
    from sirix_spark.jsoniq import parser as P
    from sirix_spark.jsoniq.xpath import eval_steps
    from sirix_spark.sources.xml_source import shred_xml

    orders = load(spark, sf_dir, "orders")
    docs = orders.select(
        F.col("o_orderkey").cast("string").alias("doc"),
        F.concat(
            F.lit('<order prio="'),
            F.col("o_orderpriority"),
            F.lit('"><key>'),
            F.col("o_orderkey").cast("string"),
            F.lit("</key><status>"),
            F.col("o_orderstatus"),
            F.lit("</status></order>"),
        ).alias("xml"),
    )
    nodes = shred_xml(docs)
    steps = P.parse("xml:doc('d','r')//order[@prio='1-URGENT']/key/text()").steps
    hits = eval_steps(nodes, steps)
    return hits.agg(
        F.count(F.lit(1)).alias("n_urgent"),
        F.sum(F.col("value").cast("bigint")).alias("sum_keys"),
    )


XML_PATH_FILTER_SQL = """
SELECT count(*) AS n_urgent,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
WHERE o_orderpriority = '1-URGENT'
"""


QUERIES = {
    "xml_path_filter": Query(
        fn=xml_path_filter,
        sql=XML_PATH_FILTER_SQL,
        tags=("xml", "xpath", "shred"),
    ),
}
