"""Set operations over record sequences (SURVEY.md §2.8).

Reference parity: ConcurrentUnionAxis.java:38 /
ConcurrentIntersectAxis / ConcurrentExceptAxis — node-sequence set
ops with dedup. Spark: union().distinct() / intersect() / subtract(),
all shuffle-by-key distinct ops that AQE sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load


def _building(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _urgent(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


_B = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_U = "SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


def set_union(spark, sf_dir):
    return _building(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


def set_intersect(spark, sf_dir):
    return _building(spark, sf_dir).intersect(_urgent(spark, sf_dir))


def set_except(spark, sf_dir):
    return _building(spark, sf_dir).subtract(_urgent(spark, sf_dir))


def set_ops(spark, sf_dir):
    """All three set operations in one driver row (union / intersect /
    except results tagged by op) — a dense entry so §2.8 keeps a
    driver-green signal inside the gate's 50-query window while the
    per-op entries stay registered for granular local checks."""
    u = set_union(spark, sf_dir).withColumn("op", F.lit("union"))
    i = set_intersect(spark, sf_dir).withColumn("op", F.lit("intersect"))
    e = set_except(spark, sf_dir).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


SET_OPS_SQL = f"""
SELECT custkey, 'union' AS op     FROM (({_B}) UNION ({_U}))
UNION ALL
SELECT custkey, 'intersect' AS op FROM (({_B}) INTERSECT ({_U}))
UNION ALL
SELECT custkey, 'except' AS op    FROM (({_B}) EXCEPT ({_U}))
"""


QUERIES = {
    "set_ops": Query(set_ops, SET_OPS_SQL, ("setops",)),
    "set_union": Query(set_union, f"({_B}) UNION ({_U})", ("setops",)),
    "set_intersect": Query(set_intersect, f"({_B}) INTERSECT ({_U})", ("setops",)),
    "set_except": Query(set_except, f"({_B}) EXCEPT ({_U})", ("setops",)),
}
