"""Core analytics shapes — the reference's 9-query DuckDB matrix plus
sorted-scan/top-k and covered-row projection, re-expressed over the
driver's TPC-H-ish tables.

Reference parity (SURVEY.md §2.4, §2.6):
- filter/group/aggregate kernels: SirixVectorizedExecutor.java
  (executeAggregate :7728, executeGroupByCount :866,
  executePredicateCount :1005, executeGroupByCountMulti :1247,
  executePredicateGroupByCount :1168, executeCountDistinct :7329,
  executeGroupByAggregate :7871, computed aggregates :8536).
- sorted scan / top-k: SortedScanDetectionStage.java:16-29.
- covered-row projection: RowMaterializeDetectionStage.java:16-29.
- 9-query shapes: bench/SirixVsDuckBenchMain.java:39-47.

Determinism contract with the DuckDB oracle:
- integral-valued double columns (l_quantity) sum exactly in binary —
  safe to aggregate as double.
- decimal-valued doubles (prices, discounts) are cast per-row to
  DECIMAL(18,6) in BOTH engines, summed exactly, then cast back to
  double: identical bits regardless of partition/merge order. This
  also mirrors the reference's exact-decimal overflow semantics
  (ComputedAggregateDetectionStage.java:22-26).
- averages are expressed as exact-sum / count (double division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load

DEC = "decimal(18,6)"


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem")


# --- 1. filterCount -------------------------------------------------
def filter_count(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .filter((F.col("l_quantity") > 40) & (F.col("l_returnflag") == "R"))
        .agg(F.count("*").alias("cnt"))
    )


FILTER_COUNT_SQL = """
SELECT count(*) AS cnt FROM lineitem
WHERE l_quantity > 40 AND l_returnflag = 'R'
"""


# --- 2. groupBy single key -> count ---------------------------------
def group_by_count(spark, sf_dir):
    return _li(spark, sf_dir).groupBy("l_returnflag").agg(F.count("*").alias("cnt"))


GROUP_BY_COUNT_SQL = "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag"


# --- 3. full-column sum ---------------------------------------------
def sum_qty(spark, sf_dir):
    return _li(spark, sf_dir).agg(F.sum("l_quantity").alias("sum_qty"))


SUM_QTY_SQL = "SELECT sum(l_quantity) AS sum_qty FROM lineitem"


# --- 4. avg (exact-sum / count) -------------------------------------
def avg_qty(spark, sf_dir):
    return _li(spark, sf_dir).agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )


AVG_QTY_SQL = "SELECT sum(l_quantity) / count(l_quantity) AS avg_qty FROM lineitem"


# --- 5. min + max ---------------------------------------------------
def min_max_qty(spark, sf_dir):
    return _li(spark, sf_dir).agg(
        F.min("l_quantity").alias("min_qty"), F.max("l_quantity").alias("max_qty")
    )


MIN_MAX_QTY_SQL = "SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty FROM lineitem"


# --- 6. groupBy two keys -> count -----------------------------------
def group_by_2keys(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


GROUP_BY_2KEYS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- 7. filter + groupBy -> count -----------------------------------
def filter_group_by(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .filter(F.col("l_linestatus") == "F")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
    )


FILTER_GROUP_BY_SQL = """
SELECT l_returnflag, count(*) AS cnt FROM lineitem
WHERE l_linestatus = 'F' GROUP BY l_returnflag
"""


# --- 8. exact count-distinct ----------------------------------------
def count_distinct(spark, sf_dir):
    # Exact, like the reference (executeCountDistinct :7329 —
    # approx_count_distinct is NOT reference semantics).
    return _li(spark, sf_dir).agg(F.countDistinct("l_partkey").alias("cnt_distinct"))


COUNT_DISTINCT_SQL = "SELECT count(DISTINCT l_partkey) AS cnt_distinct FROM lineitem"


# --- 9. compound predicate count ------------------------------------
def compound_filter_count(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .filter(
            (F.col("l_quantity") > 10)
            & (F.col("l_quantity") < 40)
            & (F.col("l_returnflag") == "R")
        )
        .agg(F.count("*").alias("cnt"))
    )


COMPOUND_FILTER_COUNT_SQL = """
SELECT count(*) AS cnt FROM lineitem
WHERE l_quantity > 10 AND l_quantity < 40 AND l_returnflag = 'R'
"""


# --- computed-expression aggregate ----------------------------------
def computed_agg(spark, sf_dir):
    # sum(price * (1 - discount)) with exact-decimal accumulation
    # (reference: ComputedAggregateDetectionStage.java:13-26 compiles
    # the arithmetic tree; overflow promotes to exact decimal).
    expr = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    return _li(spark, sf_dir).agg(
        F.sum(expr).cast("double").alias("revenue")
    )


COMPUTED_AGG_SQL = """
SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
       AS revenue
FROM lineitem
"""


# --- group-by with mixed aggregates (TPC-H Q1 shape; flagship) ------
def pricing_summary(spark, sf_dir):
    # The reference's executeGroupByAggregate (:7871) shape: one
    # group-by with count/sum/avg/min/max mix over computed columns.
    li = _li(spark, sf_dir).filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast(DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
    AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6)))
       AS DOUBLE) AS sum_charge,
  sum(l_quantity) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- sorted scan / top-k --------------------------------------------
def top_k_orders(spark, sf_dir):
    # TakeOrderedAndProject — the Spark analog of the reference's
    # sorted-scan + limit (SortedScanDetectionStage.java:16-29,
    # sortedTopKAppliedCount :8278). Tie-broken on key for determinism.
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOP_K_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --- multi-key order-by with per-key direction ----------------------
def multi_key_sort(spark, sf_dir):
    # order by k1 asc, k2 desc over a filtered scan
    # (SirixSortedScanExpr — N keys with per-key direction).
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .orderBy(F.col("p_brand").asc(), F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    )


MULTI_KEY_SORT_SQL = """
SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
WHERE p_size >= 40
ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC
"""


# --- covered-row projection -----------------------------------------
def covered_projection(spark, sf_dir):
    # Narrow projection + filter: Catalyst prunes the parquet scan to
    # exactly these columns (reference: covered-row materialization
    # from projection segments, RowMaterializeDetectionStage.java).
    return (
        _li(spark, sf_dir)
        .filter(F.col("l_shipdate") > F.lit("2001-06-01"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


COVERED_PROJECTION_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
WHERE l_shipdate > TIMESTAMP '2001-06-01'
"""


# --- rollup / cube (beyond reference: absent there, free in Spark) --
def rollup_counts(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


ROLLUP_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def cube_counts(spark, sf_dir):
    return (
        _li(spark, sf_dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


CUBE_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def grouping_sets_counts(spark, sf_dir):
    """Explicit GROUPING SETS (beyond reference, free in Spark):
    per-flag and per-status marginals in one pass — the shape rollup/
    cube can't express (no combined or grand-total row)."""
    _li(spark, sf_dir).createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


GROUPING_SETS_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


QUERIES = {
    "filter_count": Query(filter_count, FILTER_COUNT_SQL, ("analytics",)),
    "rollup_counts": Query(rollup_counts, ROLLUP_COUNTS_SQL, ("analytics", "extra")),
    "cube_counts": Query(cube_counts, CUBE_COUNTS_SQL, ("analytics", "extra")),
    "grouping_sets_counts": Query(
        grouping_sets_counts, GROUPING_SETS_COUNTS_SQL, ("analytics", "extra")
    ),
    "group_by_count": Query(group_by_count, GROUP_BY_COUNT_SQL, ("analytics",)),
    "sum_qty": Query(sum_qty, SUM_QTY_SQL, ("analytics",)),
    "avg_qty": Query(avg_qty, AVG_QTY_SQL, ("analytics",)),
    "min_max_qty": Query(min_max_qty, MIN_MAX_QTY_SQL, ("analytics",)),
    "group_by_2keys": Query(group_by_2keys, GROUP_BY_2KEYS_SQL, ("analytics",)),
    "filter_group_by": Query(filter_group_by, FILTER_GROUP_BY_SQL, ("analytics",)),
    "count_distinct": Query(count_distinct, COUNT_DISTINCT_SQL, ("analytics",)),
    "compound_filter_count": Query(
        compound_filter_count, COMPOUND_FILTER_COUNT_SQL, ("analytics",)
    ),
    "computed_agg": Query(computed_agg, COMPUTED_AGG_SQL, ("analytics",)),
    "pricing_summary": Query(pricing_summary, PRICING_SUMMARY_SQL, ("analytics", "flagship")),
    "top_k_orders": Query(top_k_orders, TOP_K_ORDERS_SQL, ("sort",)),
    "multi_key_sort": Query(multi_key_sort, MULTI_KEY_SORT_SQL, ("sort",)),
    "covered_projection": Query(covered_projection, COVERED_PROJECTION_SQL, ("projection",)),
}
