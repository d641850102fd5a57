"""Semantics-corner queries — the parity points SURVEY.md §7 flags as
hard, each pinned against the DuckDB oracle:

- null-skipping aggregates vs row counts (`count($r)` counts records,
  aggregates skip missing — FIXTURES.md §2 rules, reference
  TypedGroupByDifferentialTest.java).
- exact-decimal overflow promotion (JsonNumber semantics,
  ComputedAggregateDetectionStage.java:22-26: integer overflow
  promotes to exact decimal, never wraps or goes lossy-double).
- null group keys (group-by over a sparse key).
- scalar function library (fn:/math:/string/date surface of §2.10).
- quantified some/every over sequences (Brackit quantified exprs →
  exists/forall higher-order functions).
- deep-equal on structured values (fn:deep-equal → struct equality).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load

DEC = "decimal(18,6)"


# --- count(*) vs count(col) vs aggregates over a nullable column ----
def null_semantics(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # value is "missing" (NULL) for error events — a derived sparse field
    v = F.when(F.col("event_type") != "error", F.col("value"))
    return (
        ev.withColumn("v", v)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_vals"),
            F.sum(F.col("v").cast(DEC)).cast("double").alias("sum_v"),
            F.min("v").alias("min_v"),
        )
    )


NULL_SEMANTICS_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       count(v) AS n_vals,
       CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
       min(v) AS min_v
FROM (SELECT event_type,
             CASE WHEN event_type <> 'error' THEN value END AS v
      FROM events)
GROUP BY event_type
"""


# --- null group keys -------------------------------------------------
def null_group_key(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.when(F.col("value") > 50, F.col("event_type"))  # NULL for low values
    return ev.groupBy(k.alias("k")).agg(F.count("*").alias("cnt"))


NULL_GROUP_KEY_SQL = """
SELECT CASE WHEN value > 50 THEN event_type END AS k, count(*) AS cnt
FROM events GROUP BY 1
"""


# --- exact-decimal overflow promotion -------------------------------
def decimal_overflow_sum(spark, sf_dir):
    # sum(orderkey * 10^12) overflows int64 at any real scale; the
    # reference promotes to exact decimal (never wraps, never double)
    big = F.col("o_orderkey").cast("decimal(38,0)") * F.lit(1_000_000_000_000)
    return (
        load(spark, sf_dir, "orders")
        .agg(F.sum(big).alias("s"))
        .select(F.col("s").cast("string").alias("big_sum"))
    )


DECIMAL_OVERFLOW_SUM_SQL = """
SELECT CAST(sum(CAST(o_orderkey AS HUGEINT) * 1000000000000) AS VARCHAR) AS big_sum
FROM orders
"""


# --- scalar function library (string/date/math) ---------------------
def scalar_functions(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("up"),
        F.lower("o_orderpriority").alias("lo"),
        F.substring("o_orderpriority", 3, 4).alias("sub"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("cat"),
        F.length("o_orderpriority").alias("len"),
        F.lpad(F.col("o_orderkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("repl"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.abs(F.col("o_totalprice") * -1).alias("absv"),
        F.round(F.col("o_totalprice"), 0).alias("rounded"),
        F.floor(F.col("o_totalprice")).cast("long").alias("flr"),
        F.ceil(F.col("o_totalprice")).cast("long").alias("cl"),
        (F.col("o_orderkey") % 7).alias("mod7"),
    )


SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       upper(o_orderstatus) AS up,
       lower(o_orderpriority) AS lo,
       substring(o_orderpriority, 3, 4) AS sub,
       concat_ws('-', o_orderstatus, o_orderpriority) AS cat,
       length(o_orderpriority) AS len,
       lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS padded,
       replace(o_orderpriority, '-', '_') AS repl,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofmonth(o_orderdate) AS dom,
       abs(o_totalprice * -1) AS absv,
       round(o_totalprice, 0) AS rounded,
       CAST(floor(o_totalprice) AS BIGINT) AS flr,
       CAST(ceil(o_totalprice) AS BIGINT) AS cl,
       o_orderkey % 7 AS mod7
FROM orders WHERE o_orderkey < 100
"""


# --- quantified some / every ----------------------------------------
def quantified_some_every(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.exists(words, lambda w: w == "spark").alias("has_spark"),
        F.forall(words, lambda w: F.length(w) <= 6).alias("all_short"),
    )


QUANTIFIED_SQL = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0 AS has_spark,
       len(list_filter(string_split(text, ' '), w -> length(w) > 6)) = 0 AS all_short
FROM documents
"""


# --- deep-equal on structured values --------------------------------
def deep_equal_count(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pair = F.struct(F.col("l_returnflag"), F.col("l_linestatus"))
    target = F.struct(F.lit("R").alias("l_returnflag"), F.lit("F").alias("l_linestatus"))
    return li.filter(pair == target).agg(F.count("*").alias("cnt"))


DEEP_EQUAL_SQL = """
SELECT count(*) AS cnt FROM lineitem
WHERE (l_returnflag, l_linestatus) = ('R', 'F')
"""


# --- conditional expressions (case / coalesce / nullif) -------------
def conditional_exprs(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") >= 7500, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .otherwise("bronze")
    )
    return (
        c.select(
            "c_custkey",
            tier.alias("tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(b)")).alias(
                "seg"
            ),
        )
    )


CONDITIONAL_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal >= 7500 THEN 'gold'
            WHEN c_acctbal >= 2500 THEN 'silver'
            ELSE 'bronze' END AS tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg
FROM customer
"""


# --- scalar function library, batch 2 --------------------------------
def scalar_functions2(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)-", 1).alias("prio_num"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("mo_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.instr("o_orderpriority", "-").alias("dash_pos"),
        F.repeat(F.col("o_orderstatus"), 3).alias("st3"),
        F.reverse(F.col("o_orderpriority")).alias("rev"),
        F.translate("o_orderpriority", "-", "_").alias("trans"),
        F.left(F.col("o_orderpriority"), F.lit(3)).alias("l3"),
        F.right(F.col("o_orderpriority"), F.lit(3)).alias("r3"),
    )


SCALAR_FUNCTIONS2_SQL = r"""
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '^(\d+)-', 1) AS prio_num,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mo_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       strpos(o_orderpriority, '-') AS dash_pos,
       repeat(o_orderstatus, 3) AS st3,
       reverse(o_orderpriority) AS rev,
       translate(o_orderpriority, '-', '_') AS trans,
       left(o_orderpriority, 3) AS l3,
       right(o_orderpriority, 3) AS r3
FROM orders WHERE o_orderkey < 100
"""


# --- statistical aggregates (explicit formulas over exact sums) -----
def stats_agg(spark, sf_dir):
    """var/stddev/covar expressed over exact decimal sums so both
    engines compute identical doubles (built-in stddev/var use
    engine-specific streaming algorithms that drift in the last
    ulps)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_discount").cast("decimal(18,6)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((F.col("l_discount") * F.col("l_discount")).cast("decimal(18,12)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_qty"),
        F.floor(var_x * 10000).cast("bigint").alias("var_qty_e4"),
        F.floor(F.sqrt(var_y) * 1000000).cast("bigint").alias("std_disc_e6"),
    )


STATS_AGG_SQL = """
SELECT l_returnflag, n,
       sx / n AS mean_qty,
       CAST(floor((sxx - sx * sx / n) / (n - 1) * 10000) AS BIGINT) AS var_qty_e4,
       CAST(floor(sqrt((syy - sy * sy / n) / (n - 1)) * 1000000) AS BIGINT) AS std_disc_e6
FROM (
  SELECT l_returnflag,
         count(*) AS n,
         sum(l_quantity) AS sx,
         sum(l_quantity * l_quantity) AS sxx,
         CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_discount * l_discount AS DECIMAL(18,12))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
"""


# --- scalar subquery --------------------------------------------------
def above_avg_orders(spark, sf_dir):
    """Orders above the global average price (scalar subquery →
    broadcast single-row join)."""
    o = load(spark, sf_dir, "orders")
    avg_price = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
            "ap"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("ap"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


ABOVE_AVG_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS cnt FROM orders
WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                             / count(*) FROM orders)
GROUP BY o_orderpriority
"""


# --- ordered string aggregation --------------------------------------
def string_agg_nations(spark, sf_dir):
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


STRING_AGG_NATIONS_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- exact percentile (interpolated median) --------------------------
def median_price(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.floor(F.expr("percentile(o_totalprice, 0.5)") * 100).cast("bigint").alias(
            "median_e2"
        )
    )


MEDIAN_PRICE_SQL = """
SELECT o_orderpriority,
       CAST(floor(quantile_cont(o_totalprice, 0.5) * 100) AS BIGINT) AS median_e2
FROM orders GROUP BY o_orderpriority
"""


QUERIES = {
    "null_semantics": Query(null_semantics, NULL_SEMANTICS_SQL, ("semantics",)),
    "scalar_functions2": Query(scalar_functions2, SCALAR_FUNCTIONS2_SQL, ("functions",)),
    "stats_agg": Query(stats_agg, STATS_AGG_SQL, ("analytics",)),
    "above_avg_orders": Query(above_avg_orders, ABOVE_AVG_ORDERS_SQL, ("semantics",)),
    "string_agg_nations": Query(string_agg_nations, STRING_AGG_NATIONS_SQL, ("functions",)),
    "median_price": Query(median_price, MEDIAN_PRICE_SQL, ("analytics",)),
    "null_group_key": Query(null_group_key, NULL_GROUP_KEY_SQL, ("semantics",)),
    "decimal_overflow_sum": Query(
        decimal_overflow_sum, DECIMAL_OVERFLOW_SUM_SQL, ("semantics",)
    ),
    "scalar_functions": Query(scalar_functions, SCALAR_FUNCTIONS_SQL, ("functions",)),
    "quantified_some_every": Query(quantified_some_every, QUANTIFIED_SQL, ("semantics",)),
    "deep_equal_count": Query(deep_equal_count, DEEP_EQUAL_SQL, ("semantics",)),
    "conditional_exprs": Query(conditional_exprs, CONDITIONAL_SQL, ("functions",)),
}
