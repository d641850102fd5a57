"""Join family — equi/broadcast/semi/anti/as-of joins.

Reference parity (SURVEY.md §2.3):
- FLWOR equi-join + reordering: JoinFusionWalker /
  AdaptiveJoinOrderOptimizer.java:8-22 → Spark join selection + CBO
  join reorder + AQE.
- semi/anti: quantified some/every + exists()/empty() (Brackit) →
  left_semi / left_anti.
- as-of (valid-time stabbing against the closest earlier version):
  ValidAt.java:45 / temporal join docs/ARCHITECTURE.md:467-487 →
  union + last(ignorenulls) window, the shuffle-once scalable form.

Scale notes: dims are broadcast (no shuffle of the fact side);
fact-fact joins shuffle on the join key and AQE handles skew. The
as-of join is ONE shuffle of events∪orders by user — never an
exploding inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.tables import load

DEC = "decimal(18,6)"


# --- broadcast dim join chain ---------------------------------------
def customers_per_region(spark, sf_dir):
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("cnt"))
    )


CUSTOMERS_PER_REGION_SQL = """
SELECT r_name, count(*) AS cnt
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- fact-fact shuffle join + aggregate -----------------------------
def revenue_by_priority(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


REVENUE_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# --- 3-way join with filters (pushdown showcase) --------------------
def national_revenue(spark, sf_dir):
    # customer ⋈ orders ⋈ lineitem ⋈ nation, filters pushed to scans;
    # CBO/AQE pick broadcast for customer/nation.
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


NATIONAL_REVENUE_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l_returnflag = 'R'
GROUP BY n_name
"""


# --- semi join (EXISTS) ---------------------------------------------
def semi_join_customers(spark, sf_dir):
    # customers having at least one URGENT order, per market segment
    # (reference: exists() quantified expr → left_semi).
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


SEMI_JOIN_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS cnt FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --- anti join (NOT EXISTS) -----------------------------------------
def anti_join_customers(spark, sf_dir):
    # customers with NO order above 400k (reference:
    # not(exists(...)) → left_anti, JsonIntegrationTest.java usage).
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


ANTI_JOIN_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS cnt FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
"""


# --- as-of join ------------------------------------------------------
def _dedup_events_per_ts(events: DataFrame) -> DataFrame:
    # Deterministic tie-break: one event per (user_id, ts), keeping
    # the max event_id (matches the oracle's arg_max).
    #
    # Single-exchange form (r10 optimization, guide §2.4): partition
    # by user_id ONLY and order (ts asc, event_id desc) — the first
    # row of each equal-ts run is exactly the max-event_id row of
    # that (user_id, ts) group. Every consumer of the dedup'd stream
    # then windows/aggregates by user_id with a ts-ascending order,
    # so this one Exchange + Sort is laid down once and REUSED; the
    # previous shape (window partitioned by (user_id, ts), then the
    # consumer's window by user_id) paid a second Exchange + Sort in
    # every temporal query
    # (plans/r10/previous_next_event_{before,after}.txt: 2 → 1
    # Exchange; A/B-measured 0.38 → 0.27 s).
    #
    # The run-boundary test lags a STRUCT, not the bare ts: lag's
    # partition-head NULL would otherwise be indistinguishable from a
    # genuine NULL ts under eqNullSafe and the first row of a null-ts
    # run would be dropped (the oracle's GROUP BY keeps the null
    # group). A lagged struct is NULL only when no previous row
    # exists, and struct(NULL) != NULL, so the head of every run —
    # including a null-ts run — survives the filter.
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("_prev", F.lag(F.struct(F.col("ts"))).over(w))
        .filter(~F.col("_prev").eqNullSafe(F.struct(F.col("ts"))))
        .drop("_prev")
    )


def asof_join_orders_events(spark, sf_dir):
    """For each order, the most recent event of that customer at or
    before the order date (events.user_id keys overlap the low
    custkeys; left as-of → nulls elsewhere).

    Implementation: tag-union both sides, ONE shuffle by key, then
    last(ignorenulls) over an ordered window — the scalable as-of
    form (no range-explosion join). Reference: valid-time stabbing
    ValidAt.java:45; Spark has no ASOF JOIN operator, this is the
    idiomatic composition.

    Tie-break (several events at the same (user, ts)): the window
    orders by event_id last, so `last()` picks the max event_id —
    arg_max semantics WITHOUT a separate dedup shuffle.
    """
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")

    ev = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("tie"),
        F.struct(F.col("ts").alias("ev_ts"), F.col("value").alias("ev_value")).alias("ev"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    od = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("tie"),
        F.lit(None)
        .cast("struct<ev_ts:timestamp,ev_value:double>")
        .alias("ev"),
        F.col("o_orderkey"),
    )
    # events sort before orders at equal timestamps => "at or before";
    # among equal-ts events the max event_id sorts last and wins.
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("side").asc(), F.col("tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = ev.unionByName(od).withColumn("last_ev", F.last("ev", ignorenulls=True).over(w))
    return (
        unioned.filter(F.col("side") == 1)
        .select(
            "o_orderkey",
            F.date_format(F.col("last_ev.ev_ts"), "yyyy-MM-dd HH:mm:ss").alias("ev_ts"),
            F.col("last_ev.ev_value").alias("ev_value"),
        )
    )


ASOF_JOIN_SQL = """
WITH ev AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, ts
)
SELECT o.o_orderkey,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ev_ts,
       e.value AS ev_value
FROM orders o
ASOF LEFT JOIN ev e
  ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
"""


# --- outer joins -----------------------------------------------------
def left_outer_join(spark, sf_dir):
    # every customer with their URGENT-order count (0 for none) —
    # outer-join null semantics pinned against the oracle.
    customer = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_outer")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
        )
    )


LEFT_OUTER_JOIN_SQL = """
SELECT c_custkey, coalesce(n_urgent, 0) AS n_urgent
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n_urgent FROM orders
           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
  ON c_custkey = u.o_custkey
"""


def full_outer_summary(spark, sf_dir):
    # full-outer of two aggregate views keyed by custkey: spenders vs
    # event actors (user_id domain only overlaps low custkeys).
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )
    acts = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count("*").alias("n_events"))
    )
    return (
        spend.join(acts, "k", "full_outer")
        .select(
            "k",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


FULL_OUTER_SUMMARY_SQL = """
SELECT COALESCE(s.k, a.k) AS k,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_events, 0) AS n_events
FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) s
FULL OUTER JOIN (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1) a
  ON s.k = a.k
"""


# --- range (band) join ----------------------------------------------
def range_join_price_bands(spark, sf_dir):
    """Non-equi join of parts against price bands (broadcast the band
    table → BroadcastNestedLoopJoin, no shuffle of the fact side;
    the reference's generic theta-join case)."""
    bands = spark.createDataFrame(
        [("low", 0.0, 930.0), ("mid", 930.0, 970.0), ("high", 970.0, 1e9)],
        "band string, lo double, hi double",
    )
    part = load(spark, sf_dir, "part")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("cnt"))
    )


RANGE_JOIN_SQL = """
SELECT band, count(*) AS cnt
FROM part
JOIN (VALUES ('low', 0.0, 930.0), ('mid', 930.0, 970.0), ('high', 970.0, 1e9))
     b(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --- shipping priority (TPC-H Q3 shape): the composite pipeline -----
def shipping_priority(spark, sf_dir):
    # Selective dim filter broadcast into two fact scans, shuffle agg
    # on the order key, then TakeOrderedAndProject for the top-10 —
    # one plan exercising pushdown + broadcast + partial agg + top-k
    # together. Tiebreak on unique l_orderkey keeps LIMIT
    # deterministic; revenue bits match via the decimal contract.
    cutoff = "1998-06-01"
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


QUERIES = {
    "customers_per_region": Query(customers_per_region, CUSTOMERS_PER_REGION_SQL, ("join",)),
    "shipping_priority": Query(shipping_priority, SHIPPING_PRIORITY_SQL, ("join", "topk")),
    "left_outer_join": Query(left_outer_join, LEFT_OUTER_JOIN_SQL, ("join",)),
    "full_outer_summary": Query(full_outer_summary, FULL_OUTER_SUMMARY_SQL, ("join",)),
    "range_join_price_bands": Query(range_join_price_bands, RANGE_JOIN_SQL, ("join",)),
    "revenue_by_priority": Query(revenue_by_priority, REVENUE_BY_PRIORITY_SQL, ("join",)),
    "national_revenue": Query(national_revenue, NATIONAL_REVENUE_SQL, ("join",)),
    "semi_join_customers": Query(semi_join_customers, SEMI_JOIN_CUSTOMERS_SQL, ("join",)),
    "anti_join_customers": Query(anti_join_customers, ANTI_JOIN_CUSTOMERS_SQL, ("join",)),
    "asof_join_orders_events": Query(asof_join_orders_events, ASOF_JOIN_SQL, ("join", "temporal")),
}
