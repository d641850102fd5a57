"""Temporal operator family — the reference's distinguishing feature
set (SURVEY.md §2.7), expressed over the `events` table where
`user_id` plays the stable record key and `ts` the revision axis.
(The full snapshot/manifest time-travel store lives in
sirix_spark.store; these registry entries pin the *semantics* of each
temporal operator against a SQL oracle.)

Reference parity:
- jn:previous / jn:next      → lag/lead over (key, ts) window
  (PreviousAxis.java / NextAxis.java).
- jn:first / jn:last         → min_by/max_by per key
  (First.java / Last.java).
- jn:all-times               → ordered history per key
  (AllTimeAxis.java:20).
- sdb:item-history           → revisions where the value changed
  (ItemHistory.java:40).
- jn:valid-at                → interval stabbing (ValidAt.java:45,
  RelationalIntervalTree.java:39 — Spark needs no interval tree:
  the predicate prunes via parquet stats / partition pruning).
- jn:diff                    → keyed full-outer join between two
  snapshots → insert/update/delete ops (BasicJsonDiff.java:21).

Scale notes: every operator here is one shuffle by the record key;
windows never need more than (key, ts) ordering. No driver-side
loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sirix_spark.queries import Query
from sirix_spark.queries.joins import _dedup_events_per_ts
from sirix_spark.tables import load

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _events(spark, sf_dir) -> DataFrame:
    return _dedup_events_per_ts(load(spark, sf_dir, "events"))


_DEDUP_CTE = """
ev AS (
  SELECT user_id, ts,
         arg_max(value, event_id) AS value,
         arg_max(event_type, event_id) AS event_type
  FROM events GROUP BY user_id, ts
)
"""


# --- jn:previous / jn:next ------------------------------------------
def previous_next_event(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts")
    return _events(spark, sf_dir).select(
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


PREVIOUS_NEXT_SQL = f"""
WITH {_DEDUP_CTE}
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
       lag(value)  OVER (PARTITION BY user_id ORDER BY ts) AS prev_value,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS next_value
FROM ev
"""


# --- jn:first / jn:last ---------------------------------------------
def first_last_event(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.min_by("value", "ts").alias("first_value"),
            F.max_by("value", "ts").alias("last_value"),
            F.date_format(F.min("ts"), TS_FMT).alias("first_ts"),
            F.date_format(F.max("ts"), TS_FMT).alias("last_ts"),
        )
    )


FIRST_LAST_SQL = f"""
WITH {_DEDUP_CTE}
SELECT user_id,
       arg_min(value, ts) AS first_value,
       arg_max(value, ts) AS last_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM ev GROUP BY user_id
"""


# --- jn:all-times ----------------------------------------------------
def all_times(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id") <= 10)
        .select(
            "user_id",
            F.date_format("ts", TS_FMT).alias("ts"),
            "event_type",
            "value",
        )
    )


ALL_TIMES_SQL = f"""
WITH {_DEDUP_CTE}
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type, value
FROM ev WHERE user_id <= 10
"""


# --- sdb:item-history (revisions where the item changed) ------------
def item_history(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts")
    ev = _events(spark, sf_dir).withColumn("prev_type", F.lag("event_type").over(w))
    changed = ev.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    return changed.groupBy("user_id").agg(F.count("*").alias("n_changes"))


ITEM_HISTORY_SQL = f"""
WITH {_DEDUP_CTE},
hist AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
  FROM ev
)
SELECT user_id, count(*) AS n_changes
FROM hist WHERE prev_type IS NULL OR event_type <> prev_type
GROUP BY user_id
"""


# --- ranking window (for $i at $pos analog, SURVEY.md §2.5) ---------
def top_events_per_user(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 2)
        .select("user_id", "pos", "event_id", "value")
    )


TOP_EVENTS_PER_USER_SQL = """
SELECT user_id, pos, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, ts ASC, event_id ASC) AS pos
  FROM events
) WHERE pos <= 2
"""


# --- jn:valid-at (interval stabbing) --------------------------------
STAB_TS = "2024-01-15 00:00:00"


def valid_at(spark, sf_dir):
    """Each event's value is valid from its ts until the user's next
    event: stab that interval set at STAB_TS. This is the reference's
    valid-time stabbing query (validFrom <= t AND t <= validTo) with
    intervals derived from the event stream."""
    w = Window.partitionBy("user_id").orderBy("ts")
    iv = _events(spark, sf_dir).select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    t = F.lit(STAB_TS).cast("timestamp")
    return iv.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    ).select(
        "user_id",
        "value",
        F.date_format("valid_from", TS_FMT).alias("valid_from"),
    )


VALID_AT_SQL = f"""
WITH {_DEDUP_CTE},
iv AS (
  SELECT user_id, value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
  FROM ev
)
SELECT user_id, value, strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from
FROM iv
WHERE valid_from <= TIMESTAMP '{STAB_TS}'
  AND (valid_to IS NULL OR TIMESTAMP '{STAB_TS}' < valid_to)
"""


# --- jn:diff (snapshot diff as keyed outer join) --------------------
DIFF_T1 = "2024-01-10 00:00:00"
DIFF_T2 = "2024-01-20 00:00:00"


def snapshot_diff(spark, sf_dir):
    """Record-level diff between the state at T1 and T2 → JSON-patch
    style ops (insert/update/delete), keyed by record identity.
    Reference: BasicJsonDiff.java:21 / JsonDiffSerializer.java.

    ONE shuffle: both snapshot states come from conditional
    aggregates (max_by ... FILTER) in a single groupBy — no
    per-snapshot aggregation or full-outer join. (user_id, ts) is
    unique in the events table (verified at every sf), so
    max_by(value, ts) is unambiguous; the append-only stream means
    'delete' cannot occur."""
    ev = load(spark, sf_dir, "events")
    states = ev.groupBy("user_id").agg(
        F.expr(
            f"max_by(value, ts) FILTER (WHERE ts <= TIMESTAMP '{DIFF_T1}')"
        ).alias("old_value"),
        F.expr(
            f"max_by(value, ts) FILTER (WHERE ts <= TIMESTAMP '{DIFF_T2}')"
        ).alias("new_value"),
    )
    return states.select(
        "user_id",
        F.when(
            F.col("old_value").isNull() & F.col("new_value").isNull(), F.lit("absent")
        )
        .when(F.col("old_value").isNull(), F.lit("insert"))
        .when(F.col("new_value").isNull(), F.lit("delete"))
        .when(F.col("old_value") != F.col("new_value"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("op"),
        "old_value",
        "new_value",
    ).filter(~F.col("op").isin("unchanged", "absent"))


SNAPSHOT_DIFF_SQL = f"""
WITH states AS (
  SELECT user_id,
         arg_max(value, ts) FILTER (ts <= TIMESTAMP '{DIFF_T1}')
           AS old_value,
         arg_max(value, ts) FILTER (ts <= TIMESTAMP '{DIFF_T2}')
           AS new_value
  FROM events GROUP BY user_id
)
SELECT user_id, op, old_value, new_value FROM (
  SELECT user_id,
         CASE WHEN old_value IS NULL AND new_value IS NULL THEN 'absent'
              WHEN old_value IS NULL THEN 'insert'
              WHEN new_value IS NULL THEN 'delete'
              WHEN old_value <> new_value THEN 'update'
              ELSE 'unchanged' END AS op,
         old_value, new_value
  FROM states
) WHERE op NOT IN ('unchanged', 'absent')
"""


# --- sessionization (custom operator; batch semantics) --------------
def sessionize_events(spark, sf_dir):
    from sirix_spark.operators.sessionize import session_stats

    return session_stats(load(spark, sf_dir, "events"), gap_seconds=6 * 3600)


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS session_start_s,
       CAST(epoch_us(max(ts)) // 1000000 AS BIGINT) AS session_end_s
FROM s GROUP BY user_id, session_id
"""
# session_id comes from a window sum → HUGEINT in DuckDB → Decimal on
# an Arrow fetch; the BIGINT cast restores hash parity with Spark's
# long (this, not tz, was the round-1 driver-red cause — load() pins
# the session tz to UTC on any session). Bounds are epoch seconds on
# both sides so no string rendering is involved at all.


# --- window frames (beyond reference — SURVEY.md §2.5 notes the
# reference has no analytic windows; positional $pos is the closest.
# These pin the full frame family: running, sliding, rank, ntile) ----
DEC = "decimal(18,6)"


def running_sum_per_user(spark, sf_dir):
    # Cumulative frame. value is decimal-valued double: accumulate as
    # exact decimal so partition/merge order can't perturb bits
    # (same contract as analytics.py).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


RUNNING_SUM_SQL = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_value
FROM events
"""


def moving_avg_per_user(spark, sf_dir):
    # Sliding ROWS frame; avg as exact-sum / count for bit parity.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("*").over(w))
        .alias("moving_avg"),
    )


MOVING_AVG_SQL = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         / count(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def dense_rank_orders(spark, sf_dir):
    # Ties share a rank, so rank<=3 is a deterministic row set even
    # though per-tie emission order isn't (driver compare sorts).
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        load(spark, sf_dir, "orders")
        .withColumn("drank", F.dense_rank().over(w))
        .filter(F.col("drank") <= 3)
        .select("o_orderpriority", "drank", "o_orderkey", "o_totalprice")
    )


DENSE_RANK_SQL = """
SELECT o_orderpriority, drank, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         dense_rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS drank
  FROM orders
) WHERE drank <= 3
"""


def ntile_value_quartiles(spark, sf_dir):
    # ntile over a total order (event_id tiebreak) → deterministic
    # bucket assignment; emit per-bucket stats, not per-row tiles.
    # Round 10 closes the carried scale residual: exact ntile now
    # computes via operators/ntile.exact_ntile — range-partitioned
    # sort + per-partition offsets + the closed-form rank→bucket map
    # — every stage parallel, NO single-partition window, same exact
    # semantics (the DuckDB ntile oracle is unchanged and stays the
    # value-level gate).
    from sirix_spark.operators.ntile import exact_ntile

    return (
        exact_ntile(
            load(spark, sf_dir, "events"), 4, ["value", "event_id"],
            output="quartile",
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


NTILE_SQL = """
SELECT quartile, count(*) AS cnt,
       min(value) AS min_value, max(value) AS max_value
FROM (SELECT value, ntile(4) OVER (ORDER BY value, event_id) AS quartile
      FROM events)
GROUP BY quartile
"""


QUERIES = {
    "previous_next_event": Query(previous_next_event, PREVIOUS_NEXT_SQL, ("temporal",)),
    "running_sum_per_user": Query(running_sum_per_user, RUNNING_SUM_SQL, ("window",)),
    "moving_avg_per_user": Query(moving_avg_per_user, MOVING_AVG_SQL, ("window",)),
    "dense_rank_orders": Query(dense_rank_orders, DENSE_RANK_SQL, ("window",)),
    "ntile_value_quartiles": Query(ntile_value_quartiles, NTILE_SQL, ("window",)),
    "sessionize_events": Query(sessionize_events, SESSIONIZE_SQL, ("temporal", "custom")),
    "first_last_event": Query(first_last_event, FIRST_LAST_SQL, ("temporal",)),
    "all_times": Query(all_times, ALL_TIMES_SQL, ("temporal",)),
    "item_history": Query(item_history, ITEM_HISTORY_SQL, ("temporal",)),
    "top_events_per_user": Query(top_events_per_user, TOP_EVENTS_PER_USER_SQL, ("window",)),
    "valid_at": Query(valid_at, VALID_AT_SQL, ("temporal", "bitemporal")),
    "snapshot_diff": Query(snapshot_diff, SNAPSHOT_DIFF_SQL, ("temporal", "diff")),
}
