"""Round-11 fixes, pinned (ADVICE r10 items).

1. _dedup_events_per_ts keeps null-ts events (ADVICE r10 medium):
   the r10 lag-based run-boundary filter compared lag(ts) to ts with
   eqNullSafe, so the partition-head NULL was indistinguishable from
   a genuine NULL ts and the first row of a null-ts run was dropped.
   The oracle's GROUP BY keeps the null group, so any input with a
   null ts diverged. Fixed by lagging a struct (NULL only when no
   previous row exists; struct(NULL) != NULL).
2. perm_sexpr is outer-parenthesized like perm_sql (ADVICE r10 low) —
   tree equality with the Column twin stays pinned by
   tests/test_expr_twins.py.
"""

from __future__ import annotations

import datetime


def test_dedup_events_keeps_null_ts_run(spark):
    from pyspark.sql import functions as F

    from sirix_spark.queries.joins import _dedup_events_per_ts

    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two null-ts events (a run) + one real ts
        (1, None, "a", 1.0, 10),
        (1, None, "a", 2.0, 11),
        (1, t1, "b", 3.0, 12),
        # user 2: only null-ts events
        (2, None, "c", 4.0, 20),
        (2, None, "c", 5.0, 21),
        (2, None, "c", 6.0, 22),
        # user 3: equal non-null ts run (the common case)
        (3, t1, "d", 7.0, 30),
        (3, t1, "d", 8.0, 31),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id int, ts timestamp, event_type string, value double, "
        "event_id int",
    )
    got = {
        (r.user_id, r.ts): (r.event_id, r.value)
        for r in _dedup_events_per_ts(events).collect()
    }
    # One survivor per (user_id, ts) group INCLUDING the null-ts
    # groups, each the max-event_id row (arg_max semantics).
    assert got == {
        (1, None): (11, 2.0),
        (1, t1): (12, 3.0),
        (2, None): (22, 6.0),
        (3, t1): (31, 8.0),
    }


def test_dedup_events_no_null_unchanged(spark):
    """The all-non-null path (the bundled data's regime) must keep the
    exact r10 semantics: first row of each equal-ts run survives."""
    from sirix_spark.queries.joins import _dedup_events_per_ts

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 1, 2)
    events = spark.createDataFrame(
        [(1, t1, "x", 1.0, 1), (1, t1, "x", 2.0, 2), (1, t2, "y", 3.0, 3)],
        "user_id int, ts timestamp, event_type string, value double, "
        "event_id int",
    )
    got = sorted(
        (r.user_id, r.ts, r.event_id)
        for r in _dedup_events_per_ts(events).collect()
    )
    assert got == [(1, t1, 2), (1, t2, 3)]
