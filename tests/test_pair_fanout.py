"""Work-proportional pair-stage fan-out (r11, guide §2.2/§2.5).

AQE coalesces post-shuffle partitions by bytes and cannot see the B²
pair expansion of the posting groupBy, so jaccard_near_dup's pair
stage ran on 4 of 32 cores at sf0.1 (r10 verdict top lead). The fix
keys the posting shuffle with an explicit repartition sized
postings // _POSTINGS_PER_TASK (no defaultParallelism floor — that
was measured to hurt the tiny banded-LSH stages). These tests pin:
the width math, plan reuse (the groupBy must NOT add a second
exchange over the explicit one), and the leave-AQE-alone cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _words(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("string").alias("w")
    )


def test_small_input_leaves_aqe_in_charge(spark):
    from sirix_spark.queries.dedup import _POSTINGS_PER_TASK, _posting_fanout

    df = _words(spark, 10)
    # below 2 tasks of budget, or unknown postings: unchanged plan
    assert _posting_fanout(df, _POSTINGS_PER_TASK) is df
    assert _posting_fanout(df, None) is df


def test_width_two_regimes(spark):
    from sirix_spark.queries.dedup import (
        _FANOUT_CAP,
        _POSTINGS_PER_TASK,
        _POSTINGS_PER_TASK_LARGE,
        _posting_fanout,
    )

    cores = spark.sparkContext.defaultParallelism
    df = _words(spark, 10)
    # saturation regime: one task per 8k postings, up to the cores
    out = _posting_fanout(df, 10 * _POSTINGS_PER_TASK)
    assert out is not df
    assert out.rdd.getNumPartitions() == min(10, cores)
    # beyond saturation: rows-proportional (512k postings per task),
    # never pinned at the core count (bounded per-task bucket state)
    big = 100 * cores * _POSTINGS_PER_TASK_LARGE
    out = _posting_fanout(df, big)
    assert out.rdd.getNumPartitions() == 100 * cores
    # capped at any scale
    out = _posting_fanout(df, (_FANOUT_CAP + 5) * _POSTINGS_PER_TASK_LARGE)
    assert out.rdd.getNumPartitions() == _FANOUT_CAP


def test_groupby_reuses_explicit_exchange(spark):
    """The explicit repartition must be the ONLY shuffle feeding the
    posting groupBy (same key → EnsureRequirements adds nothing), and
    it must be REPARTITION_BY_NUM so AQE cannot coalesce it."""
    from sirix_spark.queries.dedup import _POSTINGS_PER_TASK, _posting_fanout

    df = _posting_fanout(_words(spark, 100), 4 * _POSTINGS_PER_TASK)
    grouped = df.groupBy("w").agg(F.collect_list("doc_id").alias("ds"))
    plan = grouped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan, plan
