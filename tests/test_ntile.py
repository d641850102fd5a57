"""Distributed exact ntile (operators/ntile.py) — round 10 closes
the carried windows-family scale residual: exact ntile no longer
moves the data through a single-partition window.

The gate is DIFFERENTIAL: exact_ntile must equal F.ntile over the
same total order on every row, across sizes that exercise the
rank→bucket closed form (remainder buckets, n > rows, heavy ties
with tiebreaker), plus a plan shape pin: the only SinglePartition
exchange left is the P-row per-partition-counts frame, and the
data-path window partitions by spark_partition_id (parallel)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sirix_spark.operators.ntile import exact_ntile


@pytest.mark.parametrize(
    "rows,n",
    [(1, 4), (3, 4), (997, 4), (1000, 7), (50, 50), (20, 64)],
)
def test_matches_window_ntile(spark, rows, n):
    rng = random.Random(rows * 31 + n)
    data = [(rng.randrange(0, 5), i) for i in range(rows)]
    df = spark.createDataFrame(data, "v int, id int")
    mine = {
        (r.v, r.id): r.t
        for r in exact_ntile(df, n, ["v", "id"], "t").collect()
    }
    ref = {
        (r.v, r.id): r.t
        for r in df.withColumn(
            "t", F.ntile(n).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert mine == ref


def test_plan_is_parallel(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    plan = (
        exact_ntile(df, 4, ["v", "id"], "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only single-partition stage is the tiny offsets frame (one
    # row per range partition); the data rides rangepartitioning and
    # the per-partition row number is the map-only
    # monotonically_increasing_id decomposition — no second exchange
    # of the data (r10: the old __pid-partitioned window hash-
    # repartitioned everything again)
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Exchange rangepartitioning" in plan, plan
    assert "monotonically_increasing_id" in plan, plan
    # the DATA never rides a __pid-partitioned row_number window
    # (whose hash repartition was the second full exchange); the only
    # hashpartitioning(__pid) left is the counts aggregation — one
    # row per range partition
    assert "row_number()" not in plan, plan


def test_registry_query_uses_distributed_ntile(spark, sf_dir):
    from sirix_spark.queries import registry

    plan = (
        registry()["ntile_value_quartiles"].fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile(" not in plan, "single-partition window ntile is back"
    assert "monotonically_increasing_id" in plan
    assert "row_number()" not in plan
