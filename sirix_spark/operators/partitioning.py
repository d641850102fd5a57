"""Physical-layout operators: time-bucketed partitioning and bucketed
tables for co-located joins.

These are the 100 TB levers the reference implements as index
structures, mapped to Spark-native layout:

- Time bucketing (partitionBy date) replaces the Relational Interval
  Tree valid-time index (RelationalIntervalTree.java:39, SURVEY.md
  §4 stage 10): a stabbing/range predicate prunes whole partitions
  at plan time (PartitionFilters), before any IO.
- Bucketing (bucketBy on the join key) replaces nothing in the
  reference (single-node has no shuffle) but is THE Spark answer to
  its "no shuffle" property: two tables bucketed on the same key
  join with zero Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_bucketed(
    df: DataFrame, path: str, ts_col: str = "ts", granularity: str = "day"
) -> None:
    """Write partitioned by a derived date bucket of `ts_col`.
    Readers filtering on `ts_col` ranges should filter on the bucket
    column too (or use read_time_range) to get partition pruning."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}[granularity]
    (
        df.withColumn("_bucket", F.date_format(F.col(ts_col), fmt))
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession, path: str, ts_col: str, start: str, end: str,
    granularity: str = "day",
) -> DataFrame:
    """Range read with partition pruning: the bucket predicate prunes
    directories, the ts predicate handles bucket edges."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}[granularity]
    df = spark.read.parquet(path)
    start_b = F.date_format(F.lit(start).cast("timestamp"), fmt)
    end_b = F.date_format(F.lit(end).cast("timestamp"), fmt)
    return df.filter(
        (F.col("_bucket") >= start_b)
        & (F.col("_bucket") <= end_b)
        & (F.col(ts_col) >= F.lit(start).cast("timestamp"))
        & (F.col(ts_col) <= F.lit(end).cast("timestamp"))
    ).drop("_bucket")


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Save as a bucketed managed table (co-location unit for
    shuffle-free joins)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables — with matching bucket specs
    Spark plans a SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
