"""Loaders for the driver-generated test tables (TESTDATA.md).

Reads stay lazy DataFrames so Catalyst can push filters/projections
into the parquet scan (PushedFilters / ReadSchema — the Spark analog
of the reference's zone-map page skip, SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small relative to facts: broadcast
# them in joins (reference: index nested-loop on tiny inputs; Spark:
# BroadcastHashJoin avoids the shuffle entirely).
BROADCAST_TABLES = ("region", "nation", "supplier", "part", "customer")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet timestamp[ns], which Spark's vectorized
    reader rejects. Read nanos as long, then truncate to microsecond
    timestamps — the same ns→µs truncation DuckDB applies, so oracle
    comparisons agree."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
