"""Deterministic fixture generators mirroring the reference's bench
dataset shape (FIXTURES.md §1; GeneratedRecordsReader.java:22-56
defines {id, age 18..65, dept/city 8 values, active} with a fixed
seed — we reproduce the SHAPE and distributions, not Java's RNG
stream, using hash-based columns so generation is pure Spark,
parallel, and identical everywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEPTS = ("Eng", "Sales", "Mkt", "Ops", "HR", "Finance", "Legal", "Supp")
CITIES = ("NYC", "LA", "SF", "ATL", "BOS", "CHI", "DEN", "DAL")


def matrix_queries() -> dict[str, "callable"]:
    """The reference's 9 bench queries (SirixVsDuckBenchMain.java:
    39-47 / BASELINE.md), as DataFrame closures over a records df."""
    return {
        "filterCount": lambda df: df.filter((F.col("age") > 40) & F.col("active")).agg(
            F.count("*").alias("cnt")
        ),
        "groupByDept": lambda df: df.groupBy("dept").agg(F.count("*").alias("cnt")),
        "sumAge": lambda df: df.agg(F.sum("age").alias("s")),
        "avgAge": lambda df: df.agg((F.sum("age") / F.count("age")).alias("a")),
        "minMaxAge": lambda df: df.agg(
            F.min("age").alias("mn"), F.max("age").alias("mx")
        ),
        "groupBy2Keys": lambda df: df.groupBy("dept", "city").agg(
            F.count("*").alias("cnt")
        ),
        "filterGroupBy": lambda df: df.filter("active")
        .groupBy("dept")
        .agg(F.count("*").alias("cnt")),
        "countDistinct": lambda df: df.agg(F.countDistinct("dept").alias("cd")),
        "compoundAndFilterCount": lambda df: df.filter(
            (F.col("age") > 30) & (F.col("age") < 50) & F.col("active")
        ).agg(F.count("*").alias("cnt")),
    }


def generated_records(spark: SparkSession, n: int) -> DataFrame:
    """The 9-query matrix table at any scale: one narrow int column
    fanned out to the full schema with xxhash64-derived fields —
    map-only, no driver data."""
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))  # noqa: E731
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.lit(18) + h("age") % 48).cast("long").alias("age"),
            F.element_at(
                F.array(*[F.lit(d) for d in DEPTS]), (h("dept") % 8 + 1).cast("int")
            ).alias("dept"),
            F.element_at(
                F.array(*[F.lit(c) for c in CITIES]), (h("city") % 8 + 1).cast("int")
            ).alias("city"),
            (h("active") % 2 == 0).alias("active"),
        )
    )
