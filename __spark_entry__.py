"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1-shape pricing summary) on
                  sf0.001.
queries()       — every implemented operator from SURVEY.md §2 and the
                  training-data-pipeline extensions.
oracle_sql()    — DuckDB-equivalent SQL per query (same column names,
                  deterministic values — see sirix_spark/queries/*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sirix_spark.queries import registry

    return registry()["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sirix_spark.queries import registry

    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    from sirix_spark.queries import registry

    return {name: q.sql for name, q in registry().items() if q.sql is not None}
