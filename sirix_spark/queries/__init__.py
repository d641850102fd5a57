"""Query registry: every implemented operator from SURVEY.md §2 gets a
named entry with (a) a PySpark DataFrame implementation and (b) where
SQL-expressible, an equivalent DuckDB oracle SQL string.

The registry is what `__spark_entry__.queries()` / `oracle_sql()`
expose to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One operator/query: Spark impl + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


def build_registry() -> dict[str, Query]:
    from sirix_spark.queries import (
        analytics,
        dedup,
        joins,
        json_nav,
        multimodal,
        semantics,
        setops,
        similarity,
        temporal,
        text,
    )

    registry: dict[str, Query] = {}
    for mod in (
        analytics,
        joins,
        temporal,
        json_nav,
        setops,
        text,
        dedup,
        similarity,
        semantics,
        multimodal,
    ):
        for name, q in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name {name}")
            registry[name] = q
    return registry


_REGISTRY: dict[str, Query] | None = None


def registry() -> dict[str, Query]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
    return _REGISTRY
