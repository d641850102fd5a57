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


# The driver's correctness gate checks the FIRST 50 registry entries
# (round-1 lesson: everything after slot 50 gets no driver-green row).
# PRIORITY pins the window: one representative per SURVEY.md §2 row,
# with the whole LLM-pipeline family (dedup / ANN / multimodal / text
# profile) and the semantics corners inside it. Entries not listed
# here append afterwards in module order — still oracle-checked by
# tools/check_oracle.py, just outside the driver's window.
# Round-4 rotation (round-3 verdict #6, third rotation): multi-round-
# green near-duplicates rotate OUT (filter_count, group_by_count,
# json_field_filter, minhash_signatures, cosine_topk,
# dense_rank_orders, customers_per_region, all_times, token_count —
# every family keeps at least one in-window representative and all
# stay oracle-checked by tools/check_oracle.py) so the newest
# never-driver-green operators get rows: dedup_clusters,
# multimodal_frame_sample, jsoniq_udf_pricing, xml_path_filter (new
# XPath entry), rollup_counts, median_price, string_agg_nations,
# moving_avg_per_user, anti_join_customers. Cross-round coverage is
# tracked in PARITY.md §driver-window-coverage.
PRIORITY: tuple[str, ...] = (
    # §2.4 aggregations + §2.2 scans/filters
    "pricing_summary",
    "group_by_2keys",
    "count_distinct",
    "computed_agg",
    "grouping_sets_counts",
    "rollup_counts",
    # JSONiq string entry point (the reference's query language)
    "jsoniq_filter_project",
    "jsoniq_group_count",
    "jsoniq_join_orders_customers",
    "jsoniq_quantified_embeddings",
    "jsoniq_all_times_store",
    "jsoniq_udf_pricing",
    # §2.6 sorts / top-k / covered projection / §2.10 aggregates
    "top_k_orders",
    "covered_projection",
    "median_price",
    "string_agg_nations",
    # §2.3 joins
    "shipping_priority",
    "national_revenue",
    "revenue_by_priority",
    "range_join_price_bands",
    "full_outer_summary",
    "asof_join_orders_events",
    "anti_join_customers",
    # §2.7 temporal family
    "previous_next_event",
    "item_history",
    "valid_at",
    "snapshot_diff",
    "node_diff",
    "sessionize_events",
    # §2.5 windows
    "running_sum_per_user",
    "ntile_value_quartiles",
    "moving_avg_per_user",
    # §2.2/§2.9/§2.10 JSON navigation + construction
    "json_deref_sum",
    "array_posexplode",
    # §2.8 set ops (dense: union+intersect+except in one row)
    "set_ops",
    # LLM-pipeline: text analysis + document-mode node tables + XPath
    "text_profile",
    "doc_collection_cas_scan",
    "xml_path_filter",
    # LLM-pipeline: dedup family (incl. near-dup clustering)
    "exact_dedup",
    "minhash_lsh_pairs",
    "jaccard_near_dup",
    "simhash",
    "embedding_near_dup",
    "dedup_clusters",
    # LLM-pipeline: similarity search (brute-force + index-routed)
    "knn_join",
    "vector_search_routed",
    # LLM-pipeline: multimodal
    "multimodal_features",
    "multimodal_frame_sample",
    # §2.10 semantics corners
    "scalar_functions",
    "null_semantics",
)


def build_registry() -> dict[str, Query]:
    from sirix_spark.queries import (
        analytics,
        dedup,
        diff,
        doccollection,
        joins,
        json_nav,
        jsoniq_queries,
        multimodal,
        semantics,
        setops,
        similarity,
        temporal,
        text,
        xmlqueries,
    )

    merged: dict[str, Query] = {}
    for mod in (
        analytics,
        joins,
        temporal,
        diff,
        json_nav,
        jsoniq_queries,
        setops,
        text,
        dedup,
        similarity,
        semantics,
        multimodal,
        doccollection,
        xmlqueries,
    ):
        for name, q in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = q
    missing = [n for n in PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY names not registered: {missing}")
    registry = {n: merged[n] for n in PRIORITY}
    registry.update((n, q) for n, q in merged.items() if n not in registry)
    return registry


_REGISTRY: dict[str, Query] | None = None


def registry() -> dict[str, Query]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
    return _REGISTRY
