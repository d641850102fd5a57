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
# Round-10 rotation (rotation policy: max driver-row age ≤4 rounds,
# PARITY.md "Driver-window coverage by round"). Rotating IN the 12
# entries whose last driver row was round 5 (age 5 at r10 otherwise):
# above_avg_orders, conditional_exprs, deep_equal_count,
# quantified_some_every (semantics), fingerprint, hash_sample,
# lang_id, length_histogram, stratified_sample (text),
# jsoniq_array_minmax, jsoniq_count, jsoniq_string_filter (jsoniq).
# Rotating OUT 12 entries that went driver-green in round 9 itself
# (freshest rows; every family keeps an in-window representative):
# group_by_2keys, count_distinct, computed_agg, rollup_counts,
# top_k_orders (analytics keeps pricing_summary /
# events_filter_project / training_corpus_filter),
# shipping_priority, revenue_by_priority (joins keep
# national_revenue/range/asof/anti), previous_next_event,
# item_history, running_sum_per_user (temporal keeps valid_at /
# snapshot_diff / sessionize_events / ntile_value_quartiles),
# json_deref_sum (json_nav keeps array_posexplode), simhash (dedup
# keeps jaccard_near_dup / embedding_near_dup / dedup_clusters /
# fuzzy_verify_pairs). ALL entries stay oracle-checked every round
# by tools/check_oracle.py. The family-coverage invariant is
# enforced by tests/test_registry.py against FAMILIES
# (module-derived), so a rotation can never silently drop a family
# from the window.
PRIORITY: tuple[str, ...] = (
    # flagship aggregation
    "pricing_summary",
    # JSONiq string entry point
    "jsoniq_let_conditional",
    "jsoniq_all_times_store",
    "jsoniq_udf_pricing",
    "jsoniq_join_orders_customers",
    "jsoniq_quantified_embeddings",
    "jsoniq_array_minmax",
    "jsoniq_count",
    "jsoniq_string_filter",
    # scans / filters / projections
    "events_filter_project",
    "training_corpus_filter",
    # LLM-pipeline: text analysis
    "quality_score",
    "text_profile",
    "fingerprint",
    "hash_sample",
    "lang_id",
    "length_histogram",
    "stratified_sample",
    "fuzzy_verify_pairs",
    # §2.10 semantics corners
    "scalar_functions",
    "stats_agg",
    "null_semantics",
    "decimal_overflow_sum",
    "above_avg_orders",
    "conditional_exprs",
    "deep_equal_count",
    "quantified_some_every",
    # LLM-pipeline: multimodal + document-mode
    "multimodal_features",
    "doc_collection_cas_scan",
    # §2.6 sorts / §2.5 aggregates
    "median_price",
    "string_agg_nations",
    # §2.3 joins
    "national_revenue",
    "range_join_price_bands",
    "asof_join_orders_events",
    "anti_join_customers",
    # §2.7 temporal family
    "valid_at",
    "snapshot_diff",
    "node_diff",
    "sessionize_events",
    # §2.5 windows
    "ntile_value_quartiles",
    # §2.9 JSON navigation / §2.8 set ops / XPath
    "array_posexplode",
    "set_ops",
    "xml_path_filter",
    # LLM-pipeline: dedup + similarity
    "jaccard_near_dup",
    "embedding_near_dup",
    "dedup_clusters",
    "knn_join",
    "cosine_topk",
    "vector_search_routed",
    "multimodal_frame_sample",
)


# Family map derived from module membership (one QUERIES dict per
# module = one SURVEY §2 family grouping). Populated by
# build_registry(); tests/test_registry.py asserts every family has
# ≥1 representative inside the 50-entry driver window, so rotations
# cannot silently drop a family's coverage.
FAMILIES: dict[str, tuple[str, ...]] = {}


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
    fams: dict[str, tuple[str, ...]] = {}
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
        fams[mod.__name__.rsplit(".", 1)[-1]] = tuple(mod.QUERIES)
    FAMILIES.clear()
    FAMILIES.update(fams)
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
