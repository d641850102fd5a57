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
# Round-9 rotation (rotation policy: max driver-row age ≤4 rounds,
# PARITY.md "Driver-window coverage by round"). Rotating IN the 19
# entries whose last driver row was round 4 (age 5 at r9 otherwise):
# group_by_2keys, count_distinct, computed_agg, rollup_counts,
# top_k_orders (analytics), shipping_priority, revenue_by_priority
# (joins), previous_next_event, item_history, running_sum_per_user
# (temporal), json_deref_sum (json_nav), text_profile (text),
# doc_collection_cas_scan (doccollection), jaccard_near_dup,
# simhash, embedding_near_dup (dedup), multimodal_features
# (multimodal), scalar_functions, null_semantics (semantics).
# Rotating OUT 19 entries that went driver-green in round 8 itself
# (freshest rows; every family keeps an in-window representative):
# filter_count, group_by_count, compound_filter_count,
# grouping_sets_counts, covered_projection (analytics keeps
# pricing_summary + the five incoming), customers_per_region,
# full_outer_summary (joins keep national_revenue/range/asof/anti +
# the two incoming), dense_rank_orders, all_times,
# moving_avg_per_user (temporal keeps ntile/sessionize/valid_at/
# snapshot_diff + the three incoming), json_field_filter (json_nav
# keeps array_posexplode + incoming json_deref_sum), token_count
# (text keeps quality_score/training_corpus_filter + incoming
# text_profile), exact_dedup, minhash_signatures, minhash_lsh_pairs
# (dedup keeps dedup_clusters/fuzzy_verify_pairs + the three
# incoming), scalar_functions2, null_group_key (semantics keeps
# stats_agg/decimal_overflow_sum/median_price/string_agg_nations +
# the two incoming), multimodal_filter_decode (multimodal keeps
# frame_sample + incoming multimodal_features), doc_shred_path_stats
# (doccollection's incoming doc_collection_cas_scan keeps the
# family). ALL entries stay oracle-checked every round by
# tools/check_oracle.py. The family-coverage invariant is enforced
# by tests/test_registry.py against FAMILIES (module-derived), so a
# rotation can never silently drop a family from the window.
PRIORITY: tuple[str, ...] = (
    # flagship aggregation
    "pricing_summary",
    # JSONiq string entry point
    "jsoniq_let_conditional",
    "jsoniq_all_times_store",
    "jsoniq_udf_pricing",
    "jsoniq_join_orders_customers",
    "jsoniq_quantified_embeddings",
    # scans / filters / projections
    "events_filter_project",
    "training_corpus_filter",
    # §2.4 aggregates
    "group_by_2keys",
    "count_distinct",
    "computed_agg",
    "rollup_counts",
    "top_k_orders",
    # LLM-pipeline: text analysis
    "quality_score",
    "text_profile",
    "fuzzy_verify_pairs",
    # §2.10 semantics corners
    "scalar_functions",
    "stats_agg",
    "null_semantics",
    "decimal_overflow_sum",
    # LLM-pipeline: multimodal + document-mode
    "multimodal_features",
    "doc_collection_cas_scan",
    # §2.6 sorts / §2.5 aggregates
    "median_price",
    "string_agg_nations",
    # §2.3 joins
    "national_revenue",
    "range_join_price_bands",
    "shipping_priority",
    "asof_join_orders_events",
    "anti_join_customers",
    "revenue_by_priority",
    # §2.7 temporal family
    "valid_at",
    "snapshot_diff",
    "node_diff",
    "sessionize_events",
    "previous_next_event",
    "item_history",
    # §2.5 windows
    "ntile_value_quartiles",
    "running_sum_per_user",
    # §2.9 JSON navigation / §2.8 set ops / XPath
    "array_posexplode",
    "json_deref_sum",
    "set_ops",
    "xml_path_filter",
    # LLM-pipeline: dedup + similarity
    "jaccard_near_dup",
    "simhash",
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
