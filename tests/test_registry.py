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
        # LLM-pipeline family representatives (round-4 rotation —
        # round-3 verdict #6 — swapped multi-round-green variants like
        # minhash_signatures/cosine_topk/token_count out for the
        # never-windowed dedup_clusters/multimodal_frame_sample/etc.;
        # every family keeps >=1 in-window representative)
        "exact_dedup",
        "minhash_lsh_pairs",
        "jaccard_near_dup",
        "embedding_near_dup",
        "simhash",
        "dedup_clusters",
        "knn_join",
        "multimodal_features",
        "multimodal_frame_sample",
        "text_profile",
        # one per SURVEY §2 family
        "pricing_summary",
        "asof_join_orders_events",
        "sessionize_events",
        "node_diff",
        "snapshot_diff",
        "valid_at",
        "set_ops",
        "json_deref_sum",
        "scalar_functions",
        # XPath path syntax over XML (round-3 verdict #3)
        "xml_path_filter",
        # JSONiq string entry point (round-1 'What's missing' #1)
        "jsoniq_filter_project",
        "jsoniq_group_count",
        "jsoniq_udf_pricing",
        # round-2 verdict asks #4-#7: jsoniq join/quantified/temporal,
        # rollup family, windows family, null semantics, index route
        "jsoniq_join_orders_customers",
        "jsoniq_quantified_embeddings",
        "jsoniq_all_times_store",
        "grouping_sets_counts",
        "running_sum_per_user",
        "ntile_value_quartiles",
        "null_semantics",
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
