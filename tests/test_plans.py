"""Plan-quality gates: the scale properties the prompt demands must
be visible in the physical plan — filters pushed to the parquet
scan, scans pruned to the projected columns, dims broadcast, top-k
as TakeOrderedAndProject. These tests fail when a refactor silently
degrades the plan even though results stay correct."""

from __future__ import annotations

from sirix_spark.plans import explain_str, plan_expectations
from sirix_spark.queries import registry


def q(name, spark, sf_dir):
    return registry()[name].fn(spark, sf_dir)


def test_covered_projection_pushdown_and_pruning(spark, sf_dir):
    df = q("covered_projection", spark, sf_dir)
    # filter on l_shipdate must reach the scan; scan must read only
    # the 4 referenced columns of lineitem's 11.
    assert plan_expectations(
        df,
        pushed_filters=["PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"],
        read_schema_max_cols=4,
    ) == []


def test_filter_count_pushdown(spark, sf_dir):
    df = q("filter_count", spark, sf_dir)
    assert plan_expectations(
        df,
        pushed_filters=["GreaterThan(l_quantity,40.0)", "EqualTo(l_returnflag,R)"],
        read_schema_max_cols=2,
    ) == []


def test_broadcast_dim_joins(spark, sf_dir):
    df = q("customers_per_region", spark, sf_dir)
    assert plan_expectations(df, broadcast_joins=2) == []


def test_national_revenue_broadcasts_dims(spark, sf_dir):
    df = q("national_revenue", spark, sf_dir)
    assert plan_expectations(df, broadcast_joins=2) == []


def test_top_k_uses_take_ordered(spark, sf_dir):
    df = q("top_k_orders", spark, sf_dir)
    assert plan_expectations(df, expect_top_k=True) == []


def test_partial_aggregation_on_analytics(spark, sf_dir):
    # map-side combine (partial_sum/partial_count before the
    # exchange) — the reference's per-worker accumulator merge
    # (SirixVectorizedExecutor.java:126-131) done by Catalyst.
    plan = explain_str(q("pricing_summary", spark, sf_dir), "simple")
    assert "partial_sum" in plan and "partial_count" in plan
    # group-by shuffle happens once
    assert plan.count("Exchange hashpartitioning") == 1


def test_whole_stage_codegen_after_execution(spark, sf_dir):
    df = q("group_by_count", spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = explain_str(df, "simple")
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(1)" in plan and "isFinalPlan=true" in plan


def test_semi_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in explain_str(q("semi_join_customers", spark, sf_dir), "extended")
    assert "LeftAnti" in explain_str(q("anti_join_customers", spark, sf_dir), "extended")


def test_minhash_is_map_only(spark, sf_dir):
    # signature computation must not shuffle (no Exchange operator).
    plan = explain_str(q("minhash_signatures", spark, sf_dir), "simple")
    assert "Exchange" not in plan


def test_asof_join_single_exchange_partitioned_window(spark, sf_dir):
    """Round-6 verdict #3 done-criterion: the as-of join stays the
    one-shuffle union+window form — exactly ONE Exchange (the hash
    partition on the join key) and a WindowExec that is PARTITIONED
    (a partition-less window moves everything to one task)."""
    plan = explain_str(q("asof_join_orders_events", spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan
    # the window spec partitions by the key column k
    assert "windowspecdefinition(k#" in plan, plan


def test_switch_compiles_to_case_when_no_extra_operators(spark, sf_dir):
    """The round-10 switch desugaring (parser switch_expr ->
    fn:deep-equal chain -> null-safe equality) must compile to one
    CASE WHEN tower inside the scan projection: no joins, no
    exchanges, no Python eval — the language layer adds zero runtime
    operators."""
    plan = explain_str(q("jsoniq_switch_classify", spark, sf_dir), "simple")
    for op in ("Join", "Exchange", "EvalPython", "MapInPandas"):
        assert op not in plan, plan
    assert "CASE WHEN" in explain_str(
        q("jsoniq_switch_classify", spark, sf_dir), "extended"
    )
