"""Plan introspection — the sdb:explain analog (SURVEY.md §2.11:
function/sdb/explain/Explain.java:42, QueryPlan.java,
QueryPlanSerializer.java).

The reference serializes its optimizer's chosen plan (index routing,
vectorized kernels) for inspection; here the physical plan IS
Catalyst's, and `explain_str` captures it for assertions. The
`plan_expectations` helper encodes what a scale-correct plan must
show — pushed filters, pruned scan schema, broadcast joins, top-k
operator — so tests fail when a change silently degrades the plan
(the engine's version of the reference's fail-closed routing checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_expectations(df: DataFrame, *, pushed_filters: list[str] | None = None,
                      read_schema_max_cols: int | None = None,
                      broadcast_joins: int | None = None,
                      expect_top_k: bool = False,
                      forbid_cartesian: bool = True) -> list[str]:
    """Check a physical plan against scale expectations; returns a
    list of violation messages (empty = plan is what we want)."""
    plan = explain_str(df)
    problems = []
    for f in pushed_filters or []:
        if f not in plan:
            problems.append(f"pushed filter missing: {f}")
    if read_schema_max_cols is not None:
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        if m:
            ncols = len([c for c in m.group(1).split(",") if c.strip()])
            if ncols > read_schema_max_cols:
                problems.append(
                    f"scan reads {ncols} columns, expected <= {read_schema_max_cols}"
                )
        else:
            problems.append("no ReadSchema found in plan")
    if broadcast_joins is not None:
        n = plan.count("BroadcastHashJoin")
        if n < broadcast_joins:
            problems.append(f"expected >= {broadcast_joins} broadcast joins, got {n}")
    if expect_top_k and "TakeOrderedAndProject" not in plan:
        problems.append("expected TakeOrderedAndProject (top-k) operator")
    if forbid_cartesian and "CartesianProduct" in plan and "BroadcastNestedLoop" not in plan:
        problems.append("unexpected cartesian product")
    return problems
