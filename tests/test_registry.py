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
    the whole dedup/ANN/multimodal family had no driver row). Round-6
    lesson (verdict #1): a hard-coded name list here breaks on every
    window rotation, so the invariant is now derived from the
    registry itself — every family (module-level QUERIES grouping)
    must keep >=1 representative inside the window, and PRIORITY must
    stay the dict prefix. Rotations that drop a whole family fail;
    rotations that swap representatives within a family pass."""
    from sirix_spark.queries import FAMILIES, PRIORITY

    first50 = set(list(reg)[:50])
    assert list(reg)[:50] == list(PRIORITY)[:50]
    assert len(PRIORITY) == 50, "PRIORITY must exactly fill the driver window"
    assert FAMILIES, "FAMILIES populated by build_registry()"
    uncovered = {
        fam: names
        for fam, names in FAMILIES.items()
        if names and not (set(names) & first50)
    }
    assert not uncovered, f"families with no driver-window representative: {sorted(uncovered)}"


def test_driver_window_rotation_freshness():
    """Round-6 verdict #7: max driver-row age must stay ≤4 rounds.
    PARITY.md's coverage table is the bookkeeping; this test pins the
    mechanism — every entry whose last in-window round (per the
    table) would reach age 5 this round must be in PRIORITY. The
    r10 batch: last driver row r5 → must be windowed now."""
    from sirix_spark.queries import PRIORITY

    must_rotate_in = {
        "above_avg_orders",
        "conditional_exprs",
        "deep_equal_count",
        "fingerprint",
        "hash_sample",
        "jsoniq_array_minmax",
        "jsoniq_count",
        "jsoniq_string_filter",
        "lang_id",
        "length_histogram",
        "quantified_some_every",
        "stratified_sample",
    }
    missing = must_rotate_in - set(PRIORITY)
    assert not missing, f"age-5 entries left outside the window: {missing}"


def test_registry_vector_route_reads_index_files(spark, sf_dir, reg):
    """Round-2 verdict #7 'Done =' clause: the registry's routed
    vector search must execute through the persisted IVF index (plan
    scans vidx_* files), not fall back to the snapshot scan."""
    df = reg["vector_search_routed"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "vidx_ann" in plan, plan[:2000]
