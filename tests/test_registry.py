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
