"""SQL entry: registered temp views answer Spark SQL; a sample of
registry oracle strings runs under Spark SQL with identical results
to the DataFrame implementations (SQL ↔ DSL differential — the
in-engine analog of the reference's dual-pipeline differential
gate)."""

from __future__ import annotations

import pytest

from sirix_spark.queries import registry
from sirix_spark.tables import register_views

# oracle SQL that is engine-portable (no DuckDB-only functions)
PORTABLE = [
    "filter_count",
    "group_by_count",
    "pricing_summary",
    "customers_per_region",
    "semi_join_customers",
    "set_intersect",
    "top_k_orders",
    "rollup_counts",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_matches_dataframe(spark, sf_dir, name):
    q = registry()[name]
    via_sql = spark.sql(q.sql)
    via_df = q.fn(spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    s = {tuple(r) for r in via_sql.collect()}
    d = {tuple(r) for r in via_df.collect()}
    assert s == d


def test_plain_sql_works(spark):
    rows = spark.sql(
        "SELECT l_returnflag, count(*) AS c FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    assert [r["l_returnflag"] for r in rows] == ["A", "N", "R"]
