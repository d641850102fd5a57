"""Value-level spot checks for the analytics suite against DuckDB —
the in-repo version of the reference's differential gate
(TypedGroupByDifferentialTest.java: fast path vs interpreted must
match byte-for-byte; here: Spark vs DuckDB must hash-match)."""

from __future__ import annotations

import duckdb
import pytest

from sirix_spark.queries import registry

CHECK = [
    "filter_count",
    "group_by_count",
    "sum_qty",
    "pricing_summary",
    "count_distinct",
    "top_k_orders",
    "valid_at",
    "snapshot_diff",
    "minhash_signatures",
    "cosine_topk",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_rows(cols, rows):
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import canon

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", CHECK)
def test_matches_duckdb(spark, sf_dir, duck, name):
    q = registry()[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(q.sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _canon_rows(sdf.columns, srows) == _canon_rows(dcols, drows)
