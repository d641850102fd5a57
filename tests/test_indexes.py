"""Projection/CAS index tests: routing correctness, differential vs
snapshot reads, zone-map pruning evidence on the sorted index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.store import VersionedStore
from sirix_spark.store.indexes import ProjectionIndexes


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, tmp_path_factory):
    store = VersionedStore(spark, str(tmp_path_factory.mktemp("idx_store")))
    from sirix_spark.tables import load

    li = load(spark, sf_dir, "lineitem").withColumn(
        "rid",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
    )
    store.store("db", "li", li, key="rid")
    idx = ProjectionIndexes(store)
    entry = idx.create_projection_index(
        "db", "li", "by_qty", ["l_quantity", "l_extendedprice"], sort_by=["l_quantity"]
    )
    return store, idx, entry


def test_routing_picks_covering_index(ctx):
    store, idx, entry = ctx
    assert idx.find_index("db", "li", ["l_quantity"])["name"] == "by_qty"
    assert idx.find_index("db", "li", ["l_quantity", "l_extendedprice"])["name"] == "by_qty"
    # non-covered column → no index
    assert idx.find_index("db", "li", ["l_tax"]) is None


def test_covered_scan_matches_snapshot(ctx):
    store, idx, _ = ctx
    pred = F.col("l_quantity") > 45
    via_idx = idx.scan("db", "li", ["l_quantity", "l_extendedprice"], predicate=pred)
    via_snap = store.doc("db", "li").filter(pred).select(
        "record_key", "l_quantity", "l_extendedprice"
    )
    assert via_idx.exceptAll(via_snap).count() == 0
    assert via_snap.exceptAll(via_idx).count() == 0


def test_sorted_index_serves_value_ordered_scan(ctx):
    _, idx, entry = ctx
    # CAS-style value-ordered range scan straight off the sorted files
    rows = (
        idx.scan("db", "li", ["l_quantity"], predicate=F.col("l_quantity") <= 2)
        .orderBy("l_quantity")
        .collect()
    )
    assert rows and all(r["l_quantity"] <= 2 for r in rows)


def test_drop_index(ctx):
    store, idx, _ = ctx
    idx.create_cas_index("db", "li", "cas_price", "l_extendedprice")
    # narrowest covering index wins (cas_price has fewer columns)
    assert idx.find_index("db", "li", ["l_extendedprice"])["name"] == "cas_price"
    assert idx.drop_index("db", "li", "cas_price") is True
    # by_qty still covers the column after the drop (auto-rerouting)
    assert idx.find_index("db", "li", ["l_extendedprice"])["name"] == "by_qty"
    # and a never-indexed column has no route
    assert idx.find_index("db", "li", ["l_tax"]) is None


def test_fail_closed_fallback(ctx):
    store, idx, _ = ctx
    # request includes a non-covered column → served from snapshot
    out = idx.scan("db", "li", ["l_tax"])
    assert "l_tax" in out.columns and out.count() == store.doc("db", "li").count()
