"""API-layer test: the reference's canonical bitemporal walkthrough
(README 'Bitemporal: Two Kinds of Time') driven entirely through the
public Sirix/Resource facade, plus jn:store-from-JSON-strings."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from sirix_spark.api import Sirix


@pytest.fixture(scope="module")
def sirix(spark, tmp_path_factory):
    return Sirix(spark, str(tmp_path_factory.mktemp("api_store")), checkpoint_every=4)


def test_store_json_strings_and_query(sirix):
    res = sirix.store_json(
        "db1",
        "people",
        [
            '{"pid": 1, "name": "ada", "age": 36}',
            '{"pid": 2, "name": "bob", "age": 41}',
        ],
        key="pid",
    )
    df = res()
    # jn:doc → DataFrame; queries are plain DataFrame ops
    assert df.filter(F.col("age") > 40).count() == 1
    assert sirix.exists_resource("db1", "people")


def test_reference_readme_walkthrough(sirix, spark):
    """Store → update → time-travel → diff → item-history, all via
    the facade."""
    res = sirix.store_df(
        "db1",
        "orders",
        spark.createDataFrame([(1, "new", 100), (2, "new", 250)], "oid long, status string, amt long"),
        key="oid",
        message="r1",
        commit_timestamp=datetime(2024, 1, 1, tzinfo=timezone.utc),
    )
    res.replace_where(
        F.col("record_key") == 1, {"status": "shipped"},
        message="r2", commit_timestamp=datetime(2024, 1, 5, tzinfo=timezone.utc),
    )
    res.delete_where(
        F.col("record_key") == 2,
        message="r3", commit_timestamp=datetime(2024, 1, 9, tzinfo=timezone.utc),
    )

    assert res.most_recent_revision() == 3
    assert res.doc(1).count() == 2 and res.doc().count() == 1
    assert res.open(datetime(2024, 1, 6, tzinfo=timezone.utc)).count() == 2
    assert res.open_revisions(
        datetime(2024, 1, 2, tzinfo=timezone.utc), datetime(2024, 1, 10, tzinfo=timezone.utc)
    ) == [2, 3]

    # sdb:select-item + temporal axes
    assert res.select_item(1).collect()[0]["status"] == "shipped"
    st = {r["revision"]: r["status"] for r in res.all_times(1).collect()}
    assert st == {1: "new", 2: "shipped", 3: "shipped"}
    assert res.is_deleted(2, 3) is True

    # diff ops
    ops = {r["record_key"]: r["op"] for r in res.diff(1, 3).collect()}
    assert ops == {1: "update", 2: "delete"}

    # item-history: record 1 changed at r1 and r2 only
    ih = sorted(
        r["revision"] for r in res.item_history().filter(F.col("record_key") == 1).collect()
    )
    assert ih == [1, 2]

    # sdb:hash: stable across identical payloads
    h1 = res.with_hash(2).filter(F.col("record_key") == 1).collect()[0]["hash"]
    h2 = res.with_hash(3).filter(F.col("record_key") == 1).collect()[0]["hash"]
    assert h1 == h2


def test_resource_index_api(sirix, spark):
    from pyspark.sql import functions as F

    res = sirix.store_df(
        "db1",
        "indexed",
        spark.createDataFrame([(i, i * 10.0) for i in range(50)], "k long, price double"),
        key="k",
    )
    res.indexes.create_cas("by_price", "price")
    assert res.indexes.find(["price"])["name"] == "by_price"
    rows = res.indexes.scan(["price"], predicate=F.col("price") > 480).collect()
    assert {r["price"] for r in rows} == {490.0}
    assert res.indexes.drop("by_price") is True
