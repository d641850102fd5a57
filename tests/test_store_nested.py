"""Nested-field surgical updates + revert_to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.store import VersionedStore


@pytest.fixture()
def store(spark, tmp_path):
    return VersionedStore(spark, str(tmp_path / "s"))


def test_nested_field_replace(spark, store):
    import json

    docs = [
        {"pid": 1, "name": "ada", "address": {"city": "NYC", "zip": "10001"}},
        {"pid": 2, "name": "bob", "address": {"city": "SF", "zip": "94101"}},
    ]
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(d) for d in docs]))
    store.store("db", "people", df, key="pid")
    store.replace_where(
        "db", "people", F.col("record_key") == 1, {"address.city": "BOS"}
    )
    rows = {r["record_key"]: r for r in store.doc("db", "people").collect()}
    assert rows[1]["address"]["city"] == "BOS"
    assert rows[1]["address"]["zip"] == "10001"  # sibling field untouched
    assert rows[2]["address"]["city"] == "SF"
    # history intact
    old = {r["record_key"]: r for r in store.doc("db", "people", revision=1).collect()}
    assert old[1]["address"]["city"] == "NYC"


def test_revert_to(spark, store):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    store.store("db", "r", df, key="id")
    store.replace_where("db", "r", F.col("record_key") == 1, {"v": 99})
    store.delete_where("db", "r", F.col("record_key") == 2)
    assert store.doc("db", "r").count() == 1

    rev = store.revert_to("db", "r", 1)
    assert rev == 4
    now = {r["record_key"]: r["v"] for r in store.doc("db", "r").collect()}
    assert now == {1: 10, 2: 20}
    # the interim revisions remain queryable (append-only history)
    assert store.doc("db", "r", revision=3).count() == 1
    assert store.history("db", "r").count() == 4


def test_schema_evolution_new_column(spark, store):
    """Dynamic schema growth (the path-summary behavior): records
    committed later may carry new fields; old records read as NULL
    for them, old revisions keep the old schema."""
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    store.store("db", "evo", df, key="id")
    new = spark.createDataFrame(
        [(2, "b", "extra")], "id long, v string, note string"
    )
    store.insert_records("db", "evo", new, key="id")
    rows = {r["record_key"]: r.asDict() for r in store.doc("db", "evo").collect()}
    assert rows[2]["note"] == "extra"
    assert rows[1]["note"] is None
    assert "note" not in store.doc("db", "evo", revision=1).columns
