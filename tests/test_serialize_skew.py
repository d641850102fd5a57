"""Tests: JSON serializer limits + salted skew join differential."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sirix_spark.functions.serialize import serialize
from sirix_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def nested(spark):
    data = [
        {
            "id": 1,
            "meta": {"a": 1, "deep": {"b": 2, "deeper": {"c": 3}}},
            "tags": ["x", "y", "z", "w"],
        }
    ]
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(d) for d in data]))


def test_serialize_full(nested):
    out = json.loads(serialize(nested).collect()[0]["json"])
    assert out["meta"]["deep"]["deeper"]["c"] == 3
    assert out["tags"] == ["x", "y", "z", "w"]


def test_serialize_max_level(nested):
    out = json.loads(serialize(nested, max_level=2).collect()[0]["json"])
    assert "meta" in out and "deep" not in out["meta"]  # level-3 struct pruned
    assert out["id"] == 1


def test_serialize_max_children(nested):
    out = json.loads(serialize(nested, max_children=2).collect()[0]["json"])
    assert out["tags"] == ["x", "y"]


def test_serialize_max_nodes(spark):
    df = spark.range(10).select(F.col("id"))
    assert serialize(df, max_nodes=3).count() == 3


def test_salted_join_differential(spark, sf_dir):
    """Salted result must equal the plain join exactly (same rows),
    including under a skewed key distribution."""
    from sirix_spark.tables import load

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # make it skewed: collapse 80% of keys onto one hot key
    fact = orders.withColumn(
        "k", F.when(F.col("o_orderkey") % 5 != 0, F.lit(1)).otherwise(F.col("o_custkey"))
    )
    dim = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
    )
    plain = fact.join(dim, "k").select("o_orderkey", "k", "c_mktsegment")
    salted = salted_join(fact, dim, on="k").select("o_orderkey", "k", "c_mktsegment")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
