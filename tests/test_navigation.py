"""Navigation tests over a twitter.json-shaped nested fixture
(FIXTURES.md §3: nested deref chains, array filters, descendant
deref `..url` — mirrors JsonIntegrationTest.java usages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.operators import navigation as N

TWEETS = [
    {
        "id": 1,
        "text": "hello",
        "entities": {
            "urls": [{"url": "http://a", "expanded_url": "http://a/x"}],
        },
        "user": {
            "id": 10,
            "screen_name": "alice",
            "entities": {"url": {"urls": [{"url": "http://alice"}]}},
        },
    },
    {
        "id": 2,
        "text": "world",
        "entities": {"urls": []},
        "user": {
            "id": 20,
            "screen_name": "bob",
            "entities": {"url": {"urls": [{"url": "http://bob"}, {"url": "http://bob2"}]}},
        },
    },
]


@pytest.fixture(scope="module")
def tweets(spark):
    import json

    return spark.read.json(spark.sparkContext.parallelize([json.dumps(t) for t in TWEETS]))


def test_descendant_paths(tweets):
    paths = N.descendant_paths(tweets.schema, "url")
    # entities.urls[].url, user.entities.url (struct!), user.entities.url.urls[].url
    assert "entities.urls[].url" in paths
    assert "user.entities.url.urls[].url" in paths


def test_descendant_values_flatten(tweets):
    vals = {
        r["value"]
        for r in N.descendant_values(tweets, "url").collect()
        if isinstance(r["value"], str)
    }
    assert {"http://a", "http://alice", "http://bob", "http://bob2"} <= vals


def test_nested_deref_chain(tweets):
    # $doc.user.entities.url.urls[].url — plain column expressions
    rows = tweets.select(
        F.col("id"), F.col("user.entities.url.urls").getField("url").alias("us")
    ).collect()
    got = {r["id"]: list(r["us"]) for r in rows}
    assert got == {1: ["http://alice"], 2: ["http://bob", "http://bob2"]}


def test_array_filter_predicate(tweets):
    # [? $$.urls[].url eq 'http://a'] — reference's array-filter test
    hit = tweets.filter(
        F.exists(
            F.col("entities.urls"), lambda u: u.getField("url") == "http://a"
        )
    ).select("id")
    assert [r["id"] for r in hit.collect()] == [1]


def test_path_summary(tweets):
    ps = {r["path"]: (r["type"], r["count"]) for r in N.path_summary(tweets).collect()}
    assert ps["id"][1] == 2
    assert ps["entities.urls[]"][1] == 1  # one element total (tweet 2 empty)
    assert ps["user.entities.url.urls[]"][1] == 3
    assert ps["user.screen_name"] == ("string", 2)


def test_missing_name_raises(tweets):
    with pytest.raises(KeyError):
        N.select_descendant(tweets, "nope")
