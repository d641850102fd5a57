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


# ---- level-order + select-parent (LevelOrder.java / SelectParent.java,
# JSON side — round-1 gap closure) ------------------------------------
def test_level_order_breadth_first(tweets):
    lo = N.level_order(tweets, key="id")
    rows = lo.filter(F.col("id") == 1).collect()
    levels = [r["level"] for r in rows]
    assert levels == sorted(levels), "breadth-first emission order"
    by_path = {r["path"]: r for r in rows}
    assert by_path["text"]["level"] == 1
    assert by_path["text"]["value"] == "hello"
    assert by_path["user.screen_name"]["level"] == 2
    assert by_path["user.entities.url.urls"]["level"] == 4
    # struct/array values serialize as JSON
    assert by_path["entities"]["value"].startswith("{")


def test_level_order_max_level(tweets):
    lo = N.level_order(tweets, key="id", max_level=1)
    assert set(r["path"] for r in lo.collect()) == {"text", "entities", "user"}


def test_select_parent_nested(tweets):
    out = N.select_parent(tweets, "user.screen_name", key="id")
    got = {r["id"]: r["parent"] for r in out.collect()}
    assert '"screen_name":"alice"' in got[1]
    assert '"screen_name":"bob"' in got[2]


def test_select_parent_root_and_missing(tweets):
    out = N.select_parent(tweets, "text", key="id")
    assert all('"text"' in r["parent"] for r in out.collect())
    with pytest.raises(KeyError):
        N.select_parent(tweets, "nope.deep", key="id")
