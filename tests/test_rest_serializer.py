"""REST serialization envelope for doc-mode query results —
JsonDBSerializer.java's {"rest":[...]} wrapping with revision
metadata, replaying NamedProjectionSerializationTest: a NAMED object
member (OBJECT_NAMED_{STRING,OBJECT,ARRAY,NUMBER}) must serialize as
the name:value record inside the "revision" envelope (the alpha21
over-wrapping regressions), unnamed values stay plain, and computed
strings are JSON-escaped."""

from __future__ import annotations

import json

import pytest

STORE = (
    "jn:store('json-path1','mydoc.jn','"
    '{"products":[{"id":"A","price":10,"specs":{"color":"red"},'
    '"tags":["x","y"]},{"id":"B","price":20}]}\')'
)


@pytest.fixture()
def ev(spark, tmp_path):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    e = DocEvaluator(spark, DocumentStore(spark, str(tmp_path)))
    e.execute(STORE)
    return e


def first_result(serialized: str) -> dict:
    rest = json.loads(serialized)["rest"]
    assert len(rest) == 1, serialized
    return rest[0]


def test_named_string_projection(ev):
    item = first_result(
        ev.execute_rest("jn:doc('json-path1','mydoc.jn').products[0].id")
    )
    assert isinstance(item["revision"], dict), "named member must wrap as a record"
    assert item["revision"]["id"] == "A"
    assert item["revisionNumber"] == 1
    assert item["revisionTimestamp"]


def test_named_object_projection(ev):
    item = first_result(
        ev.execute_rest("jn:doc('json-path1','mydoc.jn').products[0].specs")
    )
    assert item["revision"] == {"specs": {"color": "red"}}


def test_named_array_projection(ev):
    item = first_result(
        ev.execute_rest("jn:doc('json-path1','mydoc.jn').products[0].tags")
    )
    assert item["revision"] == {"tags": ["x", "y"]}


def test_named_number_projection(ev):
    item = first_result(
        ev.execute_rest("jn:doc('json-path1','mydoc.jn').products[1].price")
    )
    assert item["revision"] == {"price": 20}


def test_whole_object_projection_stays_plain(ev):
    item = first_result(
        ev.execute_rest("jn:doc('json-path1','mydoc.jn').products[0]")
    )
    assert item["revision"]["id"] == "A"
    assert item["revision"]["price"] == 10


def test_computed_string_is_escaped(ev):
    out = ev.execute_rest("'quote \" and tab'")
    parsed = json.loads(out)  # must be VALID json despite the quote
    assert parsed["rest"] == ['quote " and tab']
