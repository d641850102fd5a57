"""Node-level JSON diff: golden/model tests for operators/diff.py
(reference granularity: BasicJsonDiff.java:21 — one op per changed
node with its path) plus the Store.node_diff / diff_json wire shape
(JsonDiffSerializer.java)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sirix_spark.operators.diff import json_node_diff


def _kind(x):
    return "object" if isinstance(x, dict) else "array" if isinstance(x, list) else "leaf"


def _leafstr(x):
    if x is None:
        return None
    return x if isinstance(x, str) else json.dumps(x)


def _jtext(x):
    return json.dumps(x, separators=(",", ":"))


def _value_of(x):
    return _leafstr(x) if _kind(x) == "leaf" else _jtext(x)


def model_diff(old, new, path=""):
    """Python reference model of the operator's semantics: top-most
    insert/delete, per-leaf update, kind-change replace."""
    if old is None and _kind(old) == "leaf" and new is None:
        return []
    if _kind(old) != _kind(new):
        return [(path, "replace", _value_of(old), _value_of(new))]
    if _kind(old) == "leaf":
        if _leafstr(old) != _leafstr(new):
            return [(path, "update", _leafstr(old), _leafstr(new))]
        return []
    ops = []
    if isinstance(old, dict):
        for k in set(old) | set(new):
            p = f"{path}/{k}"
            if k not in old:
                ops.append((p, "insert", None, _value_of(new[k])))
            elif k not in new:
                ops.append((p, "delete", _value_of(old[k]), None))
            else:
                ops += model_diff(old[k], new[k], p)
    else:
        for i in range(max(len(old), len(new))):
            p = f"{path}/[{i}]"
            if i >= len(old):
                ops.append((p, "insert", None, _value_of(new[i])))
            elif i >= len(new):
                ops.append((p, "delete", _value_of(old[i]), None))
            else:
                ops += model_diff(old[i], new[i], p)
    return ops


CASES = {
    # id: (old_doc, new_doc) — python values, serialized compact
    1: ({"a": 1, "b": "x"}, {"a": 2, "b": "x"}),                    # leaf update
    2: ({"a": 1}, {"a": 1, "c": {"d": [1, 2]}}),                    # subtree insert
    3: ({"a": {"b": 1, "c": 2}}, {"a": {"b": 1}}),                  # nested delete
    4: ({"a": [1, 2, 3]}, {"a": [1, 9]}),                           # array update+delete
    5: ({"a": 1}, {"a": {"b": 1}}),                                 # replace leaf→object
    6: ({"a": {"x": [{"deep": 1}]}}, {"a": {"x": [{"deep": 2}]}}),  # deep leaf
    7: (None, {"fresh": True}),                                     # whole-doc insert
    8: ({"gone": [1]}, None),                                       # whole-doc delete
    9: ({"same": {"s": [1, {"t": "u"}]}}, {"same": {"s": [1, {"t": "u"}]}}),  # no ops
}


@pytest.fixture(scope="module")
def diff_rows(spark):
    rows = [
        (i, _jtext(o) if o is not None else None, _jtext(n) if n is not None else None)
        for i, (o, n) in CASES.items()
    ]
    df = spark.createDataFrame(rows, "id long, old_doc string, new_doc string")
    out = json_node_diff(df, ["id"], "old_doc", "new_doc")
    return {
        (r["id"], r["path"]): (r["op"], r["old_value"], r["new_value"])
        for r in out.collect()
    }


def test_node_diff_matches_model(diff_rows):
    expected = {}
    for i, (o, n) in CASES.items():
        if o is None and n is None:
            continue
        if o is None:
            expected[(i, "")] = ("insert", None, _value_of(n))
        elif n is None:
            expected[(i, "")] = ("delete", _value_of(o), None)
        else:
            for path, op, ov, nv in model_diff(o, n):
                expected[(i, path)] = (op, ov, nv)
    assert diff_rows == expected


def test_store_node_diff_wire_shape(spark, tmp_path):
    """One changed leaf in a multi-field record → exactly one update
    op at that leaf's path in the JsonDiffSerializer wire shape."""
    from sirix_spark.store import VersionedStore

    store = VersionedStore(spark, str(tmp_path / "nd_store"))
    db, res = "db", "r"
    df = spark.createDataFrame(
        [(1, "alice", 100), (2, "bob", 250)], "id long, customer string, amount long"
    )
    store.store(db, res, df, key="id", message="init")
    store.replace_where(
        db, res, F.col("record_key") == 2, {"amount": 300}, message="bump"
    )

    ops = store.node_diff(db, res, 1, 2).collect()
    assert len(ops) == 1
    (r,) = ops
    assert (r["path"], r["op"], r["old_value"], r["new_value"]) == (
        "/amount", "update", "250", "300"
    )

    wire = json.loads(store.diff_json(db, res, 1, 2))
    assert wire["old-revision"] == 1 and wire["new-revision"] == 2
    assert wire["diffs"] == [
        {"type": "update", "recordKey": 2, "path": "/amount", "old": "250", "new": "300"}
    ]
