"""Property tests for the XML keyed write transaction
(store/xmlwtx.py) — mirrors test_docwtx_property.py for the XML side
(round-3 verdict #8). Random documents and random edit sequences
must keep the reference's XmlNodeTrx key discipline: keys unique,
never reused, fresh keys strictly monotonic, untouched nodes keep
their keys across commits, and the serialized text round-trips
through the shredder. No Spark session needed: this is the
driver-side txn surface."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from sirix_spark.store.xmlwtx import (
    XmlWtx,
    find_node,
    serialize_tree,
    tree_from_rows,
    tree_keys,
)

names = st.sampled_from(["a", "b", "c", "item", "p"])
texts = st.text(alphabet="xyz ", min_size=1, max_size=5).filter(lambda s: s.strip())


@st.composite
def elements(draw, depth=0):
    el = {
        "key": 0,  # keys assigned later
        "kind": "ELEMENT",
        "name": draw(names),
        "attrs": [],
        "children": [],
    }
    for aname in draw(st.lists(st.sampled_from(["id", "v", "n"]), max_size=2, unique=True)):
        el["attrs"].append([0, aname, draw(texts)])
    if depth < 3:
        n_kids = draw(st.integers(0, 3))
        prev_text = True  # no adjacent text nodes (shredder merges them)
        for _ in range(n_kids):
            if not prev_text and draw(st.booleans()):
                el["children"].append({"key": 0, "kind": "TEXT", "value": draw(texts)})
                prev_text = True
            else:
                el["children"].append(draw(elements(depth=depth + 1)))
                prev_text = False
    return el


def assign_keys(node, counter):
    node["key"] = counter[0]
    counter[0] += 1
    if node["kind"] == "ELEMENT":
        for a in node["attrs"]:
            a[0] = counter[0]
            counter[0] += 1
        for c in node["children"]:
            assign_keys(c, counter)


@given(elements())
@settings(max_examples=50, deadline=None)
def test_serialize_shred_roundtrip_preserves_keys(root):
    """serialize → shred → rebuild must reproduce the tree AND its
    key assignment (the sidecar discipline: enumeration order is
    shredder order)."""
    from sirix_spark.sources.xml_source import _shred_one

    counter = [1]
    assign_keys(root, counter)
    keys = tree_keys(root)
    assert keys == sorted(keys)  # pre-order from a fresh counter
    assert len(set(keys)) == len(keys)
    xml = serialize_tree(root)
    rows = _shred_one("d", xml)
    rebuilt = tree_from_rows(rows, keys)
    assert serialize_tree(rebuilt) == xml
    assert tree_keys(rebuilt) == keys


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_random_edits_keep_untouched_keys(seeds):
    """Random insert/remove/setValue sequences through XmlWtx:
    fresh keys strictly above all previous (never reused), committed
    text and keys sidecar always equal the tree serialization, keys
    stay unique."""
    import tempfile

    from sirix_spark.store.xmlstore import XmlStore

    store_dir = tempfile.mkdtemp()
    w = XmlWtx(store_dir, "db", "r")
    w.insert_element_as_first_child("root")
    w.commit()
    xs = XmlStore(store_dir)
    high = max(tree_keys(w.root))
    for seed in seeds:
        keys_before = set(tree_keys(w.root))

        def _is_element(k):
            node, _, slot = find_node(w.root, k)
            return (
                node is not None
                and node["kind"] == "ELEMENT"
                and (slot is None or slot[0] == "child")
            )

        element_keys = sorted(k for k in keys_before if _is_element(k))
        target = element_keys[seed % len(element_keys)]
        w.move_to(target)
        op = seed % 3
        if op == 0:
            w.insert_element_as_first_child("x")
        elif op == 1:
            w.insert_text_as_first_child("t")
        else:
            _, parent, _ = find_node(w.root, target)
            if parent is not None:
                w.remove()
            else:
                w.insert_element_as_first_child("y")
        w.commit()
        keys_after = tree_keys(w.root)
        fresh = set(keys_after) - keys_before
        assert all(k > high for k in fresh), "key reuse detected"
        high = max([high, *keys_after])
        rev = xs.latest_revision("db", "r")
        assert xs.read_text("db", "r", rev) == serialize_tree(w.root)
        assert xs.read_keys("db", "r", rev) == keys_after
        assert len(set(keys_after)) == len(keys_after)


def test_reference_scenario_key_constants():
    """XmlDocumentCreator.createVersionedWithUpdatesAndDeletes key
    constants through XmlWtx: inserts draw 14-16/17-19, the removed
    text key 13 exists only in r1-r3, setValue keeps key 4."""
    import tempfile

    from sirix_spark.store.xmlstore import XmlStore

    d = tempfile.mkdtemp()
    xs = XmlStore(d)
    xs.store(
        "db", "r",
        '<p:a xmlns:p="ns" i="j">oops1<b>foo<c/></b>oops2'
        '<b p:x="y"><c/>bar</b>oops3</p:a>',
    )
    w = XmlWtx(xs, "db", "r")
    for _ in range(2):
        w.move_to_document_root().move_to_first_child()
        w.insert_element_as_first_child("a")
        w.insert_attribute("att", "attval").move_to_parent()
        w.insert_text_as_first_child("OOPS4!")
        w.commit()
    w.move_to_document_root().move_to_first_child().move_to_last_child()
    w.remove()
    w.commit()
    w.move_to(4).set_value("fooooooo")
    w.commit()
    assert xs.revisions("db", "r") == [1, 2, 3, 4, 5]
    assert xs.read_keys("db", "r", 5)[:9] == [1, 2, 3, 17, 18, 19, 14, 15, 16]
    assert xs.node_revisions("db", "r", 13) == [1, 2, 3]
    assert xs.node_revisions("db", "r", 4) == [1, 2, 3, 4, 5]
    assert xs.next_key("db", "r") == 20
    assert "fooooooo" in xs.read_text("db", "r", 5)
    assert "oops3" not in xs.read_text("db", "r", 5)


def test_duplicate_attribute_fails_closed():
    import tempfile

    from sirix_spark.store.xmlstore import XmlStoreError

    w = XmlWtx(tempfile.mkdtemp(), "db", "r")
    w.insert_element_as_first_child("e")
    w.insert_attribute("a", "1").move_to_parent()
    with pytest.raises(XmlStoreError, match="duplicate attribute"):
        w.insert_attribute("a", "2")


def test_rollback_discards():
    import tempfile

    w = XmlWtx(tempfile.mkdtemp(), "db", "r")
    w.insert_element_as_first_child("e")
    w.insert_text_as_first_child("orig")
    w.commit()
    w.move_to_document_root().move_to_first_child().move_to_first_child()
    w.set_value("changed")
    w.rollback()
    assert serialize_tree(w.root) == "<e>orig</e>"
