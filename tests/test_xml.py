"""XML shredder/serializer/axes tests (the reference's XML half:
NodeKind ELEMENT/ATTRIBUTE/TEXT/COMMENT/PI + import/serialize +
navigation axes, re-expressed as node-table relational ops)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from sirix_spark.sources.xml_source import (
    ATTRIBUTE,
    COMMENT,
    ELEMENT,
    TEXT,
    ancestors_of,
    children,
    descendants,
    path_summary,
    serialize_xml,
    shred_xml,
)

SAMPLE = (
    '<catalog version="1.0"><book id="b1"><title>Spark</title>'
    "<price>42.5</price><!--review pending--></book>"
    '<book id="b2"><title>Sirix</title><price>0</price></book></catalog>'
)
SAMPLE2 = "<root><a><b>x</b></a><a><b>y</b><b>z</b></a></root>"


def _nodes(spark, xml=SAMPLE, doc="d1"):
    df = spark.createDataFrame([(doc, xml)], "doc string, xml string")
    return shred_xml(df).cache()


def test_shred_kinds_and_keys(spark):
    rows = _nodes(spark).collect()
    by_key = {r.node_key: r for r in rows}
    # document-order keys are dense from 0
    assert sorted(by_key) == list(range(len(rows)))
    kinds = {r.kind for r in rows}
    assert {ELEMENT, ATTRIBUTE, TEXT, COMMENT}.issubset(kinds)
    root = next(r for r in rows if r.kind == ELEMENT and r.name == "catalog")
    # root element subtree spans the whole remainder of the document
    assert root.descendant_count == len(rows) - root.node_key - 1
    # every non-document node's ancestors end at its parent
    for r in rows:
        if r.parent_key is not None:
            assert r.ancestors[-1] == r.parent_key


def test_axes(spark):
    nodes = _nodes(spark)
    root = nodes.filter(F.col("name") == "catalog").first()
    kids = children(nodes, root.node_key).collect()
    assert [k.name for k in kids if k.kind == ELEMENT] == ["book", "book"]
    assert [k.name for k in kids if k.kind == ATTRIBUTE] == ["version"]
    book1 = next(k for k in kids if k.kind == ELEMENT)
    desc = descendants(nodes, "d1", book1.node_key, book1.descendant_count)
    # titles/prices/attr/texts/comment under book1
    assert desc.count() == book1.descendant_count
    title = nodes.filter((F.col("name") == "title")).orderBy("node_key").first()
    anc = ancestors_of(nodes, "d1", title.node_key).collect()
    assert {a.kind for a in anc} >= {ELEMENT}
    assert any(a.name == "catalog" for a in anc)


def test_path_summary(spark):
    ps = {(r.path, r.kind): r["count"] for r in path_summary(_nodes(spark)).collect()}
    assert ps[("/catalog/book", ELEMENT)] == 2
    assert ps[("/catalog/book/title", ELEMENT)] == 2
    assert ps[("/catalog/book/@id", ATTRIBUTE)] == 2


def test_roundtrip_canonical(spark):
    for xml in (SAMPLE, SAMPLE2):
        nodes = _nodes(spark, xml=xml, doc="rt")
        out = serialize_xml(nodes).first().xml
        # canonical comparison (attribute order/whitespace-insensitive);
        # ET.canonicalize drops comments unless asked to keep them
        assert ET.canonicalize(out, strip_text=True) == ET.canonicalize(
            xml, strip_text=True
        )


def test_level_and_post_order(spark):
    from sirix_spark.sources.xml_source import level_order, post_order

    nodes = _nodes(spark, xml=SAMPLE2)
    lv = [r.level for r in level_order(nodes).collect()]
    assert lv == sorted(lv)
    po = post_order(nodes).collect()
    # post-order: every parent appears after all of its descendants
    seen = set()
    for r in po:
        if r.parent_key is not None:
            pass
        for a in r.ancestors:
            assert a not in seen, "ancestor emitted before descendant in post-order"
        seen.add(r.node_key)


def test_multi_document_distributed(spark):
    df = spark.createDataFrame(
        [(f"doc{i}", SAMPLE2) for i in range(8)], "doc string, xml string"
    ).repartition(4)
    nodes = shred_xml(df)
    per_doc = nodes.groupBy("doc").count().collect()
    assert len(per_doc) == 8
    assert len({r["count"] for r in per_doc}) == 1  # identical shapes
    # b-element count across all docs: 3 per doc
    assert nodes.filter((F.col("kind") == ELEMENT) & (F.col("name") == "b")).count() == 24


def test_axis_family_vs_pointer_model(spark):
    """preceding / preceding-sibling / following / following-sibling
    vs an independent pointer-chasing model: the axes use the stored
    (node_key, descendant_count) intervals + ancestors arrays, the
    model derives ancestry by walking parent_key chains over the
    collected rows. Two documents in the table pin per-document
    scoping (node_key is a per-doc index — cross-doc leakage would
    double every axis)."""
    from sirix_spark.sources.xml_source import (
        following,
        following_siblings,
        preceding,
        preceding_siblings,
    )

    df = spark.createDataFrame(
        [("dA", SAMPLE), ("dB", SAMPLE)], "doc string, xml string"
    )
    nodes = shred_xml(df).cache()
    rows = {(r["doc"], r["node_key"]): r for r in nodes.collect()}

    def anc_chain(doc, k):
        out, cur = set(), rows[(doc, k)]["parent_key"]
        while cur is not None:
            out.add(cur)
            cur = rows[(doc, cur)]["parent_key"]
        return out

    doc = "dA"
    doc_keys = sorted(k for d, k in rows if d == doc)
    for k in doc_keys:
        me = rows[(doc, k)]
        ancs = anc_chain(doc, k)
        model = {
            "preceding": {
                j for j in doc_keys
                if j < k and j not in ancs
                and rows[(doc, j)]["kind"] != ATTRIBUTE
            },
            "following": {
                j for j in doc_keys
                if j > k and k not in anc_chain(doc, j)
                and rows[(doc, j)]["kind"] != ATTRIBUTE
            },
            "preceding_sibling": {
                j for j in doc_keys
                if rows[(doc, j)]["parent_key"] == me["parent_key"]
                and rows[(doc, j)]["pos"] < me["pos"]
                and rows[(doc, j)]["kind"] != ATTRIBUTE
            } if me["parent_key"] is not None else set(),
            "following_sibling": {
                j for j in doc_keys
                if rows[(doc, j)]["parent_key"] == me["parent_key"]
                and rows[(doc, j)]["pos"] > me["pos"]
                and rows[(doc, j)]["kind"] != ATTRIBUTE
            } if me["parent_key"] is not None else set(),
        }
        got = {
            "preceding": {r["node_key"] for r in preceding(nodes, doc, k).collect()},
            "following": {r["node_key"] for r in following(nodes, doc, k).collect()},
            "preceding_sibling": {
                r["node_key"] for r in preceding_siblings(nodes, doc, k).collect()
            },
            "following_sibling": {
                r["node_key"] for r in following_siblings(nodes, doc, k).collect()
            },
        }
        for axis in model:
            assert got[axis] == model[axis], (axis, k)
