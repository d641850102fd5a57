"""Property-based XML round-trip fuzz (the reference's fuzz strategy:
io/sirix/fuzz/JsonRoundTripFuzz.java applied to the XML half):
random element trees must survive shred → serialize with canonical
equality, and shred invariants must hold on every tree."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sirix_spark.sources.xml_source import _shred_one, serialize_xml, shred_xml

NAMES = st.sampled_from(["a", "b", "item", "x1", "data", "n"])
TEXTS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)


@st.composite
def xml_trees(draw, depth=3):
    tag = draw(NAMES)
    attrs = draw(
        st.dictionaries(NAMES, TEXTS, max_size=2)
    )
    a = "".join(f' {k}="{v}"' for k, v in attrs.items())
    if depth == 0:
        text = draw(st.one_of(st.none(), TEXTS))
        return f"<{tag}{a}>{text}</{tag}>" if text else f"<{tag}{a}/>"
    kids = draw(st.lists(xml_trees(depth=depth - 1), max_size=3))
    text = draw(st.one_of(st.none(), TEXTS))
    inner = (text or "") + "".join(kids)
    return f"<{tag}{a}>{inner}</{tag}>" if inner else f"<{tag}{a}/>"


@given(xml_trees())
@settings(max_examples=60, deadline=None)
def test_shred_invariants(xml):
    rows = _shred_one("d", xml)
    keys = [r["node_key"] for r in rows]
    assert keys == list(range(len(rows)))  # dense document order
    by_key = {r["node_key"]: r for r in rows}
    for r in rows:
        if r["parent_key"] is not None:
            assert r["ancestors"][-1] == r["parent_key"]
            assert by_key[r["parent_key"]]["level"] == r["level"] - 1
        # subtree interval is well-formed and within parent's interval
        end = r["node_key"] + r["descendant_count"]
        assert end < len(rows)
        if r["parent_key"] is not None:
            p = by_key[r["parent_key"]]
            assert end <= p["node_key"] + p["descendant_count"]


@given(st.lists(xml_trees(), min_size=1, max_size=3))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_roundtrip_canonical_fuzz(spark, xmls):
    df = spark.createDataFrame(
        [(f"d{i}", x) for i, x in enumerate(xmls)], "doc string, xml string"
    )
    out = {r.doc: r.xml for r in serialize_xml(shred_xml(df)).collect()}
    for i, x in enumerate(xmls):
        assert ET.canonicalize(out[f"d{i}"], strip_text=True) == ET.canonicalize(
            x, strip_text=True
        )
