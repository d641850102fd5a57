"""xml:diff round trip (function/xml/diff/DiffTest.java): the emitted
XQuery Update script, applied to revision r1 through the keyed write
transaction, must reproduce revision r2 byte-for-byte — for every
consecutive revision pair of the reference's versioned fixture
(XmlDocumentCreator.createVersionedWithUpdatesAndDeletes)."""

from __future__ import annotations

import tempfile

import pytest

from sirix_spark.store.xmldiff import apply_xml_diff, xml_diff
from sirix_spark.store.xmlstore import XmlStore
from sirix_spark.store.xmlwtx import XmlWtx

BASE = (
    '<p:a xmlns:p="ns" i="j">oops1<b>foo<c/></b>oops2'
    '<b p:x="y"><c/>bar</b>oops3</p:a>'
)


@pytest.fixture(scope="module")
def versioned():
    root = tempfile.mkdtemp()
    xs = XmlStore(root)
    xs.store("xml-db", "resource", BASE)
    w = XmlWtx(xs, "xml-db", "resource")
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
    return xs


def _store_copy(xs: XmlStore) -> XmlStore:
    """Full on-disk clone of the store (all revisions + sidecars)."""
    import shutil

    dst = tempfile.mkdtemp()
    shutil.copytree(xs.root, XmlStore(dst).root, dirs_exist_ok=True)
    return XmlStore(dst)


@pytest.mark.parametrize("r", [1, 2, 3, 4])
def test_diff_round_trip(versioned, r):
    """apply_xml_diff opens the write trx at the script's pinned base
    revision r — even when the store's head has moved past it — so
    the round trip holds for every historical pair."""
    xs = versioned
    copy = _store_copy(xs)
    script = xml_diff(xs, "xml-db", "resource", r, r + 1)
    assert script is not None
    rev = apply_xml_diff(copy, script)
    assert copy.read_text("xml-db", "resource", rev) == xs.read_text(
        "xml-db", "resource", r + 1
    )


def test_apply_rejects_missing_base_revision(versioned):
    """A script pinned to a revision the target store doesn't have
    fails closed instead of silently editing the wrong base."""
    from sirix_spark.store.xmlstore import XmlStoreError

    script = xml_diff(versioned, "xml-db", "resource", 2, 3)
    fresh = XmlStore(tempfile.mkdtemp())
    fresh.store("xml-db", "resource", BASE)  # head = revision 1 only
    with pytest.raises(XmlStoreError, match="no revision 2"):
        apply_xml_diff(fresh, script)


def test_identical_revisions_diff_to_none(versioned):
    assert xml_diff(versioned, "xml-db", "resource", 3, 3) is None


def test_insert_statement_shape(versioned):
    script = xml_diff(versioned, "xml-db", "resource", 1, 2)
    assert "let $doc := xml:doc('xml-db','resource', 1)" in script
    assert (
        'insert nodes <a att="attval">OOPS4!</a> before sdb:select-item($doc, 4)'
        in script
    )


def test_delete_and_replace_value_shapes(versioned):
    s34 = xml_diff(versioned, "xml-db", "resource", 3, 4)
    assert "delete nodes sdb:select-item($doc, 13)" in s34
    s45 = xml_diff(versioned, "xml-db", "resource", 4, 5)
    assert (
        'replace value of node sdb:select-item($doc, 4) with "fooooooo"' in s45
    )


def test_query_surface(spark, versioned):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    # DocEvaluator resolves the XmlStore from the same root
    store = DocumentStore(spark, versioned.root[: -len("/__xml__")])
    ev = DocEvaluator(spark, store)
    out = ev.execute("xml:diff('xml-db','resource', 1, 2)")
    assert "insert nodes" in out and "$doc" in out
    assert ev.execute("xml:diff('xml-db','resource', 3, 3)") == ""


def test_fmse_import_preserves_unchanged_keys():
    """io/Import.java (FMSEImport): importing an externally-edited
    document keeps the keys of unchanged nodes, retires removed ones
    and draws fresh keys for inserts — verified through
    node_revisions and a follow-up xml:diff."""
    from sirix_spark.store.xmldiff import fmse_import

    xs = XmlStore(tempfile.mkdtemp())
    xs.store("db", "r", "<root><a>one</a><b x='1'>two</b><c/></root>")
    # seed keys through the write trx so the sidecar exists
    w = XmlWtx(xs, "db", "r")
    w.commit()  # rev 2, keys = shredder numbering
    k2 = xs.read_keys("db", "r", 2)
    # edit externally: change <a>'s text, drop <c/>, add <d/> at end,
    # keep <b> byte-identical
    rev = fmse_import(
        xs, "db", "r", '<root><a>CHANGED</a><b x="1">two</b><d/></root>'
    )
    k3 = xs.read_keys("db", "r", rev)
    # unchanged <b> subtree keys survive (element, attr, text)
    assert xs.read_text("db", "r", rev) == (
        '<root><a>CHANGED</a><b x="1">two</b><d/></root>'
    )
    # root(1), a(2), a-text(3), b(4), @x(5), b-text(6) all preserved
    assert k3[:6] == k2[:6]
    # <c/> retired, <d/> fresh above every prior key
    assert k3[-1] > max(k2)
    assert xs.node_revisions("db", "r", k2[-1]) == [1, 2]  # <c/> gone
    # text key 3 survives its value change (setValue identity rule)
    assert xs.node_revisions("db", "r", k3[2])[-1] == rev


def test_import_via_query_surface(spark, tmp_path):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    store = DocumentStore(spark, str(tmp_path))
    ev = DocEvaluator(spark, store)
    ev.execute("xml:store('db','r','<root><a>one</a></root>')")
    ev.execute("xml:import('db','r','<root><a>one</a><b/></root>')")
    assert ev.execute("xml:doc('db','r')") == "<root><a>one</a><b/></root>"
    # unchanged <a> kept keys 2/3; <b/> drew a fresh key
    assert ev.execute(
        "for $n in xml:doc('db','r')/root/a return sdb:nodekey($n)"
    ) == "2"


def _round_trip(xml1: str, xml2: str) -> str:
    """Diff xml1→xml2 on one store, apply on a clone, return result."""
    xs = XmlStore(tempfile.mkdtemp())
    xs.store("d", "r", xml1)
    w = XmlWtx(xs, "d", "r")
    w.commit()  # rev 2: keyed snapshot of xml1
    from sirix_spark.store.xmldiff import fmse_import

    fmse_import(xs, "d", "r", xml2)  # rev 3: keyed xml2
    script = xml_diff(xs, "d", "r", 2, 3)
    copy = _store_copy(xs)
    if script is None:
        return copy.read_text("d", "r", 2)
    rev = apply_xml_diff(copy, script)
    return copy.read_text("d", "r", rev)


def test_comment_insert_round_trip():
    """Inserted COMMENT/PI children replay as their own node kinds,
    not as TEXT (DiffTest invariant for non-element inserts)."""
    assert _round_trip("<a>t</a>", "<a>t<!--c--></a>") == "<a>t<!--c--></a>"
    assert (
        _round_trip("<a>t</a>", "<a>t<?pi data?></a>")
        == "<a>t<?pi data?></a>"
    )
    assert (
        _round_trip("<a><b/></a>", "<a><!--lead--><b/></a>")
        == "<a><!--lead--><b/></a>"
    )


def test_newline_values_round_trip():
    """Text/attribute values containing newlines survive the script's
    line-oriented statement grammar (escaped as \\n in _esc_str)."""
    x2 = "<a>line1\nline2</a>"
    assert _round_trip("<a>old</a>", x2) == x2
    # attribute newlines must be written as &#10; (the parser
    # normalizes literal newlines to spaces) and survive as real \n
    assert (
        _round_trip("<a>t</a>", '<a b="v1&#10;v2">t</a>')
        == '<a b="v1&#10;v2">t</a>'
    )
    x2 = "<a>t<b/>\n  tail\n</a>"
    assert _round_trip("<a>t<b/></a>", x2) == x2


def test_sidecarless_diff_round_trip():
    """Round-4 verdict #7: a revision pair that predates key sidecars
    (plain store()/commit() without keys) falls back to FMSE
    structural matching — the emitted script still replays r1 into r2
    (DiffTest invariant), with value updates on matched nodes instead
    of delete+insert churn."""
    xs = XmlStore(tempfile.mkdtemp())
    xs.store("d", "r", "<root><a>one</a><b x='1'>two</b><c/></root>")
    xs.commit("d", "r", '<root><a>CHANGED</a><b x="1">two</b><d/>tail</root>')
    script = xml_diff(xs, "d", "r", 1, 2)
    # structural matching recognized <a>'s text as the SAME node
    assert 'replace value of node' in script
    copy = _store_copy(xs)
    rev = apply_xml_diff(copy, script)
    assert copy.read_text("d", "r", rev) == xs.read_text("d", "r", 2)


def test_mixed_sidecar_diff_round_trip():
    """r1 without a sidecar, r2 with one (an XmlWtx commit landed
    later): key spaces are uncorrelated, so the structural fallback
    must engage for the pair."""
    xs = XmlStore(tempfile.mkdtemp())
    xs.store("d", "r", "<root><a>one</a><b/></root>")  # rev1: no sidecar
    w = XmlWtx(xs, "d", "r")
    w.move_to_document_root().move_to_first_child()
    w.insert_element_as_first_child("z")
    w.commit()  # rev2: keyed sidecar
    script = xml_diff(xs, "d", "r", 1, 2)
    copy = _store_copy(xs)
    rev = apply_xml_diff(copy, script)
    assert copy.read_text("d", "r", rev) == xs.read_text("d", "r", 2)


def test_fmse_import_then_diff_round_trip():
    """DiffTest round trip across an imported document (xml:import
    writes keyed sidecars via the same FMSE matcher): diff the
    pre-import revision (sidecar-less) against the imported one and
    replay it."""
    from sirix_spark.store.xmldiff import fmse_import

    xs = XmlStore(tempfile.mkdtemp())
    xs.store("d", "r", "<root><a>one</a><b x='1'>two</b><c/></root>")
    fmse_import(xs, "d", "r", '<root><a>NEW</a><b x="1">two</b></root>')
    script = xml_diff(xs, "d", "r", 1, 2)
    copy = _store_copy(xs)
    rev = apply_xml_diff(copy, script)
    assert copy.read_text("d", "r", rev) == xs.read_text("d", "r", 2)
