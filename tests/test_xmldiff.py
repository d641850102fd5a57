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


@pytest.mark.parametrize("r", [1, 2, 3, 4])
def test_diff_round_trip(versioned, r):
    xs = versioned
    copy = XmlStore(tempfile.mkdtemp())
    copy.store(
        "xml-db", "resource",
        xs.read_text("xml-db", "resource", r),
        keys=xs.read_keys("xml-db", "resource", r),
    )
    m = copy._read_manifest("xml-db", "resource")
    m["next_key"] = xs.next_key("xml-db", "resource")
    copy._write_manifest("xml-db", "resource", m)
    script = xml_diff(xs, "xml-db", "resource", r, r + 1)
    assert script is not None
    rev = apply_xml_diff(copy, script)
    assert copy.read_text("xml-db", "resource", rev) == xs.read_text(
        "xml-db", "resource", r + 1
    )


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
