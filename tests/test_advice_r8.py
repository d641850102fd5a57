"""Round-7 ADVICE regressions (judge-filed defects).

1. The _driver_shred fast path spills to a driver-local temp dir —
   executors on a non-local master can't read it, so the fast path
   must be gated to local masters (the distributed shredder handles
   cluster mode), and the spill dirs must be tracked for cleanup.
2. xs:dateTime CAS scans must compare instants, not strings: values
   with numeric offsets (+01:00) or mixed fractional precision order
   lexicographically wrong.
3. jn:store('db','res',…) with createNew=true (the default) REPLACES
   the whole collection (Store.java:112 → BasicJsonDBStore
   .createCollection → removeIfExisting), also in the explicit-
   resource form; createNew=false adds into it.
4. The decorrelation fail-closed guards are narrowed to the expected
   exception shapes — an unexpected error type propagates instead of
   silently degrading to the correlated path.
"""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def docstore(spark, tmp_path):
    from sirix_spark.store.docstore import DocumentStore

    return DocumentStore(spark, str(tmp_path))


def run(spark, store, query: str) -> str:
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    return DocEvaluator(spark, store).execute(query)


# ---- 1. driver-shred gated to local masters + dir tracking ----------
def test_driver_shred_skipped_on_nonlocal_master(
    spark, docstore, monkeypatch
):
    from sirix_spark.jsoniq import docmodel as dm
    from sirix_spark.store.xmlstore import XmlStore

    XmlStore(docstore.root).store("xdb", "r.xml", "<a><b>7</b></a>")
    called = {"n": 0}
    orig = dm.DocEvaluator._driver_shred

    def spy(self, doc, text):
        called["n"] += 1
        return orig(self, doc, text)

    monkeypatch.setattr(dm.DocEvaluator, "_driver_shred", spy)
    # SparkContext.master is a plain instance attribute
    monkeypatch.setattr(spark.sparkContext, "master", "spark://fake:7077")
    got = run(spark, docstore, "xml:doc('xdb','r.xml')//b/text()")
    assert got == "7"
    assert called["n"] == 0, "driver-shred ran on a non-local master"


def test_driver_shred_dirs_tracked_and_cleaned(spark, docstore):
    from sirix_spark.jsoniq import docmodel as dm
    from sirix_spark.store.xmlstore import XmlStore

    XmlStore(docstore.root).store("xdb2", "s.xml", "<a><b>9</b></a>")
    before = list(dm._SHRED_DIRS)
    got = run(spark, docstore, "xml:doc('xdb2','s.xml')//b/text()")
    assert got == "9"
    new = [d for d in dm._SHRED_DIRS if d not in before]
    assert new, "small document did not register a tracked spill dir"
    assert all(os.path.isdir(d) for d in new)
    dm._cleanup_shred_dirs()
    assert not dm._SHRED_DIRS
    assert all(not os.path.exists(d) for d in new)


# ---- 2. dateTime CAS scans compare instants --------------------------
_DT_DOC = json.dumps(
    [
        # +01:00 offset: lexicographically AFTER the Z cutoff string
        # but temporally 2021-12-31T23:30Z, BEFORE the cutoff
        {"ts": "2022-01-01T00:30:00+01:00"},
        {"ts": "2022-01-01T12:00:00Z"},
        {"ts": "2021-12-31T22:00:00Z"},
        # fractional seconds: lexicographically BEFORE "2022-01-01T00:00:00Z"
        # is false ("." > ":"? ord('.')=46 < ord(':')=58) — either way the
        # typed comparison must place it exactly at +0.5 s past midnight
        {"ts": "2022-01-01T00:00:00.500Z"},
    ]
)


def _scan_values(spark, docstore, q: str) -> set[str]:
    out = run(spark, docstore, q)
    return set(json.loads(x) for x in out.split(" ") if x)


def test_datetime_cas_scan_offset_aware(spark, docstore):
    docstore.store("dtdb", "r.jn", _DT_DOC)
    n = docstore.create_index("dtdb", "r.jn", "cas", "xs:dateTime", ("//ts",))
    got = _scan_values(
        spark,
        docstore,
        "jn:scan-cas-index(jn:doc('dtdb','r.jn'), "
        f"{n}, '2022-01-01T00:00:00Z', '>=')",
    )
    # the +01:00 value is temporally before the cutoff: must be absent
    assert got == {"2022-01-01T12:00:00Z", "2022-01-01T00:00:00.500Z"}
    lt = _scan_values(
        spark,
        docstore,
        "jn:scan-cas-index(jn:doc('dtdb','r.jn'), "
        f"{n}, '2022-01-01T00:00:00Z', '<')",
    )
    assert lt == {"2022-01-01T00:30:00+01:00", "2021-12-31T22:00:00Z"}


def test_datetime_cas_range_scan(spark, docstore):
    docstore.store("dtdb2", "r.jn", _DT_DOC)
    n = docstore.create_index("dtdb2", "r.jn", "cas", "xs:dateTime", ("//ts",))
    got = _scan_values(
        spark,
        docstore,
        "jn:scan-cas-index-range(jn:doc('dtdb2','r.jn'), "
        f"{n}, '2021-12-31T23:00:00Z', '2022-01-01T01:00:00Z', "
        "true(), true())",
    )
    assert got == {"2022-01-01T00:30:00+01:00", "2022-01-01T00:00:00.500Z"}


# ---- 3. jn:store createNew replaces the collection -------------------
def test_store_explicit_res_createnew_replaces_collection(spark, docstore):
    run(spark, docstore, "jn:store('cn','r1.jn','[1]')")
    run(spark, docstore, "jn:store('cn','r2.jn','[2]')")  # default true
    assert docstore.resources("cn") == ["r2.jn"]
    run(spark, docstore, "jn:store('cn','r3.jn','[3]', false())")
    assert sorted(docstore.resources("cn")) == ["r2.jn", "r3.jn"]
    # the surviving resources still answer
    assert run(spark, docstore, "jn:doc('cn','r2.jn')[0]") == "2"
    assert run(spark, docstore, "jn:doc('cn','r3.jn')[0]") == "3"


# ---- 4. decorrelation guard narrowed to expected shapes --------------
def test_decorrelation_unexpected_error_propagates(
    spark, docstore, monkeypatch
):
    from sirix_spark.jsoniq import docmodel as dm

    run(spark, docstore, "jn:store('dx','o.jn','[{\"id\":1,\"v\":10}]')")
    run(
        spark,
        docstore,
        "jn:store('dx','i.jn','[{\"ref\":1,\"x\":\"a\"}]', false())",
    )
    q = (
        "for $o in jn:doc('dx','o.jn')[] "
        "let $m := for $t in jn:doc('dx','i.jn')[] "
        "where $t.ref = $o.id return $t.x "
        "return count($m)"
    )
    assert run(spark, docstore, q) == "1"

    orig = dm.DocEvaluator._atom_cmp

    def boom(a, b, op):
        if "__oval" in str(a) or "__ival" in str(b):
            raise RuntimeError("injected: genuine regression shape")
        return orig(a, b, op)

    monkeypatch.setattr(dm.DocEvaluator, "_atom_cmp", staticmethod(boom))
    with pytest.raises(RuntimeError, match="genuine regression"):
        run(spark, docstore, q)
