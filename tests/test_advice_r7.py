"""Round-7 ADVICE regressions (judge-filed defects, docmodel).

1. _decorrelated_seq must stay fail-closed when the JOIN-SIDE
   construction itself raises (e.g. a static outer var referenced on
   the inner side of the '=' whose column a _project_return shape
   dropped) — fall back to the correlated path, never crash.
2. jn:size's per-tuple tag column must be uniquely numbered: a
   NESTED jn:size inside the argument path re-tags the same stream
   and a fixed name collides.
3. _xtext_lits must not serve stale text after the same (db,res)
   is re-stored in place (XmlStore.store resets revision 1).
4. sdb:serialize in a never-taken conditional branch must not raise
   at compile time for a missing resource (error defers to row
   evaluation; zero rows -> never fires).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def docstore(spark, tmp_path):
    from sirix_spark.store.docstore import DocumentStore

    return DocumentStore(spark, str(tmp_path))


def run(spark, store, query: str) -> str:
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    return DocEvaluator(spark, store).execute(query)


# ---- 1. decorrelation fail-closed on join-side construction --------
def test_decorrelation_fail_closed_falls_back(spark, docstore, monkeypatch):
    """Force the post-check construction to raise and assert the
    query still answers via the correlated path (fail-closed), and
    that the rewrite path was actually attempted."""
    from sirix_spark.jsoniq import docmodel as dm

    run(
        spark,
        docstore,
        "jn:store('d','o.jn','"
        '[{"id":1,"v":10},{"id":2,"v":20}]'
        "')",
    )
    run(
        spark,
        docstore,
        # createNew=false — a second jn:store into the same collection
        # with the default createNew=true REPLACES the collection
        # (Store.java:112 → BasicJsonDBStore.createCollection →
        # removeIfExisting), wiping o.jn
        "jn:store('d','i.jn','"
        '[{"ref":1,"x":"a"},{"ref":2,"x":"b"},{"ref":2,"x":"c"}]'
        "', false())",
    )
    q = (
        "for $o in jn:doc('d','o.jn')[] "
        "let $m := for $t in jn:doc('d','i.jn')[] "
        "where $t.ref = $o.id return $t.x "
        "return count($m)"
    )
    baseline = run(spark, docstore, q)
    assert baseline == "1 2"

    calls = {"n": 0}
    orig = dm.DocEvaluator._atom_cmp

    def boom(a, b, op):
        # only the decorrelated pair-construction compares the
        # exploded __oval/__ival columns; the correlated fallback
        # path must keep working, so raise for that call shape only.
        # AnalysisException is the expected failure shape the guard
        # stays closed on (round-7 ADVICE #4 narrowed it from bare
        # Exception — an unexpected error type now propagates, see
        # tests/test_advice_r8.py).
        from pyspark.errors import AnalysisException

        if "__oval" in str(a) or "__ival" in str(b):
            calls["n"] += 1
            raise AnalysisException(
                "injected: join-side construction failure"
            )
        return orig(a, b, op)

    # _atom_cmp(__oval, __ival) is called INSIDE the pair-construction
    # block the round-6 advice asked to cover; raising there pre-fix
    # crashed the whole query instead of falling back.
    monkeypatch.setattr(dm.DocEvaluator, "_atom_cmp", staticmethod(boom))
    try:
        got = run(spark, docstore, q)
    finally:
        monkeypatch.setattr(dm.DocEvaluator, "_atom_cmp", orig)
    assert got == baseline
    assert calls["n"] >= 1, "rewrite path was never attempted"


# ---- 2. nested jn:size unique tag ----------------------------------
def test_nested_jn_size_unique_tag(spark, docstore):
    run(
        spark,
        docstore,
        "jn:store('d','n.jn','"
        '[{"a":[[1,2],[3]]},{"a":[[4]]},{"a":[]}]'
        "')",
    )
    # outer size counts members of a; per-tuple, order kept
    got = run(
        spark,
        docstore,
        "for $d in jn:doc('d','n.jn')[] "
        "return jn:size($d.a)",
    )
    assert got == "2 1 0"
    # composed: per-tuple sum of the nested arrays' sizes — two
    # jn:size tag columns coexist in one query plan
    got2 = run(
        spark,
        docstore,
        "for $d in jn:doc('d','n.jn')[] "
        "return sum(for $m in $d.a[] return jn:size($m))",
    )
    assert got2 == "3 1 0"
    # jn:size wrapping a sub-FLWOR whose return itself calls jn:size
    # (the advice's nested-tag shape): both taggings must stay
    # independent — no AnalysisException, per-tuple results
    got3 = run(
        spark,
        docstore,
        "for $d in jn:doc('d','n.jn')[] "
        "return jn:size(for $m in $d.a[] return jn:size($m))",
    )
    assert got3 == "0 0 0"  # size of a non-array sequence is 0


# ---- 3. xtext literal cache invalidation on re-store ----------------
def test_scalar_xpath_not_stale_after_restore(spark, docstore, tmp_path):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.xmlstore import XmlStore

    xs = XmlStore(docstore.root)
    xs.store("xdb", "r.xml", "<a><b>one</b></a>")
    ev = DocEvaluator(spark, docstore)  # reused evaluator
    # value-context scalar XPath — the shape that binds the revision
    # text through the _xtext_lits literal cache
    q_one = (
        "for $i in (1) where xml:doc('xdb','r.xml')/a/b/text() = 'one' "
        "return 'hit'"
    )
    q_two = (
        "for $i in (1) where xml:doc('xdb','r.xml')/a/b/text() = 'two' "
        "return 'hit'"
    )
    assert ev.execute(q_one) == '"hit"'
    assert ev.execute(q_two) == ""
    assert len(ev._xtext_lits) >= 1, "cache not exercised — wrong shape"
    import time

    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    xs.store("xdb", "r.xml", "<a><b>two</b></a>")  # in-place revision 1
    assert ev.execute(q_two) == '"hit"'  # pre-fix: stale '' here
    assert ev.execute(q_one) == ""  # pre-fix: stale '"hit"'


# ---- 4. sdb:serialize defers missing-resource errors ----------------
def test_serialize_in_dead_branch_does_not_raise(spark, docstore):
    run(spark, docstore, "jn:store('d','x.jn','[{\"a\":1}]')")
    # the where filters the tuple stream to EMPTY before the return's
    # sdb:serialize compiles over it — query semantics never evaluate
    # the call, so a missing resource must not surface
    got = run(
        spark,
        docstore,
        "for $i in jn:doc('d','x.jn')[] where $i.a eq 2 "
        "return sdb:serialize(jn:doc('d','MISSING.jn'))",
    )
    assert got == ""


def test_serialize_in_live_branch_still_raises(spark, docstore):
    run(spark, docstore, "jn:store('d','x.jn','[{\"a\":1}]')")
    with pytest.raises(Exception):
        run(
            spark,
            docstore,
            "for $i in jn:doc('d','x.jn')[] where $i.a eq 1 "
            "return sdb:serialize(jn:doc('d','MISSING.jn'))",
        )
