"""Correlated-FLWOR decorrelation (docmodel._decorrelated_seq) and
cluster-safe lineage cuts (docmodel._cut_lineage).

The reference runs nested-FLWOR joins (XMark q08-q12,
node/SirixXMarkTest.java) through Brackit's generic pipeline; the
Spark lowering turns `let $x := for $t in SRC where OUT = INN return
R` into ONE hash join + per-tuple packing instead of evaluating the
inner FLWOR per outer binding context. These tests pin:

- the rewrite FIRES on the XMark shape (spy) and matches the
  correlated path's output exactly, including no-match tuples;
- order preservation (document order within each packed binding);
- fail-closed fallbacks (non-eq where, non-static source);
- general-comparison key semantics across types (number vs
  numeric-string);
- _lineage_strategy picks a cluster-safe mechanism off local.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def docstore(spark, tmp_path):
    from sirix_spark.store.docstore import DocumentStore

    return DocumentStore(spark, str(tmp_path))


SITE = (
    "<site><people>"
    '<person id="p0"><name>Al</name></person>'
    '<person id="p1"><name>Bo</name></person>'
    '<person id="p2"><name>Cy</name></person>'
    "</people><auctions>"
    '<auction><buyer person="p0"/><item>car</item></auction>'
    '<auction><buyer person="p1"/><item>pen</item></auction>'
    '<auction><buyer person="p0"/><item>hat</item></auction>'
    "</auctions></site>"
)

Q_JOIN = """
let $auction := xml:doc('db','a') return
let $ca := $auction/site/auctions/auction return
for $p in $auction/site/people/person
let $a := for $t in $ca where $p/@id = $t/buyer/@person
          return <i>{$t/item/text()}</i>
return <person name="{$p/name/text()}">{$a}</person>
"""

EXPECTED = (
    '<person name="Al"><i>car</i><i>hat</i></person>'
    '<person name="Bo"><i>pen</i></person>'
    '<person name="Cy"/>'
)


def _run_with_spy(spark, store, query):
    from sirix_spark.jsoniq import docmodel as dm

    orig = dm.DocEvaluator._decorrelated_seq
    hits = []

    def spy(self, v, tagged, scope, tord):
        r = orig(self, v, tagged, scope, tord)
        hits.append(r is not None)
        return r

    dm.DocEvaluator._decorrelated_seq = spy
    try:
        out = dm.DocEvaluator(spark, store).execute(query)
    finally:
        dm.DocEvaluator._decorrelated_seq = orig
    return out, hits


def test_xmark_shape_decorrelates_and_matches(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "xml:store('db','a','" + SITE + "')"
    )
    out, hits = _run_with_spy(spark, docstore, Q_JOIN)
    assert out == EXPECTED
    assert hits == [True], "the q09-shape let must take the join path"


def test_nonstatic_source_falls_back(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "xml:store('db','a','" + SITE + "')"
    )
    # $ca bound UNDER the multi-tuple for — not stream-constant, so
    # the rewrite must decline and the correlated path still answer
    q = """
    let $auction := xml:doc('db','a') return
    for $p in $auction/site/people/person
    let $ca := $auction/site/auctions/auction
    let $a := for $t in $ca where $p/@id = $t/buyer/@person
              return <i>{$t/item/text()}</i>
    return <person name="{$p/name/text()}">{$a}</person>
    """
    out, hits = _run_with_spy(spark, docstore, q)
    assert out == EXPECTED
    assert True not in hits


def test_inequality_where_decorrelates(spark, docstore):
    """Round 9: lt/le/gt/ge lower to the decorrelated THETA join
    (XMark q11/q12's shape) — same answers, no correlated pass."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "jn:store('d','r.jn','[{\"k\":1,\"v\":10},{\"k\":2,\"v\":20}]')"
    )
    q = (
        "let $all := jn:doc('d','r.jn')[] return "
        "for $o in jn:doc('d','r.jn')[] "
        "let $smaller := for $x in $all where $x.v lt $o.v return $x.v "
        "return jn:size([$smaller])"
    )
    out, hits = _run_with_spy(spark, docstore, q)
    assert out == "0 1"
    assert True in hits  # the theta shape takes the decorrelated path


def test_ne_where_falls_back(spark, docstore):
    """`ne` stays correlated: existentially it matches almost every
    pair, so the join IS a cartesian — no win over the fallback."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "jn:store('d','s.jn','[{\"k\":1,\"v\":10},{\"k\":2,\"v\":20}]')"
    )
    q = (
        "let $all := jn:doc('d','s.jn')[] return "
        "for $o in jn:doc('d','s.jn')[] "
        "let $others := for $x in $all where $x.v ne $o.v return $x.v "
        "return jn:size([$others])"
    )
    out, hits = _run_with_spy(spark, docstore, q)
    assert out == "1 1"
    assert True not in hits


def test_numeric_vs_string_key_promotion(spark, docstore):
    """General `=` promotes numeric-looking strings: key 1 (number)
    must join "1" (string) — the canonical-key join may not be
    narrower than _atom_cmp."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "jn:store('d','o.jn','[{\"k\":1},{\"k\":3}]')"
    )
    DocEvaluator(spark, docstore).execute(
        'jn:store(\'d\',\'i.jn\',\'[{"ik":"1","v":"a"},'
        '{"ik":"2","v":"b"},{"ik":"1.0","v":"c"}]\', false())'
    )
    q = (
        "let $inner := jn:doc('d','i.jn')[] return "
        "for $o in jn:doc('d','o.jn')[] "
        "let $m := for $t in $inner where $o.k = $t.ik return $t.v "
        "return [$m]"
    )
    out, hits = _run_with_spy(spark, docstore, q)
    # 1 = "1" and 1 = "1.0" both hold numerically; 3 matches nothing
    # ([null] for an empty binding inside [] is the engine's standing
    # behavior on BOTH paths — the join must not change it)
    assert out == '["a","c"] [null]'
    assert hits and hits[0] is True

    from sirix_spark.jsoniq import docmodel as dm

    orig = dm.DocEvaluator._decorrelated_seq
    dm.DocEvaluator._decorrelated_seq = lambda self, v, t, s, o: None
    try:
        fallback = dm.DocEvaluator(spark, docstore).execute(q)
    finally:
        dm.DocEvaluator._decorrelated_seq = orig
    assert fallback == out, "join path must match correlated path"


def test_lineage_strategy_cluster_safe():
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    s = DocEvaluator._lineage_strategy
    assert s("local[32]", None) == "local-checkpoint"
    assert s("local[*]", "/ck") == "local-checkpoint"
    # non-local masters must never pick executor-pinned blocks
    assert s("spark://host:7077", "/ck") == "reliable-checkpoint"
    assert s("yarn", None) == "persist-disk-2"
    assert s("k8s://https://host", None) == "persist-disk-2"
