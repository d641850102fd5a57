"""Round-6 ADVICE regressions (judge-filed defects, docmodel/ann).

1. jn:size in sequence position must count PER STREAM TUPLE, not
   globally (multi-tuple FLWOR correlation — the reference's
   jn:size is per-array, JsonIntegrationTest size cases).
2. XPath set operations across DIFFERENT documents/revisions must
   treat equal (stream-prefix, node_key) vectors from distinct docs
   as DISTINCT nodes (identity includes the doc handle).
3. A node-sequence IfExpr whose condition has NULL EBV routes the
   tuple to the ELSE branch (XQuery EBV of a failed general
   comparison), not into neither branch.
4. assignment_margin with < 2 centroids (or an empty table) returns
   0.0 instead of raising TypeError at index-build time.
5. Scalar XPath over a stored xml:doc binds the revision text ONCE
   per (db, res, rev) as a shared literal Column instead of
   splicing the serialized document into every call site's SQL.
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


# ---- 1. jn:size per-tuple ------------------------------------------
def test_jn_size_per_tuple_in_flwor(spark, docstore):
    run(
        spark,
        docstore,
        "jn:store('d','r.jn','"
        '[{"a":[1,2]},{"a":[3]},{"a":[]}]'
        "')",
    )
    got = run(
        spark,
        docstore,
        "for $d in jn:doc('d','r.jn')[] return jn:size($d.a)",
    )
    # pre-fix: one GLOBAL count ("3"); must be per-tuple, order kept,
    # empty arrays counting 0
    assert got == "2 1 0"


def test_jn_size_single_value_unchanged(spark, docstore):
    run(spark, docstore, "jn:store('d','s.jn','{\"a\":[1,2,3]}')")
    assert run(spark, docstore, "jn:size(jn:doc('d','s.jn').a)") == "3"


# ---- 2. setop identity across documents ----------------------------
def test_union_across_documents_keeps_both(spark, docstore):
    run(spark, docstore, "xml:store('db','r1','<r><b>1</b></r>')")
    run(spark, docstore, "xml:store('db','r2','<r><b>2</b></r>')")
    q = (
        "for $n in (xml:doc('db','r1')//b union xml:doc('db','r2')//b) "
        "return $n"
    )
    # same shredder node_key in both docs — still two distinct nodes
    assert run(spark, docstore, q) == "<b>1</b><b>2</b>"


def test_intersect_except_across_documents(spark, docstore):
    run(spark, docstore, "xml:store('db','r1','<r><b>1</b></r>')")
    run(spark, docstore, "xml:store('db','r2','<r><b>2</b></r>')")
    assert (
        run(
            spark,
            docstore,
            "for $n in (xml:doc('db','r1')//b intersect "
            "xml:doc('db','r2')//b) return $n",
        )
        == ""
    )
    assert (
        run(
            spark,
            docstore,
            "for $n in (xml:doc('db','r1')//b except xml:doc('db','r2')//b)"
            " return $n",
        )
        == "<b>1</b>"
    )


def test_setops_same_document_unchanged(spark, docstore):
    run(spark, docstore, "xml:store('db','r','<r><b/><c/></r>')")
    d = "xml:doc('db','r')"
    assert (
        run(spark, docstore, f"for $n in ({d}//b union {d}//b) return $n")
        == "<b/>"
    )
    assert (
        run(
            spark,
            docstore,
            f"for $n in ({d}//* intersect {d}//b) return $n",
        )
        == "<b/>"
    )


# ---- 3. NULL-EBV conditional routes to else ------------------------
def test_nodeseq_if_null_ebv_takes_else(spark, docstore):
    run(spark, docstore, "xml:store('db','r','<r><b>foo</b><b>bar</b></r>')")
    # {"x":1} eq 1 — the object side atomizes to neither number nor
    # string, so the general-comparison predicate is NULL; the tuple
    # must surface from the ELSE branch, not disappear
    q = (
        "for $b in xml:doc('db','r')//b "
        'return if ({"x":1} eq 1) then $b/c else $b/text()'
    )
    # text NODES serialize adjacent (same as a bare $b/text() run)
    assert run(spark, docstore, q) == "foobar"


# ---- 4. assignment_margin degenerate inputs ------------------------
def test_assignment_margin_single_centroid(spark):
    from sirix_spark.operators.ann import assignment_margin

    df = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<float>"
    )
    assert assignment_margin(df, [[1.0, 0.0]]) == 0.0


def test_assignment_margin_empty_table(spark):
    from sirix_spark.operators.ann import assignment_margin

    df = spark.createDataFrame([], "embedding array<float>")
    assert assignment_margin(df, [[1.0, 0.0], [0.0, 1.0]]) == 0.0


# ---- 5. xml:doc scalar-xpath text bound once ------------------------
def test_scalar_xpath_text_bound_once(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    run(spark, docstore, "xml:store('db','m','<p income=\"9876.00\"/>')")
    ev = DocEvaluator(spark, docstore)
    # value-context scalar XPath over a literal xml:doc base — two
    # distinct call sites against the SAME revision share ONE cached
    # literal Column (no per-call-site re-read / SQL-splice)
    got = ev.execute(
        "xml:doc('db','m')/p/@income + xml:doc('db','m')/p/@income"
    )
    assert got == "19752"
    assert len(ev._xtext_lits) == 1
