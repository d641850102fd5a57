"""Round-10 fixes, pinned (ADVICE r9 + verdict What's-wrong items).

1. The theta decorrelation's forced broadcast is now guarded by an
   inner-side row-count probe (ADVICE r9 #4): the decorrelated inner
   FLWOR's cardinality scales with the dataset (XMark q11's items),
   so an over-cap inner falls back to the correlated path instead of
   dying on driver memory at scale.
2. _doc_conf enforces the single-evaluator-per-session contract
   (verdict What's-wrong #3): a second evaluator entering the scope
   on the same SparkSession raises instead of silently clobbering
   shared session conf; same-evaluator nesting stays legal.
3. execute_df releases the previous query's DISK_ONLY_2 lineage cuts
   at entry (ADVICE r9 #2): a long-lived evaluator used only via the
   DataFrame API no longer accumulates replicated disk blocks
   unboundedly on non-local masters.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def docstore(spark, tmp_path):
    from sirix_spark.store.docstore import DocumentStore

    return DocumentStore(spark, str(tmp_path))


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


THETA_Q = (
    "let $all := jn:doc('d','r.jn')[] return "
    "for $o in jn:doc('d','r.jn')[] "
    "let $smaller := for $x in $all where $x.v lt $o.v return $x.v "
    "return jn:size([$smaller])"
)


def test_theta_broadcast_cap_falls_back_correctly(
    spark, docstore, monkeypatch
):
    """With the cap forced to 0 the inner-side probe must reject the
    broadcast and the CORRELATED path must produce identical answers
    — the guard degrades performance, never correctness."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    DocEvaluator(spark, docstore).execute(
        "jn:store('d','r.jn','[{\"k\":1,\"v\":10},{\"k\":2,\"v\":20}]')"
    )
    monkeypatch.setenv("SIRIX_THETA_BROADCAST_MAX", "0")
    out, hits = _run_with_spy(spark, docstore, THETA_Q)
    assert out == "0 1"
    assert True not in hits  # over-cap inner → correlated fallback

    monkeypatch.delenv("SIRIX_THETA_BROADCAST_MAX")
    out2, hits2 = _run_with_spy(spark, docstore, THETA_Q)
    assert out2 == "0 1"
    assert True in hits2  # under the default cap the theta path fires


def test_doc_conf_rejects_concurrent_evaluator(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    ev1 = DocEvaluator(spark, docstore)
    ev2 = DocEvaluator(spark, docstore)
    with ev1._doc_conf():
        with pytest.raises(RuntimeError, match="newSession"):
            ev2.execute("1 + 1")
        # same-evaluator nesting (transactions recurse) stays legal
        with ev1._doc_conf():
            pass
    # released on exit: either evaluator may take the scope again
    assert ev2.execute("1 + 1") == "2"
    assert ev1.execute("2 + 2") == "4"


def test_doc_conf_guard_releases_on_error(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    ev1 = DocEvaluator(spark, docstore)
    ev2 = DocEvaluator(spark, docstore)
    with pytest.raises(ValueError):
        with ev1._doc_conf():
            raise ValueError("boom")
    assert ev2.execute("1 + 1") == "2"  # scope not left dangling


def test_execute_df_releases_stale_persists(spark, docstore):
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    ev = DocEvaluator(spark, docstore)
    ev.execute("jn:store('p','y.jn','[1,2,3]')")

    released = []

    class FakePersist:
        def unpersist(self, blocking=False):
            released.append(blocking)

    ev._persists.append(FakePersist())
    df = ev.execute_df("jn:doc('p','y.jn')[]")
    assert released == [False]
    assert ev._persists == []
    assert df.count() == 3
