"""Round-9 fixes, pinned.

1. The scalar-compiler expression blowup (round-8 verdict What's
   wrong #1 / the fuzz-campaign OOM find): nested arithmetic over
   aggregates used to inline each operand subtree ~5-9× per AST
   level (fuzz case 11 → 76.7 MiB task binary → JVM OOM on a
   9-record document). _let1/_let2 (jsoniq/docmodel.py) bind each
   operand once as a higher-order-function lambda variable; the
   compiled logical plan is now LINEAR in AST size. Pinned the same
   way test_xml_assemble.py pins the q01-shape join count.
2. The fuzz harness's fail-fast plan-size guard: one pathological
   case must fail CLEANLY and keep the shared JVM session.
3. The relpath-predicate dedup fix (ADVICE r8, jsoniq/xpath.py):
   predicates run mid-step on a frontier that may still carry
   duplicate rows; a positional predicate inside the relpath then
   row_numbers the duplicates and [2] selects a copy of the first
   match. The origin construction now dedups once.
"""

from __future__ import annotations

import json

import pytest

from sirix_spark.jsoniq import parser as P


def _plan_chars(spark, store, query: str) -> int:
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    ev = DocEvaluator(spark, store)
    with ev._doc_conf():
        seq = ev.compile(P.parse(query))
    return len(seq.df._jdf.queryExecution().logical().toString())


@pytest.fixture(scope="module")
def fuzz_store(spark, tmp_path_factory):
    from sirix_spark.store.docstore import DocumentStore

    store = DocumentStore(
        spark, str(tmp_path_factory.mktemp("advice_r9_store"))
    )
    records = [
        {"a": i, "b": i % 5, "o": {"x": 2 * i + 1}, "arr": [i, i + 1, 7]}
        for i in range(9)
    ]
    store.store("fz", "r.jn", json.dumps(records))
    return store


NESTED_AGG = (
    "{\"v\": sum((for $x in jn:doc('fz','r.jn')[] "
    "return ((sum($x.arr[]) * $x.o.x) * 13)))}"
)


def test_nested_agg_plan_size_bounded(spark, fuzz_store):
    """The fuzz-case-11 shape compiles to a SMALL plan (round 8:
    12,879,155 chars / 76.7 MiB task binary; round 9: ~13k chars).
    Bound leaves ~5x headroom over the measured value so legitimate
    compiler evolution doesn't trip it, while any reintroduced
    per-branch operand duplication (x100s) fails loudly."""
    assert _plan_chars(spark, fuzz_store, NESTED_AGG) < 80_000


def test_scalar_expression_size_linear_in_depth(spark, fuzz_store):
    """Growth per extra arithmetic-over-aggregate nesting level must
    be additive, not multiplicative: compare depth-2 and depth-4
    variants — with duplication the ratio is ~25-80x; linear
    compilation keeps it under ~3x."""
    d2 = (
        "{\"v\": sum((for $x in jn:doc('fz','r.jn')[] "
        "return (sum($x.arr[]) * 2)))}"
    )
    d4 = (
        "{\"v\": sum((for $x in jn:doc('fz','r.jn')[] "
        "return ((((sum($x.arr[]) * 2) + $x.o.x) * 3) - $x.b)))}"
    )
    c2 = _plan_chars(spark, fuzz_store, d2)
    c4 = _plan_chars(spark, fuzz_store, d4)
    assert c4 < 3 * c2, (c2, c4)


def test_nested_agg_answers_fast(spark, fuzz_store):
    """The round-8 engine-killer shape executes and answers."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    got = DocEvaluator(spark, fuzz_store).execute(NESTED_AGG)
    recs = [
        {"a": i, "b": i % 5, "o": {"x": 2 * i + 1}, "arr": [i, i + 1, 7]}
        for i in range(9)
    ]
    want = sum(sum(r["arr"]) * r["o"]["x"] * 13 for r in recs)
    assert got == json.dumps({"v": want}, separators=(",", ":"))


def test_fuzz_plan_guard_fails_case_keeps_session(spark, tmp_path):
    """An over-ceiling compiled plan fails THAT case (recorded as a
    failure dict) without killing the shared session."""
    from tools.fuzz_jsoniq import run_fuzz

    failures = run_fuzz(
        spark, str(tmp_path), n=2, seed=7, max_plan_chars=10
    )
    assert len(failures) == 2
    assert all("compiled plan too large" in f["got"] for f in failures)
    # the session survived the guarded failures
    assert spark.range(3).count() == 3


def test_relpath_positional_pred_dedup(spark):
    """ADVICE r8 (xpath.py): //x/descendant::a[b/c[2]='v'] — the
    descendant step reaches the same <a> from two overlapping <x>
    contexts, and its predicate runs MID-step, before the end-of-step
    dedup. Without the origin dedup, the duplicated frontier rows
    make the rel walk's c-children row_number as 1,1,2,2 — [2]
    selects a copy of the FIRST child ('u'), the predicate fails,
    and the query returns empty."""
    from sirix_spark.jsoniq.xpath import eval_steps, serialize_result
    from sirix_spark.sources.xml_source import shred_xml

    xml = "<r><x><x><a><b><c>u</c><c>v</c></b></a></x></x></r>"
    df = spark.createDataFrame([("d", xml)], "doc string, xml string")
    nodes = shred_xml(df).cache()
    a_xml = "<a><b><c>u</c><c>v</c></b></a>"

    def run(path):
        ast = P.parse("xml:doc('d','r')" + path)
        fr = eval_steps(nodes, ast.steps)
        return [
            r.text
            for r in serialize_result(nodes, fr)
            .orderBy("doc", "node_key")
            .collect()
        ]

    assert run("//x/descendant::a[b/c[2]='v']") == [a_xml]
    # the sibling shape [b/c[1]='u'] must also hold (first child)
    assert run("//x/descendant::a[b/c[1]='u']") == [a_xml]
    # and a non-matching value filters the candidate out
    assert run("//x/descendant::a[b/c[2]='u']") == []


def test_positional_pred_numbers_per_origin(spark):
    """Same defect family, one level deeper: when two relpath ORIGINS
    converge on the same context node, the positional window must
    number per (context, origin) — a (doc, c_key)-only partition
    interleaves the origins' candidate rows and [2] can select
    another origin's first child. Here both <a>s reach the single
    <b> via descendant::b, and c[2]='v' must hold for BOTH."""
    from sirix_spark.jsoniq.xpath import eval_steps, serialize_result
    from sirix_spark.sources.xml_source import shred_xml

    xml = "<r><a><a><b><c>u</c><c>v</c></b></a></a></r>"
    df = spark.createDataFrame([("d", xml)], "doc string, xml string")
    nodes = shred_xml(df).cache()

    def run(path):
        ast = P.parse("xml:doc('d','r')" + path)
        fr = eval_steps(nodes, ast.steps)
        return [
            r.text
            for r in serialize_result(nodes, fr)
            .orderBy("doc", "node_key")
            .collect()
        ]

    inner = "<a><b><c>u</c><c>v</c></b></a>"
    outer = f"<a>{inner}</a>"
    assert run("//a[descendant::b/c[2]='v']") == [outer, inner]
    assert run("//a[descendant::b/c[1]='v']") == []
    assert run("//a[descendant::b/c[last()]='v']") == [outer, inner]


def test_theta_decorrelated_let(spark, tmp_path, monkeypatch):
    """Correlated let with an INEQUALITY where (XMark q11/q12's
    shape) lowers to the decorrelated theta join — the correlated
    fallback must NOT run, and the existential general-comparison
    semantics must hold (reference: Brackit evaluates the nested
    FLWOR per outer tuple; node/SirixXMarkTest.java q11/q12)."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    store = DocumentStore(spark, str(tmp_path / "s"))
    store.store(
        "db",
        "r.jn",
        json.dumps(
            [{"id": 1, "v": 5}, {"id": 2, "v": 11}, {"id": 3, "v": 2}]
        ),
    )
    calls = {"correlated": 0}
    orig = DocEvaluator._flwor_correlated

    def spy(self, *a, **k):
        calls["correlated"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(DocEvaluator, "_flwor_correlated", spy)
    q = (
        "for $x in jn:doc('db','r.jn')[] "
        "let $l := for $y in jn:doc('db','r.jn')[] "
        "where $x.v gt $y.v return $y.id "
        "order by $x.id "
        'return {"id": $x.id, "n": count($l)}'
    )
    got = DocEvaluator(spark, store).execute(q)
    assert got == '{"id":1,"n":1} {"id":2,"n":2} {"id":3,"n":0}'
    assert calls["correlated"] == 0, "theta shape took the correlated path"


def test_bench_prior_query_harvest():
    """The per-query outlier guard's reference parser finds committed
    per-query values (round-8 verdict What's-wrong #4)."""
    import bench

    priors = bench._prior_query_sec()
    # committed artifacts exist in-repo from rounds 1-8
    assert priors, "no prior per-query values harvested"
    assert all(v > 0 for v in priors.values())
    # structural keys must not leak in as queries
    assert "sf" not in priors and "value" not in priors
    assert not any(k.endswith(("_before", "_after")) for k in priors)
    # ADVICE r9 #3: harvested keys are intersected with the known
    # query registry/matrix names, so diagnostic floats can't enter
    known = bench._known_query_names()
    assert known is not None
    assert all(bench._is_known_query(k, known) for k in priors)
