"""JVM-side XML subtree assembler regressions (round 8).

serialize_result's per-group applyInPandas rebuild became one
Catalyst aggregate expression (sources/xml_source.py
assemble_xml_col) — these tests pin:

- byte parity with the old Python render on every node shape
  (empty elements, attribute/text escaping, comments, PIs, nested
  same-name elements, whitespace-only text, multiple attributes);
- a differential sweep: every element of a gnarly document
  serializes identically to a driver-side reference render;
- the plan contains NO python operator (the whole point);
- the XMark plan-fanout pin: a q01-shaped string-entry query's
  final plan keeps a BOUNDED join count (the shared-frontier
  lineage cuts of round 8 — pre-fix, q01's plan held ~180 joins).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

GNARLY = (
    '<site version="1.0" note="a&amp;b &lt;x&gt; &quot;q&quot;">'
    "<!--top comment-->"
    "<?proc data?>"
    "<empty/>"
    '<empty2 a="1" b="two"/>'
    "<a><a><b>deep &amp; down</b></a>tail</a>"
    "<mixed>one<i>two</i>three</mixed>"
    "<ws> \n </ws>"
    "</site>"
)


@pytest.fixture(scope="module")
def gnodes(spark):
    from sirix_spark.sources.xml_source import shred_xml

    src = spark.createDataFrame([("d1", GNARLY)], "doc string, xml string")
    # localCheckpoint truncates the mapInPandas SHREDDER out of the
    # plan so test_assembler_plan_has_no_python_operator sees only
    # the rebuild side (the engine serves nodes from parquet/cache)
    return shred_xml(src).localCheckpoint()


def _py_render(rows, root_key):
    """Driver-side reference render (the former applyInPandas body)."""
    from sirix_spark.sources.xml_source import _esc

    by_parent: dict[int, list] = {}
    for r in rows:
        if r["parent_key"] is not None:
            by_parent.setdefault(int(r["parent_key"]), []).append(r)
    for v in by_parent.values():
        v.sort(key=lambda r: r["pos"])
    by_key = {int(r["node_key"]): r for r in rows}

    def render(r) -> str:
        kind = r["kind"]
        if kind == "TEXT":
            return _esc(r["value"])
        if kind == "COMMENT":
            return f"<!--{r['value']}-->"
        if kind == "PROCESSING_INSTRUCTION":
            return f"<?{r['value']}?>"
        if kind == "ELEMENT":
            kids = by_parent.get(int(r["node_key"]), [])
            attrs = "".join(
                f' {k["name"]}="{_esc(k["value"], attr=True)}"'
                for k in kids
                if k["kind"] == "ATTRIBUTE"
            )
            inner = "".join(render(k) for k in kids if k["kind"] != "ATTRIBUTE")
            if not inner:
                return f"<{r['name']}{attrs}/>"
            return f"<{r['name']}{attrs}>{inner}</{r['name']}>"
        return ""

    return render(by_key[root_key])


def test_assembler_matches_python_render_on_every_element(gnodes):
    from sirix_spark.jsoniq.xpath import serialize_result

    rows = [r.asDict() for r in gnodes.collect()]
    elems = gnodes.filter(F.col("kind") == "ELEMENT")
    got = {
        int(r["node_key"]): r["text"]
        for r in serialize_result(gnodes, elems).collect()
    }
    elem_keys = [int(r["node_key"]) for r in rows if r["kind"] == "ELEMENT"]
    assert set(got) == set(elem_keys)
    for k in elem_keys:
        assert got[k] == _py_render(rows, k), f"node {k}"


def test_assembler_root_roundtrips_document(gnodes):
    from sirix_spark.jsoniq.xpath import serialize_result

    root = gnodes.filter(
        (F.col("kind") == "ELEMENT") & F.col("name").eqNullSafe(F.lit("site"))
        & (F.col("level") == 1)
    )
    [r] = serialize_result(gnodes, root).collect()
    assert r["text"] == GNARLY


def test_assembler_plan_has_no_python_operator(gnodes):
    from sirix_spark.jsoniq.xpath import serialize_result

    elems = gnodes.filter(F.col("kind") == "ELEMENT")
    plan = (
        serialize_result(gnodes, elems)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("FlatMapGroupsInPandas", "MapInPandas", "EvalPython"):
        assert op not in plan


def test_xmark_q01_shape_plan_join_count_bounded(spark, tmp_path):
    """The round-7 adjudicated residual was plan FANOUT: each xpath
    pipeline inlined its frontier subtree 3-4×, and q01's final plan
    reached ~180 joins / ~40 MB task binaries. The shared-frontier
    lineage cuts (_share_lineage at every pipeline entry/exit) keep
    the FINAL plan bounded regardless of path depth — pinned here on
    a q01-shaped query over a small document (the fanout is a
    plan-shape property, independent of document size)."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore
    from sirix_spark.store.xmlstore import XmlStore

    people = "".join(
        f'<person id="person{i}"><name>N{i}</name></person>' for i in range(4)
    )
    doc = f"<site><people>{people}</people></site>"
    store = DocumentStore(spark, str(tmp_path))
    XmlStore(store.root).store("x", "a.xml", doc)
    q = (
        'let $auction := doc("a.xml") return '
        'for $b in $auction/site/people/person[@id = "person0"] '
        "return $b/name/text()"
    )
    ev = DocEvaluator(spark, store)
    assert ev.execute(q) == "N0"
    # Measure the PRE-checkpoint plan (ADVICE r9 #1): execute_df
    # eagerly localCheckpoints on local masters, so its optimizedPlan
    # is a single LogicalRDD leaf with zero joins and the pin would
    # be vacuous. Compile directly (inside the doc-conf scope, same
    # as execute_df does) and count joins on the compiled plan.
    from sirix_spark.jsoniq import parser as P

    with ev._doc_conf():
        seq = ev.compile(P.parse(q))
        plan = seq.df._jdf.queryExecution().optimizedPlan().toString()
    joins = plan.count("Join ")
    assert joins > 0, "compiled plan shows no joins — measuring the wrong plan"
    assert joins <= 30, f"final plan has {joins} joins — fanout regressed"
