"""XML support: distributed shredder → node table, serializer, axes.

Reference parity (the XML half of the store): SirixDB shreds XML into
fine-grained nodes with ELEMENT/ATTRIBUTE/TEXT/COMMENT/PI/DOCUMENT
kinds (bundles/sirix-core/.../node/NodeKind.java:108-467), each node
carrying parentKey and descendantCount for navigation
(docs/ARCHITECTURE.md:70-100); XML import/serialize lives in
bundles/sirix-query/.../function/xml/io/*.java.

Spark-first re-expression: the shredded form IS a DataFrame — one row
per node with document-order `node_key`, `parent_key`,
`descendant_count`, `ancestors`, and a slash `path` (the path-summary
analog). Axes are then plain relational ops, no tree cursors:

    children   = nodes.filter(parent_key == k)
    descendants= nodes.filter((node_key > k) & (node_key <= k + descendant_count(k)))
    ancestors  = array_contains(ancestors, k)
    siblings   = same parent_key, pos ordering

Shredding runs as an Arrow-batched mapInPandas over (doc, xml string)
rows — each task parses its own documents with stdlib ElementTree, so
a corpus of XML files scales exactly like any other partitioned read
(one document never spans tasks; the reference's parallel shredder
makes the same per-document assumption,
service/json/shredder/ParallelJsonShredder.java:72).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Node kinds (names mirror the reference's NodeKind).
DOCUMENT = "XML_DOCUMENT"
ELEMENT = "ELEMENT"
ATTRIBUTE = "ATTRIBUTE"
TEXT = "TEXT"
COMMENT = "COMMENT"
PI = "PROCESSING_INSTRUCTION"

NODE_SCHEMA = (
    "doc string, node_key long, parent_key long, kind string, "
    "name string, value string, pos int, level int, path string, "
    "descendant_count long, ancestors array<long>"
)


def _shred_one(doc: str, xml: str) -> list[dict]:
    """Pre-order walk of one document → node rows. node_key is the
    document-order index; descendant_count closes over the subtree
    (the reference stores exactly these two to answer the descendant
    axis without traversal).

    Parses with expat WITHOUT namespace processing so qnames survive
    verbatim (``p:a`` stays ``p:a``, ``xmlns:p`` is an ordinary
    attribute) — the reference likewise stores/serializes prefixes
    as written (NamespaceNode / XmlSerializer), which is what makes
    shred→serialize byte-faithful on namespaced documents."""
    from xml.parsers import expat

    rows: list[dict] = []
    counter = [0]

    def emit(parent_key, kind, name, value, pos, level, path, ancestors):
        key = counter[0]
        counter[0] += 1
        rows.append(
            {
                "doc": doc,
                "node_key": key,
                "parent_key": parent_key,
                "kind": kind,
                "name": name,
                "value": value,
                "pos": pos,
                "level": level,
                "path": path,
                "descendant_count": 0,
                "ancestors": list(ancestors),
            }
        )
        return key

    doc_key = emit(None, DOCUMENT, None, None, 0, 0, "", [])
    # frame: [key, row_idx, path, ancestors, next_child_pos, level]
    stack = [[doc_key, 0, "", [doc_key], 0, 1]]
    textbuf: list[str] = []

    def flush_text():
        if not textbuf:
            return
        s = "".join(textbuf)
        textbuf.clear()
        # whitespace-only text nodes are REAL nodes (XDM): the
        # reference's XMark goldens serialize them back verbatim
        # (results/q13.out keeps the newline between <description>
        # and <text>), so the shredder must keep them
        fr = stack[-1]
        emit(fr[0], TEXT, None, s, fr[4], fr[5], fr[2], fr[3])
        fr[4] += 1

    def start(name, attrs):
        flush_text()
        fr = stack[-1]
        path = f"{fr[2]}/{name}"
        key = emit(fr[0], ELEMENT, name, None, fr[4], fr[5], path, fr[3])
        fr[4] += 1
        idx = len(rows) - 1
        anc = fr[3] + [key]
        frame = [key, idx, path, anc, 0, fr[5] + 1]
        for i in range(0, len(attrs), 2):
            emit(key, ATTRIBUTE, attrs[i], attrs[i + 1], frame[4],
                 frame[5], f"{path}/@{attrs[i]}", anc)
            frame[4] += 1
        stack.append(frame)

    def end(name):
        flush_text()
        fr = stack.pop()
        rows[fr[1]]["descendant_count"] = counter[0] - fr[0] - 1

    def comment(data):
        flush_text()
        fr = stack[-1]
        emit(fr[0], COMMENT, None, data, fr[4], fr[5], fr[2], fr[3])
        fr[4] += 1

    def pi(target, data):
        flush_text()
        fr = stack[-1]
        emit(fr[0], PI, None, f"{target} {data}" if data else target,
             fr[4], fr[5], fr[2], fr[3])
        fr[4] += 1

    p = expat.ParserCreate()
    p.ordered_attributes = True
    p.buffer_text = True
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = lambda data: textbuf.append(data)
    p.CommentHandler = comment
    p.ProcessingInstructionHandler = pi
    p.Parse(xml, True)
    rows[0]["descendant_count"] = counter[0] - 1
    return rows


def shred_xml(df: DataFrame, doc_col: str = "doc", xml_col: str = "xml") -> DataFrame:
    """(doc, xml string) rows → node table (NODE_SCHEMA)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for doc, xml in zip(pdf[doc_col], pdf[xml_col]):
                out.extend(_shred_one(doc, xml))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc", "node_key", "parent_key", "kind", "name", "value",
                    "pos", "level", "path", "descendant_count", "ancestors",
                ],
            )

    return df.mapInPandas(run, schema=NODE_SCHEMA)


def read_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read whole XML files (one row per file) and shred. The file is
    the unit of parallelism, as in the reference's parallel shredder."""
    files = (
        spark.read.text(path, wholetext=True)
        .withColumn("doc", F.input_file_name())
        .withColumnRenamed("value", "xml")
    )
    return shred_xml(files)


# --- axes (relational, no cursors) ----------------------------------
def children(nodes: DataFrame, node_key: int) -> DataFrame:
    return nodes.filter(F.col("parent_key") == node_key).orderBy("pos")


def descendants(nodes: DataFrame, doc: str, node_key: int, count: int) -> DataFrame:
    """Descendant axis from the stored (node_key, descendant_count)
    interval — a range predicate, pushable to the scan."""
    return nodes.filter(
        (F.col("doc") == doc)
        & (F.col("node_key") > node_key)
        & (F.col("node_key") <= node_key + count)
    )


def ancestors_of(nodes: DataFrame, doc: str, node_key: int) -> DataFrame:
    target = nodes.filter((F.col("doc") == doc) & (F.col("node_key") == node_key))
    keys = target.select(F.explode("ancestors").alias("k"))
    return nodes.join(keys, nodes.node_key == F.col("k")).drop("k")


def following_siblings(nodes: DataFrame, doc: str, node_key: int) -> DataFrame:
    """FollowingSiblingAxis.java analog. Scoped to `doc`: node_key /
    parent_key are per-document indexes, so the doc filter is part of
    the key, not an optimization. Attribute nodes are not siblings
    (XPath sibling axes exclude them)."""
    t = nodes.filter((F.col("doc") == doc) & (F.col("node_key") == node_key)).select(
        F.col("parent_key").alias("_pk"), F.col("pos").alias("_pos")
    )
    return nodes.join(F.broadcast(t)).filter(
        (F.col("doc") == doc)
        & (F.col("parent_key") == F.col("_pk"))
        & (F.col("pos") > F.col("_pos"))
        & (F.col("kind") != ATTRIBUTE)
    ).drop("_pk", "_pos")


def preceding_siblings(nodes: DataFrame, doc: str, node_key: int) -> DataFrame:
    """PrecedingSiblingAxis.java analog: same parent, earlier sibling
    position, attributes excluded. (The reference iterates in reverse
    document order; order rows by node_key desc for that reading.)"""
    t = nodes.filter((F.col("doc") == doc) & (F.col("node_key") == node_key)).select(
        F.col("parent_key").alias("_pk"), F.col("pos").alias("_pos")
    )
    return nodes.join(F.broadcast(t)).filter(
        (F.col("doc") == doc)
        & (F.col("parent_key") == F.col("_pk"))
        & (F.col("pos") < F.col("_pos"))
        & (F.col("kind") != ATTRIBUTE)
    ).drop("_pk", "_pos")


def following(nodes: DataFrame, doc: str, node_key: int) -> DataFrame:
    """FollowingAxis.java analog: everything strictly after the
    node's subtree in document order — ONE interval predicate from
    the stored (node_key, descendant_count), pushable to the scan.
    Attributes ride inside their element's subtree but are excluded
    from the axis itself (XPath: following contains no attribute
    nodes)."""
    t = nodes.filter((F.col("doc") == doc) & (F.col("node_key") == node_key)).select(
        (F.col("node_key") + F.col("descendant_count")).alias("_end")
    )
    return nodes.join(F.broadcast(t)).filter(
        (F.col("doc") == doc)
        & (F.col("node_key") > F.col("_end"))
        & (F.col("kind") != ATTRIBUTE)
    ).drop("_end")


def preceding(nodes: DataFrame, doc: str, node_key: int) -> DataFrame:
    """PrecedingAxis.java analog: nodes strictly before in document
    order, minus ancestors (per XPath; the stored ancestors array
    gives the exclusion set without walking parent pointers) and
    attributes. Interval predicate + one array_contains — no
    traversal."""
    t = nodes.filter((F.col("doc") == doc) & (F.col("node_key") == node_key)).select(
        F.col("ancestors").alias("_anc")
    )
    return nodes.join(F.broadcast(t)).filter(
        (F.col("doc") == doc)
        & (F.col("node_key") < node_key)
        & ~F.array_contains(F.col("_anc"), F.col("node_key"))
        & (F.col("kind") != ATTRIBUTE)
    ).drop("_anc")


def level_order(nodes: DataFrame) -> DataFrame:
    """LevelOrderAxis analog: breadth-first document traversal from
    the stored level + document-order key (axis/LevelOrderAxis.java)."""
    return nodes.orderBy("doc", "level", "node_key")


def post_order(nodes: DataFrame) -> DataFrame:
    """PostOrderAxis analog: a node post-orders at the end of its
    subtree interval, so sorting by (node_key + descendant_count,
    node_key desc) IS post-order — no traversal, O(1) per node from
    the stored metadata (axis/PostOrderAxis.java)."""
    return nodes.orderBy(
        "doc",
        (F.col("node_key") + F.col("descendant_count")).asc(),
        F.col("node_key").desc(),
    )


def path_summary(nodes: DataFrame) -> DataFrame:
    """Distinct paths with node counts — the XML path summary
    (index/path/summary/PathSummaryReader.java analog)."""
    return (
        nodes.filter(F.col("path") != "")
        .groupBy("path", "kind")
        .count()
        .orderBy("path", "kind")
    )


# --- serializer ------------------------------------------------------
def _esc(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s.replace('"', "&quot;") if attr else s


def _esc_col(c, attr: bool = False):
    """Column-expression mirror of _esc (JVM-side, codegen'd)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;")) if attr else out


#: struct collected per span node for the JVM-side subtree assembler.
#: node_key leads so array_sort orders the array in document order.
ASSEMBLE_STRUCT = (
    ("node_key", "k"),
    ("kind", "kind"),
    ("name", "name"),
    ("value", "value"),
    ("level", "level"),
    ("descendant_count", "dc"),
)


def assemble_node_struct():
    return F.struct(*[F.col(src).alias(dst) for src, dst in ASSEMBLE_STRUCT])


def assemble_xml_col(nds):
    """Pre-order node array (ASSEMBLE_STRUCT, document order) →
    serialized XML text, entirely as JVM column expressions — no
    Python workers (the per-group applyInPandas rebuild this replaced
    paid ~1 s Python-worker init + ~3 s run per serialize stage and
    dominated XMark doc-engine time).

    TWO-PIECE formulation, strictly linear (plus one array sort):
    every entry emits an OPEN piece at sort position (node_key, 0)
    — "<name" / ' name="v"' / escaped text / comment / PI, plus the
    bracket character decided from the NEXT entry (attribute → stay
    open, deeper content → ">", else "/>") — and every content-
    bearing element additionally emits its CLOSE piece "</name>" at
    position (node_key + descendant_count, 1, -level), i.e. right
    after its last descendant, deepest element first on ties.
    Sorting the pieces and array_join-ing their texts yields the
    serialized form. No growing string is folded through an
    aggregate (a first cut did — quadratic copying: the 52 k-node
    XMark root went from ~2 s to 12+ min) and no key→name map is
    consulted (a second cut did — Catalyst maps are array-backed,
    so 52 k-entry lookups made closing tags O(n) each; this form
    needs neither).

    Index arithmetic relies on pre-order node_keys being CONTIGUOUS
    within a subtree span (shredder counter): the entry at array
    index i + dc is the element's last descendant; the element is
    content-empty — serialize as "<name/>" with no close piece —
    iff dc == 0 or that last descendant is one of its own
    attributes (attributes sit at level+1, before any content).

    CALLER CONTRACT: `nds` must be a PLAIN column reference with
    DOCUMENT rows already excluded at ROW level (filter before the
    collect_list). Wrapping the array in F.filter here looked
    harmless but was quadratic: Catalyst inlines the filter
    expression into every `F.get(nds, …)` inside the per-element
    lambdas, re-running the O(n) filter per element — the 52 k-node
    XMark root took ~410 s of ArrayFilter.eval (jstack-confirmed)
    instead of milliseconds."""

    def open_piece(x, i):
        kind = x["kind"]
        nxt = F.get(nds, (i + F.lit(1)).cast("int"))
        node_txt = (
            F.when(kind == ELEMENT, F.concat(F.lit("<"), x["name"]))
            .when(
                kind == ATTRIBUTE,
                F.concat(
                    F.lit(" "), x["name"], F.lit('="'),
                    _esc_col(x["value"], attr=True), F.lit('"'),
                ),
            )
            .when(kind == TEXT, _esc_col(x["value"]))
            .when(kind == COMMENT, F.concat(F.lit("<!--"), x["value"], F.lit("-->")))
            .when(kind == PI, F.concat(F.lit("<?"), x["value"], F.lit("?>")))
            .otherwise(F.lit(""))
        )
        # bracket char after an ELEMENT or the last ATTRIBUTE of one:
        # owner element still open at owner_level = level (E) or
        # level-1 (A); next attribute keeps it open, deeper content
        # closes it with ">", anything else means content-empty "/>"
        owner_level = F.when(kind == ELEMENT, x["level"]).otherwise(x["level"] - 1)
        bracket = (kind == ELEMENT) | (kind == ATTRIBUTE)
        br = (
            F.when(~bracket, F.lit(""))
            .when(nxt.isNotNull() & (nxt["kind"] == ATTRIBUTE), F.lit(""))
            .when(nxt.isNotNull() & (nxt["level"] > owner_level), F.lit(">"))
            .otherwise(F.lit("/>"))
        )
        return F.struct(
            x["k"].alias("pos"),
            F.lit(0).alias("tie"),
            F.lit(0).alias("lvl"),
            F.concat(node_txt, br).alias("txt"),
        )

    def close_piece(x, i):
        last = F.get(nds, (i + x["dc"]).cast("int"))
        content_empty = (x["dc"] == 0) | (
            (last["kind"] == ATTRIBUTE) & (last["level"] == x["level"] + 1)
        )
        return F.when(
            (x["kind"] == ELEMENT) & ~content_empty,
            F.struct(
                (x["k"] + x["dc"]).alias("pos"),
                F.lit(1).alias("tie"),
                (-x["level"]).cast("int").alias("lvl"),
                F.concat(F.lit("</"), x["name"], F.lit(">")).alias("txt"),
            ),
        )

    pieces = F.concat(
        F.transform(nds, open_piece),
        F.filter(F.transform(nds, close_piece), lambda p: p.isNotNull()),
    )
    return F.array_join(
        F.transform(F.array_sort(pieces), lambda p: p["txt"]), ""
    )


def serialize_xml(nodes: DataFrame) -> DataFrame:
    """Node table → (doc, xml string), one row per document; rebuild
    runs per-document via applyInPandas (each document's nodes are
    grouped to one task — same unit of parallelism as the shred)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("node_key")
        by_parent: dict[int, list] = {}
        rows = pdf.to_dict("records")
        for r in rows:
            if r["parent_key"] is not None and not pd.isna(r["parent_key"]):
                by_parent.setdefault(int(r["parent_key"]), []).append(r)
        for v in by_parent.values():
            v.sort(key=lambda r: r["pos"])

        def render(r) -> str:
            kind = r["kind"]
            if kind == TEXT:
                return _esc(r["value"])
            if kind == COMMENT:
                return f"<!--{r['value']}-->"
            if kind == PI:
                return f"<?{r['value']}?>"
            if kind == ELEMENT:
                kids = by_parent.get(int(r["node_key"]), [])
                attrs = "".join(
                    f' {k["name"]}="{_esc(k["value"], attr=True)}"'
                    for k in kids
                    if k["kind"] == ATTRIBUTE
                )
                inner = "".join(render(k) for k in kids if k["kind"] != ATTRIBUTE)
                if not inner:
                    return f"<{r['name']}{attrs}/>"
                return f"<{r['name']}{attrs}>{inner}</{r['name']}>"
            return ""

        doc_row = next(r for r in rows if r["kind"] == DOCUMENT)
        xml = "".join(render(k) for k in by_parent.get(int(doc_row["node_key"]), []))
        return pd.DataFrame({"doc": [doc_row["doc"]], "xml": [xml]})

    return nodes.groupBy("doc").applyInPandas(build, schema="doc string, xml string")
