"""XPath path-expression steps over the shredded XML node table.

The reference compiles XQuery path expressions through Brackit over
its node store (SirixCompileChain.java; the axis cursors live in
bundles/sirix-core/src/main/java/io/sirix/axis/*.java —
DescendantAxis, FollowingAxis, PrecedingSiblingAxis, …). Here every
axis is a relational operation over the node table
(sirix_spark/sources/xml_source.py NODE_SCHEMA):

- child / attribute       → (doc, parent_key) equi-join
- descendant(-or-self)    → (node_key, descendant_count) interval join
- parent / ancestor       → parent_key / ancestors-array join
- sibling / following /
  preceding               → (parent_key, pos) / interval predicates

After every step the frontier is deduped on (doc, node_key) — XPath
set semantics — and document order IS node_key order, so no sorting
state is carried between steps. Predicates:

- positional ``[n]`` / ``[last()]`` → row_number over a window
  partitioned by (doc, context node), ordered by node_key (reverse
  axes count in reverse document order, per spec);
- ``[relpath]`` existence and ``[relpath = literal]`` comparisons →
  evaluate the relative path carrying the origin key, compute the
  XPath string-value (attribute/text value, or the concatenation of
  an element's descendant text in document order), filter, and
  semi-join back to origins — existential semantics.

Everything is a DataFrame plan: a corpus of N documents shreds into
one table and each step is one join across all documents at once, so
the same code path serves one 10-node test document and a 100 TB
document collection partitioned by doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sirix_spark.sources.xml_source import (
    ATTRIBUTE,
    COMMENT,
    DOCUMENT,
    ELEMENT,
    PI,
    TEXT,
)

NODE_COLS = (
    "doc", "node_key", "parent_key", "kind", "name", "value",
    "pos", "level", "path", "descendant_count", "ancestors",
)

REVERSE_AXES = {"preceding", "preceding-sibling", "ancestor", "ancestor-or-self"}


class XPathError(ValueError):
    pass


# ------------------------------------------- XPath 1.0 re-rendering
def _render_test(axis: str, test: tuple) -> str:
    t = test[0]
    if axis == "attribute":
        if t == "name":
            n = test[1]
            # Hive's xpath*() parses namespace-aware but binds no
            # prefixes, so prefixed QNames never match directly;
            # name() carries the lexical QName and does
            return f'@*[name()="{n}"]' if ":" in n else "@" + n
        return "@*"
    body = {
        "wildcard": "*",
        "node": "node()",
        "text": "text()",
        "comment": "comment()",
        # element() is XPath 2.0 — the 1.0 re-rendering (Hive xpath*)
        # has no kind test for it; '*' matches exactly the same nodes
        # on every non-attribute axis
        "element": "*",
        "processing-instruction": "processing-instruction()",
    }.get(t, test[1] if t == "name" else None)
    if body is None:
        raise XPathError(f"cannot render node test {test}")
    if t == "name" and ":" in test[1]:
        # prefixed element names: same Hive namespace workaround
        body = f'*[name()="{test[1]}"]'
    return body if axis == "child" else f"{axis}::{body}"


def _render_literal(lit) -> str:
    if isinstance(lit, bool):
        return "true()" if lit else "false()"
    if isinstance(lit, (int, float)):
        return repr(lit)
    s = str(lit)
    if "'" not in s:
        return f"'{s}'"
    if '"' not in s:
        return f'"{s}"'
    raise XPathError("string literal mixes both quote kinds")


def _render_pred_body(pred: tuple) -> str:
    kind = pred[0]
    if kind == "pos":
        return str(int(pred[1]))
    if kind == "poslast":
        return "last()"
    if kind == "exists":
        return render_xpath10(pred[1])
    if kind == "cmp":
        _, rel, op, lit = pred
        return f"{render_xpath10(rel)} {op} {_render_literal(lit)}"
    if kind in ("and", "or"):
        return f"({_render_pred_body(pred[1])} {kind} {_render_pred_body(pred[2])})"
    if kind == "not":
        return f"not({_render_pred_body(pred[1])})"
    if kind == "const":
        return "true()" if pred[1] else "false()"
    if kind == "absexists":
        return "/" + render_xpath10(pred[1])
    raise XPathError(f"cannot render predicate {pred}")


def render_xpath10(steps: list) -> str:
    """Parsed xstep tuples → the equivalent XPath 1.0 text, for
    JVM-side evaluation over an item's subtree XML with Spark's
    built-in Hive `xpath*()` functions (scalar/where-clause contexts,
    where a value column — not a node frontier — is needed)."""
    out = []
    for step in steps:
        _, axis, test, preds = step
        s = _render_test(axis, test)
        for p in preds:
            s += f"[{_render_pred_body(p)}]"
        out.append(s)
    return "/".join(out)


def initial_frontier(nodes: DataFrame) -> DataFrame:
    """The document node of every doc — the absolute-path context."""
    return nodes.filter(F.col("kind") == DOCUMENT)


def _test_filter(df: DataFrame, axis: str, test: tuple) -> DataFrame:
    kind = F.col("kind")
    if axis == "attribute":
        # namespace declarations are NOT attributes in the XPath data
        # model (the reference stores them as NamespaceNode, excluded
        # from AttributeAxis — AttributeAxisTest.java:57-69)
        if test[0] == "namespace":
            # the internal namespace-axis test (xml:namespace-count):
            # ONLY the xmlns declarations, which the ordinary
            # attribute axis excludes
            return df.filter(
                (kind == ATTRIBUTE)
                & (
                    (F.col("name") == "xmlns")
                    | F.col("name").startswith("xmlns:")
                )
            )
        df = df.filter(
            (kind == ATTRIBUTE)
            & (F.col("name") != "xmlns")
            & ~F.col("name").startswith("xmlns:")
        )
        if test[0] == "name":
            return df.filter(F.col("name") == test[1])
        if test[0] in ("wildcard", "node"):
            return df
        raise XPathError(f"bad attribute test {test}")
    t = test[0]
    if t == "name":
        return df.filter((kind == ELEMENT) & (F.col("name") == test[1]))
    if t == "wildcard":
        return df.filter(kind == ELEMENT)
    if t == "text":
        return df.filter(kind == TEXT)
    if t == "comment":
        return df.filter(kind == COMMENT)
    if t == "element":
        return df.filter(kind == ELEMENT)
    if t == "processing-instruction":
        return df.filter(kind == PI)
    if t == "node":
        # node() is true for EVERY node kind (XPath 1.0 §2.3). The
        # axis JOINS are what keep attributes out of axes that can
        # never contain them (child/descendant/sibling/following/
        # preceding carry not_attr in _axis_join) — filtering here
        # too made self::node() / descendant-or-self::node() from an
        # ATTRIBUTE context empty and broke the common [@k[. = 'v']]
        # → [. = 'v'] idiom (round-10 xpath-fuzzer find; the
        # reference's SelfAxis returns the attribute itself).
        return df
    raise XPathError(f"bad node test {test}")


def _axis_join(nodes: DataFrame, frontier: DataFrame, axis: str) -> DataFrame:
    """Join the frontier's context nodes to their axis results.
    Output = node columns of the RESULT nodes + ``c_key`` (the
    context key, for positional predicates) + any passthrough
    columns (o_*) the frontier carries."""
    extras = [c for c in frontier.columns if c.startswith("o_")]
    ctx = frontier.select(
        F.col("doc").alias("c_doc"),
        F.col("node_key").alias("c_key"),
        F.col("parent_key").alias("c_parent"),
        F.col("pos").alias("c_pos"),
        F.col("descendant_count").alias("c_dc"),
        F.col("ancestors").alias("c_anc"),
        F.col("kind").alias("c_kind"),
        *extras,
    )
    n, c = F.col, lambda name: F.col(name)  # noqa: E731
    same_doc = n("doc") == c("c_doc")
    not_attr = n("kind") != ATTRIBUTE
    if axis in ("child", "attribute"):
        cond = same_doc & (n("parent_key") == c("c_key"))
        if axis == "child":
            cond = cond & not_attr
    elif axis == "descendant":
        cond = (
            same_doc
            & (n("node_key") > c("c_key"))
            & (n("node_key") <= c("c_key") + c("c_dc"))
            & not_attr
        )
    elif axis == "descendant-or-self":
        # the -or-self part is a plain key equality so an ATTRIBUTE
        # context returns itself (XPath 1.0: the axis contains the
        # context node whatever its kind); the strict-descendant part
        # keeps not_attr — attributes are not descendants, they just
        # live inside the key interval
        cond = same_doc & (
            (
                (n("node_key") > c("c_key"))
                & (n("node_key") <= c("c_key") + c("c_dc"))
                & not_attr
            )
            | (n("node_key") == c("c_key"))
        )
    elif axis == "self":
        cond = same_doc & (n("node_key") == c("c_key"))
    elif axis == "parent":
        cond = same_doc & (n("node_key") == c("c_parent"))
    elif axis == "ancestor":
        # the reference's AncestorAxis stops BEFORE the document node
        # (AncestorAxis.java nextKey: parentKey != DOCUMENT_NODE_KEY),
        # unlike parent::node() which does return it
        cond = (
            same_doc
            & F.array_contains(c("c_anc"), n("node_key"))
            & (n("kind") != DOCUMENT)
        )
    elif axis == "ancestor-or-self":
        cond = same_doc & (
            (
                F.array_contains(c("c_anc"), n("node_key"))
                & (n("kind") != DOCUMENT)
            )
            | (n("node_key") == c("c_key"))
        )
    elif axis == "following-sibling":
        # spec §2.2: the sibling axes are EMPTY for an attribute
        # context (attributes are not children, so they have no
        # siblings); without the c_kind guard an attribute context
        # leaked its element's children as "siblings" (their
        # parent_key equals the attribute's parent — round-10
        # xpath-fuzzer find)
        cond = (
            same_doc
            & (n("parent_key") == c("c_parent"))
            & (n("pos") > c("c_pos"))
            & not_attr
            & (c("c_kind") != ATTRIBUTE)
        )
    elif axis == "preceding-sibling":
        cond = (
            same_doc
            & (n("parent_key") == c("c_parent"))
            & (n("pos") < c("c_pos"))
            & not_attr
            & (c("c_kind") != ATTRIBUTE)
        )
    elif axis == "following":
        cond = same_doc & (n("node_key") > c("c_key") + c("c_dc")) & not_attr
    elif axis == "preceding":
        cond = (
            same_doc
            & (n("node_key") < c("c_key"))
            & ~F.array_contains(c("c_anc"), n("node_key"))
            & not_attr
        )
    else:
        raise XPathError(f"unsupported axis {axis!r}")
    # small-frontier broadcast: the context side of a step is tiny
    # relative to the node table; Catalyst/AQE will still pick
    # shuffle-hash if the frontier is large.
    out = nodes.join(ctx, cond, "inner")
    keep = list(NODE_COLS) + ["c_key"] + extras
    return out.select(*keep)


def _positional(df: DataFrame, axis: str, idx, last: bool) -> DataFrame:
    order = F.col("node_key").desc() if axis in REVERSE_AXES else F.col("node_key").asc()
    # per-(context, ORIGIN) numbering: inside a relpath predicate two
    # origins can converge on the same context node (e.g.
    # //a[descendant::b/c[2]] with nested <a>s reaching one <b>) —
    # partitioning on (doc, c_key) alone would interleave their
    # candidate rows in one window and [2] would pick another
    # origin's first child (same defect family as the ADVICE-r8
    # origin dedup)
    keys = ["doc", "c_key"] + [c for c in df.columns if c.startswith("o_")]
    w = Window.partitionBy(*keys).orderBy(order)
    if last:
        wl = Window.partitionBy(*keys)
        df = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__cnt", F.count(F.lit(1)).over(wl)
        )
        return df.filter(F.col("__rn") == F.col("__cnt")).drop("__rn", "__cnt")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == int(idx))
        .drop("__rn")
    )


def string_value(nodes: DataFrame, frontier: DataFrame) -> DataFrame:
    """frontier + ``sval``: XPath string-value. Attributes/text/
    comments carry their value; an element's string-value is the
    concatenation of its descendant text nodes in document order
    (computed with one interval join + sorted aggregate)."""
    direct = frontier.filter(F.col("kind") != ELEMENT).withColumn(
        "sval", F.coalesce(F.col("value"), F.lit(""))
    )
    elems = frontier.filter(F.col("kind") == ELEMENT)
    texts = nodes.filter(F.col("kind") == TEXT).select(
        F.col("doc").alias("t_doc"),
        F.col("node_key").alias("t_key"),
        F.col("value").alias("t_val"),
    )
    joined = elems.join(
        texts,
        (F.col("t_doc") == F.col("doc"))
        & (F.col("t_key") > F.col("node_key"))
        & (F.col("t_key") <= F.col("node_key") + F.col("descendant_count")),
        "left",
    )
    group_cols = [c for c in elems.columns]
    agg = joined.groupBy(*group_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("t_key").alias("k"), F.col("t_val").alias("v")))
                ),
                lambda s: s["v"],
            ),
            "",
        ).alias("sval")
    )
    return direct.unionByName(agg)


def _apply_pred(
    nodes: DataFrame, df: DataFrame, axis: str, pred: tuple,
    base: DataFrame | None = None,
) -> DataFrame:
    """One predicate over the step frontier ``df``.

    ``base`` is the PRE-predicate step frontier. Relpath predicates
    (exists/cmp) are per-NODE properties — their truth for a row does
    not depend on which other rows survived earlier predicates — so
    their match-key sets are computed from ``base`` instead of the
    chained ``df``. Without this, k chained relpath predicates each
    re-embedded the accumulated frontier subplan on both sides of
    their semi-join, doubling the logical plan per predicate (~2^k;
    a 5-predicate fuzz case compiled past 2M chars — the same
    exponential-inlining class as the round-9 scalar-compiler fix).
    With ``base``, each predicate embeds the step frontier once —
    linear in predicate count. Positional predicates stay on the
    chained ``df``: their semantics DO depend on prior survivors."""
    kind = pred[0]
    if kind == "pos":
        return _positional(df, axis, pred[1], last=False)
    if kind == "poslast":
        return _positional(df, axis, None, last=True)
    if kind == "const":
        # constant numeric comparison, folded at parse time
        return df if pred[1] else df.limit(0)
    if kind == "absexists":
        # absolute path in a predicate: true for every candidate in a
        # doc where the path (from the document node) is non-empty
        sub = eval_steps(nodes, pred[1])
        docs = sub.select(F.col("doc").alias("m_doc")).dropDuplicates()
        return df.join(docs, F.col("doc") == F.col("m_doc"), "left_semi")
    if kind == "and":
        df = _apply_pred(nodes, df, axis, pred[1], base=base)
        return _apply_pred(nodes, df, axis, pred[2], base=base)
    if kind in ("or", "not"):
        # identity keys include the CONTEXT (c_key): predicates run
        # mid-step, where the same result node can legitimately
        # appear under two contexts (descendant fan-out) — deduping
        # on (doc, node_key, o_*) alone collapsed those rows across
        # contexts, and a later positional predicate then numbered a
        # context's rows against another context's survivors (the
        # round-9 per-origin defect family, round-10 fuzzer find)
        keys = ["doc", "node_key"] + [
            c for c in df.columns if c == "c_key" or c.startswith("o_")
        ]
        if kind == "or":
            a = _apply_pred(nodes, df, axis, pred[1], base=base)
            b = _apply_pred(nodes, df, axis, pred[2], base=base)
            return a.unionByName(b).dropDuplicates(keys)
        inner = _apply_pred(nodes, df, axis, pred[1], base=base).select(
            *[F.col(k).alias(f"np_{k}") for k in keys]
        )
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"np_{k}"))
            cond = c if cond is None else (cond & c)
        return df.join(inner, cond, "left_anti")
    # relpath predicates: evaluate from each candidate, carrying its
    # identity; keep candidates with >= 1 (matching) result.
    rel = pred[1]
    seed = base if base is not None else df
    origin = seed.withColumn("o_doc", F.col("doc")).withColumn(
        "o_key", F.col("node_key")
    )
    # dedup ONCE at origin construction — but only when the step
    # whose predicate this is could have produced duplicates:
    # predicates run mid-step, before the end-of-step dedup, so a
    # fan-out axis (descendant/following/…) may hand us duplicate
    # (node, origin) rows, and a positional predicate in a later rel
    # step would row_number the duplicates and let [2] select a copy
    # of the first match (ADVICE r8). The frontier ENTERING the step
    # was deduped at the previous step's close, so dup-free axes
    # (child/attribute/self) are clean here — skipping the exchange
    # for them keeps the common [@attr='v'] shape one-shuffle.
    sub = origin.select(*NODE_COLS, "o_doc", "o_key")
    if axis not in _DUP_FREE_AXES:
        sub = sub.dropDuplicates(["doc", "node_key", "o_doc", "o_key"])
    for step in rel:
        _, ax, test, preds = step
        sub = _test_filter(_axis_join(nodes, sub, ax), ax, test)
        sub_base = sub
        for p in preds:
            sub = _apply_pred(nodes, sub, ax, p, base=sub_base)
        if ax not in _DUP_FREE_AXES:
            sub = sub.dropDuplicates(["doc", "node_key", "o_doc", "o_key"])
    if kind == "cmp":
        _, _, op, lit = pred
        sub = string_value(nodes, sub)
        col = F.col("sval")
        if isinstance(lit, (int, float)):
            # try_cast, NOT cast: a non-numeric string-value must
            # make the comparison silently false (XPath number() of a
            # non-number is NaN, which compares false) — under ANSI
            # mode (Spark 4 default) a plain cast CRASHES the whole
            # query on e.g. [node() = 9] over an element whose text
            # isn't numeric (round-10 xpath-fuzzer find, 4/60 cases)
            col = col.try_cast("double")
        cmpmap = {
            "=": col == F.lit(lit),
            "!=": col != F.lit(lit),
            "<": col < F.lit(lit),
            "<=": col <= F.lit(lit),
            ">": col > F.lit(lit),
            ">=": col >= F.lit(lit),
        }
        sub = sub.filter(cmpmap[op])
    matched = sub.select(
        F.col("o_doc").alias("m_doc"), F.col("o_key").alias("m_key")
    ).dropDuplicates()
    return df.join(
        matched,
        (F.col("doc") == F.col("m_doc")) & (F.col("node_key") == F.col("m_key")),
        "left_semi",
    )


def _chain_len(steps: list, i: int) -> int:
    """Length of the maximal predicate-less child::name run at i
    (unprefixed names only — prefixed QNames go through the generic
    name workaround)."""
    j = i
    while j < len(steps):
        _, axis, test, preds = steps[j]
        if (
            axis == "child"
            and test[0] == "name"
            and ":" not in test[1]
            and not preds
        ):
            j += 1
        else:
            break
    return j - i


def _child_chain_join(
    nodes: DataFrame, frontier: DataFrame, names: list[str]
) -> DataFrame:
    """Collapse a run of predicate-less child::name steps into ONE
    equi-join on the shredder's materialized path column — the Spark
    analog of the reference's path-summary PCR filter (a CAS/path
    scan narrows to path-class numbers instead of walking child axes,
    index/path/summary/PathSummaryReader.java). /site/people/person
    is 3 axis joins (3 broadcast stages + dedups) on the generic
    path; here it is one hash join: result.path == frontier.path +
    '/site/people/person', same doc, inside the frontier's pre-order
    interval (which also rejects text/attr contexts — their
    descendant_count is 0). kind==ELEMENT excludes text nodes, which
    inherit their parent ELEMENT's path."""
    extras = [c for c in frontier.columns if c.startswith("o_")]
    ctx = frontier.select(
        F.col("doc").alias("c_doc"),
        F.col("node_key").alias("c_key"),
        F.col("descendant_count").alias("c_dc"),
        F.col("path").alias("c_path"),
        *extras,
    )
    suffix = "/" + "/".join(names)
    cond = (
        (F.col("doc") == F.col("c_doc"))
        & (F.col("kind") == ELEMENT)
        & (F.col("path") == F.concat(F.col("c_path"), F.lit(suffix)))
        & (F.col("node_key") > F.col("c_key"))
        & (F.col("node_key") <= F.col("c_key") + F.col("c_dc"))
    )
    out = nodes.join(ctx, cond, "inner")
    return out.select(*NODE_COLS, *extras)


#: axes that cannot produce duplicate (node, origin) rows from an
#: already-deduped frontier: every child/attribute has exactly one
#: parent, self is identity. (parent/ancestor fan IN — siblings share
#: them; sibling/following/preceding/descendant overlap across
#: contexts.) Steps on these axes skip the per-step dropDuplicates —
#: one shuffle less per step, which dominates small-doc latency and
#: removes whole exchanges at cluster scale.
_DUP_FREE_AXES = {"child", "attribute", "self"}


def _has_rel_pred(pred: tuple) -> bool:
    k = pred[0]
    if k in ("exists", "cmp", "absexists"):
        return True
    if k in ("and", "or"):
        return _has_rel_pred(pred[1]) or _has_rel_pred(pred[2])
    if k == "not":
        return _has_rel_pred(pred[1])
    return False


def _contain(frontier: DataFrame) -> DataFrame:
    """Lineage cut between relpath-predicate-bearing steps. Even with
    per-step base frontiers (linear growth per predicate CHAIN), a
    path stacking relpath predicates on several steps still embeds
    each step's whole pred subplan into the next step's frontier —
    multiplicative across steps × nesting (two round-10 5k-campaign
    cases compiled past the 2.4M-char ceiling). A LAZY localCheckpoint
    hands back a LogicalRDD leaf — bounded plan text, no extra eager
    job — the same discipline docmodel._share_lineage applies at
    pipeline boundaries, here at the step grain. Local masters only
    (localCheckpoint blocks have no recomputation story off-local;
    docmodel's budgeted eager cuts govern there)."""
    sc = frontier.sparkSession.sparkContext
    if sc.master.startswith("local"):
        return frontier.localCheckpoint(eager=False)
    return frontier


def eval_steps(nodes: DataFrame, steps: list, frontier: DataFrame | None = None) -> DataFrame:
    """Apply a parsed xstep list to the node table. Returns the final
    frontier (node rows, deduped, any order — document order is
    node_key order within each doc). Maximal runs of predicate-less
    child::name steps collapse into one path-equality hash join (see
    _child_chain_join); the per-step XPath set-dedup is elided for
    axes that preserve uniqueness (_DUP_FREE_AXES — the chain join
    too: equal paths cannot nest, so distinct context intervals yield
    distinct results)."""
    if frontier is None:
        frontier = initial_frontier(nodes)
    frontier = frontier.select(*[c for c in frontier.columns if c in NODE_COLS or c.startswith("o_")])
    i = 0
    while i < len(steps):
        run = _chain_len(steps, i)
        if run >= 2:
            names = [steps[k][2][1] for k in range(i, i + run)]
            frontier = _child_chain_join(nodes, frontier, names)
            i += run
            dup_free = True
        else:
            _, axis, test, preds = steps[i]
            frontier = _test_filter(_axis_join(nodes, frontier, axis), axis, test)
            step_base = frontier
            for p in preds:
                frontier = _apply_pred(nodes, frontier, axis, p, base=step_base)
            i += 1
            dup_free = axis in _DUP_FREE_AXES
            if any(_has_rel_pred(p) for p in preds):
                frontier = _contain(frontier)
        if not dup_free:
            dedup_keys = ["doc", "node_key"] + [
                c for c in frontier.columns if c.startswith("o_")
            ]
            frontier = frontier.dropDuplicates(dedup_keys)
        frontier = frontier.select(
            *NODE_COLS, *[c for c in frontier.columns if c.startswith("o_")]
        )
    return frontier


# ------------------------------------------------------- serialization
def serialize_result(nodes: DataFrame, frontier: DataFrame) -> DataFrame:
    """frontier → (doc, node_key, text): the reference's XML
    serialization of each result item — subtree XML for elements,
    the value for attribute/text/comment results. Subtrees rebuild
    per result via one interval join + ONE JVM-side aggregate over
    the pre-order node array (assemble_xml_col) — the former
    applyInPandas rebuild paid ~1 s Python-worker init + ~3 s run
    per stage and dominated XMark doc-engine time."""
    from sirix_spark.sources.xml_source import (
        assemble_node_struct,
        assemble_xml_col,
    )

    direct = frontier.filter(F.col("kind") != ELEMENT).select(
        "doc",
        "node_key",
        F.when(F.col("kind") == COMMENT, F.concat(F.lit("<!--"), F.col("value"), F.lit("-->")))
        .otherwise(F.coalesce(F.col("value"), F.lit("")))
        .alias("text"),
    )
    roots = frontier.filter(F.col("kind") == ELEMENT).select(
        F.col("doc").alias("r_doc"),
        F.col("node_key").alias("r_key"),
        F.col("descendant_count").alias("r_dc"),
    )
    span = nodes.join(
        roots,
        (F.col("doc") == F.col("r_doc"))
        & (F.col("node_key") >= F.col("r_key"))
        & (F.col("node_key") <= F.col("r_key") + F.col("r_dc")),
        "inner",
    )
    rebuilt = (
        span.filter(F.col("kind") != DOCUMENT)  # assembler caller contract
        .groupBy("doc", "r_key")
        .agg(F.array_sort(F.collect_list(assemble_node_struct())).alias("__nds"))
        .select(
            "doc",
            F.col("r_key").alias("node_key"),
            assemble_xml_col(F.col("__nds")).alias("text"),
        )
    )
    return direct.unionByName(rebuilt)
