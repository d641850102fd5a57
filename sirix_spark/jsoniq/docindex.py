"""Index scans over the document node table.

The reference materializes CAS / path / name indexes as red-black
trees inside the resource (bundles/sirix-core/.../index/...); scans
(jn:scan-cas-index, jn:scan-path-index, jn:scan-name-index,
jn:scan-cas-index-range — bundles/sirix-query/.../function/jn/*.java)
filter by typed value and path-summary path.  Spark-first: the node
table's (kind, path, json) columns answer the same scans as column
filters — the columnar layout is the index (predicate pushdown +
min/max pruning at scale); the DocumentStore registry preserves
index numbering / find-index semantics.

Path patterns: ``/name`` field steps, ``/[]`` array steps, ``*`` any
field, ``//`` descendant. Matching node sets per the reference's
path summary: patterns ending in a name select FIELD nodes; patterns
ending in ``[]`` select ARRAY nodes (primitives live under their
container's path and are selected by CAS scans only).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sirix_spark.jsoniq import parser as P
from sirix_spark.jsoniq.compiler import JsoniqCompileError


def path_pattern_regex(pat: str) -> str:
    rx, i = "^", 0
    while i < len(pat):
        if pat.startswith("//", i):
            rx += "(?:/[^/]+)*"
            i += 1
        elif pat[i] == "/":
            rx += "/"
            i += 1
        else:
            j = pat.find("/", i)
            seg = pat[i:] if j < 0 else pat[i:j]
            if seg == "[]":
                rx += re.escape("[]")
            elif seg == "*":
                rx += r"(?!\[\])[^/]+"
            else:
                rx += re.escape(seg)
            i += len(seg)
    return rx + "$"


def _path_cond(patterns: tuple[str, ...]):
    conds = None
    for p in patterns:
        c = F.col("n_path").rlike(path_pattern_regex(p))
        conds = c if conds is None else (conds | c)
    return conds if conds is not None else F.lit(True)


_CAS_KINDS = {
    "xs:string": "string",
    "xs:integer": "number",
    "xs:decimal": "number",
    "xs:double": "number",
    "xs:float": "number",
    "xs:boolean": "boolean",
    # stored as string nodes, compared as instants (see scan below):
    # lexicographic order only matches chronological order for
    # uniformly Z-normalized equal-precision strings; values with
    # numeric offsets (+01:00) or mixed fractional-second precision
    # need the typed comparison the reference's dateTime CAS keys get
    # (round-7 ADVICE #2).
    "xs:dateTime": "string",
}


def _lit_value(ev, node, scope):
    if isinstance(node, P.Lit):
        return node.value
    if isinstance(node, P.Unary) and node.op == "-":
        return -_lit_value(ev, node.operand, scope)
    if isinstance(node, P.Var):
        sv = ev.static_env.get(node.name)
        if sv and sv[0] == "value":
            return sv[1]
    raise JsoniqCompileError("index scan arguments must be static")


def _paths_arg(ev, node, scope) -> tuple[str, ...]:
    if node is None:
        return ()
    if isinstance(node, P.SeqCtor):
        return tuple(_lit_value(ev, item, scope) for item in node.items)
    v = _lit_value(ev, node, scope)
    return (v,) if isinstance(v, str) else tuple(v)


def _resolve_handle(ev, node, scope) -> int:
    if isinstance(node, P.Call) and node.name in ("jn:doc", "doc"):
        return ev._open_handle(node)
    if isinstance(node, P.Var):
        info = scope.get(node.name) or {}
        if info.get("kind") == "handle":
            return info["handle"]
        sv = ev.static_env.get(node.name)
        if sv and sv[0] == "handle":
            return sv[1]
    raise JsoniqCompileError("index scan needs a jn:doc handle")


def scan_index_seq(ev, node: P.Call, stream, scope):
    """Compile a jn:scan-*-index call to a node-table filter Seq."""
    from sirix_spark.jsoniq.docmodel import ITEM_COLS, Seq, _nodes_view

    name = node.name
    hid = _resolve_handle(ev, node.args[0], scope)
    h = ev.handles.get(hid)
    number = int(_lit_value(ev, node.args[1], scope))
    idx = ev.store.index_def(h.db, h.res, number)
    nv = _nodes_view(h)

    if name == "jn:scan-cas-index" or name == "jn:scan-cas-index-range":
        kind = _CAS_KINDS.get(idx.content_type)
        if kind is None:
            raise JsoniqCompileError(
                f"unsupported CAS type {idx.content_type!r}"
            )
        cond = (F.col("n_kind") == kind) & _path_cond(idx.paths)
        if name == "jn:scan-cas-index":
            value = _lit_value(ev, node.args[2], scope)
            op = _lit_value(ev, node.args[3], scope)
            pf = _paths_arg(ev, node.args[4] if len(node.args) > 4 else None, scope)
            if pf:
                cond = cond & _path_cond(pf)
            if kind == "number":
                col = F.col("n_json").cast("double")
                lit = F.lit(float(value))
            else:
                col = F.get_json_object(
                    F.concat(F.lit('{"v":'), F.col("n_json"), F.lit("}")), "$.v"
                )
                lit = F.lit(str(value))
                if idx.content_type == "xs:dateTime":
                    # typed instant comparison: both sides normalize
                    # to UTC timestamps (offset-aware, precision-free)
                    # instead of lexicographic strings
                    col = col.cast("timestamp")
                    lit = lit.cast("timestamp")
            ops = {
                "==": col == lit, "!=": col != lit,
                "<": col < lit, "<=": col <= lit,
                ">": col > lit, ">=": col >= lit,
            }
            if op not in ops:
                raise JsoniqCompileError(f"unsupported scan op {op!r}")
            cond = cond & ops[op]
            if idx.content_type == "xs:integer":
                cond = cond & ~F.col("n_json").contains(".")
        else:
            inc_lo = bool(_lit_value(ev, node.args[4], scope))
            inc_hi = bool(_lit_value(ev, node.args[5], scope))
            pf = _paths_arg(ev, node.args[6] if len(node.args) > 6 else None, scope)
            if pf:
                cond = cond & _path_cond(pf)
            if idx.content_type == "xs:dateTime":
                lo = F.lit(str(_lit_value(ev, node.args[2], scope))).cast("timestamp")
                hi = F.lit(str(_lit_value(ev, node.args[3], scope))).cast("timestamp")
                col = F.get_json_object(
                    F.concat(F.lit('{"v":'), F.col("n_json"), F.lit("}")), "$.v"
                ).cast("timestamp")
            else:
                lo = F.lit(float(_lit_value(ev, node.args[2], scope)))
                hi = F.lit(float(_lit_value(ev, node.args[3], scope)))
                col = F.col("n_json").cast("double")
            cond = cond & (col >= lo if inc_lo else col > lo)
            cond = cond & (col <= hi if inc_hi else col < hi)
    elif name == "jn:scan-name-index":
        names = idx.paths  # stored names for name indexes
        cond = F.col("n_kind") == "field"
        if names:
            cond = cond & F.col("n_fname").isin(*names)
        if len(node.args) > 2:
            wanted = _lit_value(ev, node.args[2], scope)
            cond = cond & (F.col("n_fname") == wanted)
    elif name == "jn:scan-path-index":
        pf = _paths_arg(ev, node.args[2] if len(node.args) > 2 else None, scope)
        patterns = pf or idx.paths
        sel = []
        for p in patterns:
            last = p.rsplit("/", 1)[-1]
            target_kind = "array" if last == "[]" else "field"
            sel.append(
                (F.col("n_kind") == target_kind)
                & F.col("n_path").rlike(path_pattern_regex(p))
            )
        cond = sel[0]
        for c in sel[1:]:
            cond = cond | c
    else:
        raise JsoniqCompileError(f"unknown scan function {name}")

    matched = nv.filter(cond)
    joined = stream.crossJoin(F.broadcast(matched))
    df = (
        joined.withColumn(
            "__ord", F.concat("__ord", F.array(F.col("n_key").cast("bigint")))
        )
        .withColumn("__k", F.col("n_key"))
        .withColumn("__h", F.lit(hid))
        .withColumn("__r", F.lit(h.revision))
        .withColumn("__sz", F.col("n_sz"))
        .withColumn("__j", F.col("n_json"))
    )
    df = df.drop(*[c for c in df.columns if c.startswith("n_")])
    return Seq(df, True, (hid,), "many")
