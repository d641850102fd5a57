"""Paired-oracle fuzz of the XPath/XML axis surface.

The round-9 per-origin positional defect (jsoniq/xpath.py
_positional) was found by manual review, not by the 860-case corpus
replay or the JSONiq grammar fuzzer — evidence this family has live
defect classes generative testing should own. The reference pins
these semantics with dedicated unit suites
(bundles/sirix-core/src/test/java/io/sirix/axis/ —
DescendantAxisTest.java, FollowingSiblingAxisTest.java, …) and a
fuzz family (bundles/sirix-core/src/test/java/io/sirix/fuzz/); this
generator covers the same surface systematically:

- random small XML trees: nested, repeated element names, attributes,
  interleaved text and comments — the converging-origin shapes the
  r9 defect needed;
- random step chains over ALL §2.9 axes (child, descendant(-or-self),
  self, parent, ancestor(-or-self), following(-sibling),
  preceding(-sibling), attribute), name/*/text()/comment()/node()
  tests, abbreviations (//, ., .., @), and predicates: positional [n],
  [last()], relative-path existence/comparison (with nested
  positional predicates — the r9 bug class), and/or chains, absolute
  paths;
- a NAIVE tree-walking oracle evaluated over the generated tree —
  plain Python lists, no Spark — built alongside the query text so
  oracle and query cannot drift.

Engine-contract points the oracle mirrors deliberately (each is
corpus-pinned reference behavior, not spec deviation):
- ancestor:: stops BEFORE the document node (AncestorAxis.java),
  while parent::node() does return it;
- the document node serializes as the empty string;
- predicate `and` chains apply sequentially (each predicate filters
  and renumbers, like [p1][p2]); `or` unions per-context survivors;
- value comparisons are string-value vs literal: numeric literals
  compare as doubles (non-numeric string-values never match),
  string literals compare as raw strings.

Round-10 finds (fixed in jsoniq/xpath.py before the campaign):
sibling axes leaked an attribute context's element children;
self/descendant-or-self::node() from an attribute context returned
empty (node() test wrongly excluded attributes); or-predicate dedup
collapsed rows across contexts.

Usage::

    python tools/fuzz_xpath.py --n 5000 --seed 1

or in-suite via tests/test_fuzz_xpath.py (seeded, budgeted subset).
"""

from __future__ import annotations

import random

NAMES = ["a", "b", "c", "d"]
ATTR_NAMES = ["id", "k", "v"]
WORDS = ["x", "y", "zz", "hello", "7", "12", "3", "0", "19"]

FORWARD_AXES = [
    "child", "descendant", "descendant-or-self", "self",
    "following-sibling", "following",
]
REVERSE_AXES = [
    "parent", "ancestor", "ancestor-or-self",
    "preceding-sibling", "preceding",
]
REVERSE_SET = {"preceding", "preceding-sibling", "ancestor", "ancestor-or-self"}

#: compiled-plan size ceiling per case (same fail-fast contract as
#: tools/fuzz_jsoniq.py MAX_PLAN_CHARS: one pathological case must
#: fail cleanly and keep the shared JVM session). Honest axis chains
#: compile to well under 100k chars of logical plan.
MAX_PLAN_CHARS = 2_000_000


# --------------------------------------------------------- tree model
class N:
    __slots__ = ("kind", "name", "value", "parent", "children", "attrs",
                 "key", "end")

    def __init__(self, kind, name=None, value=None):
        self.kind = kind  # "doc" | "elem" | "text" | "attr"
        self.name = name
        self.value = value
        self.parent = None
        self.children = []
        self.attrs = []
        self.key = -1
        self.end = -1


def _number(doc: N) -> list[N]:
    """Pre-order keys, attributes right after their element — the
    shredder's numbering (sources/xml_source.py). Returns all nodes
    by key."""
    out = []
    k = 0

    def visit(n):
        nonlocal k
        n.key = k
        out.append(n)
        k += 1
        for a in n.attrs:
            a.key = k
            a.end = k
            out.append(a)
            k += 1
        for c in n.children:
            visit(c)
        n.end = k - 1

    visit(doc)
    return out


def gen_tree(rng: random.Random) -> tuple[N, list[N]]:
    """Random doc: repeated names, attributes, interleaved text; at
    least 8 nodes so converging-origin shapes actually occur."""
    while True:
        def elem(depth):
            e = N("elem", rng.choice(NAMES))
            for an in rng.sample(ATTR_NAMES, rng.randrange(0, 3)):
                a = N("attr", an, rng.choice(WORDS))
                a.parent = e
                e.attrs.append(a)
            max_kids = max(0, 5 - depth)
            prev_text = False
            for _ in range(rng.randrange(0, max_kids + 1)):
                r = rng.random()
                if r < 0.08:
                    cm = N("comment", value=rng.choice(WORDS))
                    cm.parent = e
                    e.children.append(cm)
                    prev_text = False
                    continue
                make_text = depth >= 4 or r < 0.43
                if make_text and prev_text:
                    continue  # adjacent text nodes would coalesce on reparse
                if make_text:
                    t = N("text", value=rng.choice(WORDS))
                    t.parent = e
                    e.children.append(t)
                    prev_text = True
                else:
                    c = elem(depth + 1)
                    c.parent = e
                    e.children.append(c)
                    prev_text = False
            return e

        doc = N("doc")
        root = elem(1)
        root.parent = doc
        doc.children = [root]
        nodes = _number(doc)
        if len(nodes) >= 8:
            return doc, nodes


def to_xml(n: N) -> str:
    """Writer whose output is byte-identical to the engine's subtree
    serialization (attrs in written order, name="value", self-closing
    empty elements, raw text)."""
    if n.kind == "text":
        return n.value
    if n.kind == "comment":
        return f"<!--{n.value}-->"
    attrs = "".join(f' {a.name}="{a.value}"' for a in n.attrs)
    if not n.children:
        return f"<{n.name}{attrs}/>"
    inner = "".join(to_xml(c) for c in n.children)
    return f"<{n.name}{attrs}>{inner}</{n.name}>"


# ------------------------------------------------------ oracle: axes
def _ancestors(n: N) -> list[N]:
    out = []
    p = n.parent
    while p is not None:
        out.append(p)
        p = p.parent
    return out  # nearest first (reverse document order)


def _subtree(n: N) -> list[N]:
    out = []

    def rec(x):
        for c in x.children:
            out.append(c)
            rec(c)

    rec(n)
    return out


def axis_nodes(ctx: N, axis: str, all_nodes: list[N]) -> list[N]:
    """Axis results in PROXIMITY order (document order; reverse axes
    reversed) — mirrors _axis_join + _positional's ordering."""
    if axis == "child":
        return list(ctx.children)
    if axis == "attribute":
        return list(ctx.attrs)
    if axis == "descendant":
        return _subtree(ctx)
    if axis == "descendant-or-self":
        return [ctx] + _subtree(ctx)
    if axis == "self":
        return [ctx]
    if axis == "parent":
        return [ctx.parent] if ctx.parent is not None else []
    if axis == "ancestor":
        return [p for p in _ancestors(ctx) if p.kind != "doc"]
    if axis == "ancestor-or-self":
        return [ctx] + [p for p in _ancestors(ctx) if p.kind != "doc"]
    if axis == "following-sibling":
        if ctx.kind == "attr" or ctx.parent is None:
            return []
        sibs = ctx.parent.children
        i = sibs.index(ctx)
        return sibs[i + 1:]
    if axis == "preceding-sibling":
        if ctx.kind == "attr" or ctx.parent is None:
            return []
        sibs = ctx.parent.children
        i = sibs.index(ctx)
        return list(reversed(sibs[:i]))
    if axis == "following":
        return [x for x in all_nodes if x.key > ctx.end and x.kind != "attr"]
    if axis == "preceding":
        anc = set(id(p) for p in _ancestors(ctx))
        return list(reversed([
            x for x in all_nodes
            if x.key < ctx.key and x.kind != "attr" and id(x) not in anc
        ]))
    raise ValueError(f"axis {axis}")


def test_ok(n: N, axis: str, test: tuple) -> bool:
    if axis == "attribute":
        if test[0] == "name":
            return n.name == test[1]
        return test[0] in ("wildcard", "node")
    t = test[0]
    if t == "name":
        return n.kind == "elem" and n.name == test[1]
    if t == "wildcard":
        return n.kind == "elem"
    if t == "text":
        return n.kind == "text"
    if t == "comment":
        return n.kind == "comment"
    if t == "node":
        # node() is true for every node kind; the AXIS lists already
        # exclude attributes where the axis can't contain them
        return True
    raise ValueError(f"test {test}")


def sval(n: N) -> str:
    """XPath string-value, engine contract: attr/text → value;
    element → concatenated descendant text; document → ''."""
    if n.kind in ("attr", "text", "comment"):
        return n.value or ""
    if n.kind == "doc":
        return ""
    return "".join(x.value for x in _subtree(n) if x.kind == "text")


_CMP = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _cmp_sval(sv: str, op: str, lit) -> bool:
    if isinstance(lit, float):
        try:
            v = float(sv)
        except ValueError:
            return False
        return _CMP[op](v, lit)
    return _CMP[op](sv, lit)


def apply_pred(cands: list[N], axis: str, pred: tuple, doc: N,
               all_nodes: list[N]) -> list[N]:
    """One predicate over one context's candidate list (axis order).
    Mirrors _apply_pred: positional predicates renumber the current
    survivors; and = sequential; or = per-context union."""
    k = pred[0]
    if k == "pos":
        i = pred[1]
        return [cands[i - 1]] if 1 <= i <= len(cands) else []
    if k == "poslast":
        return cands[-1:]
    if k == "and":
        return apply_pred(
            apply_pred(cands, axis, pred[1], doc, all_nodes),
            axis, pred[2], doc, all_nodes,
        )
    if k == "or":
        a = apply_pred(cands, axis, pred[1], doc, all_nodes)
        b = apply_pred(cands, axis, pred[2], doc, all_nodes)
        keep = {id(x) for x in a} | {id(x) for x in b}
        return [n for n in cands if id(n) in keep]
    if k == "absexists":
        hit = bool(eval_steps_oracle(doc, pred[1], [doc], all_nodes))
        return cands if hit else []
    rel = pred[1]
    out = []
    for c in cands:
        res = eval_steps_oracle(doc, rel, [c], all_nodes)
        if k == "exists":
            if res:
                out.append(c)
        else:  # cmp
            _, _, op, lit = pred
            if any(_cmp_sval(sval(n), op, lit) for n in res):
                out.append(c)
    return out


def eval_steps_oracle(doc: N, steps: list, frontier: list[N],
                      all_nodes: list[N]) -> list[N]:
    cur = frontier
    for (_tag, axis, test, preds) in steps:
        nxt = []
        for ctx in cur:
            cands = [
                n for n in axis_nodes(ctx, axis, all_nodes)
                if test_ok(n, axis, test)
            ]
            for p in preds:
                cands = apply_pred(cands, axis, p, doc, all_nodes)
            nxt.extend(cands)
        seen = set()
        cur = []
        for n in sorted(nxt, key=lambda x: x.key):
            if id(n) not in seen:
                seen.add(id(n))
                cur.append(n)
    return cur


def serialize_oracle(result: list[N]) -> str:
    parts = []
    for n in sorted(result, key=lambda x: x.key):
        if n.kind == "elem":
            parts.append(to_xml(n))
        elif n.kind == "doc":
            parts.append("")
        elif n.kind == "comment":
            parts.append(f"<!--{n.value}-->")
        else:
            parts.append(n.value or "")
    return " ".join(parts)


# -------------------------------------------------- query generation
def _gen_test(rng, axis) -> tuple:
    if axis == "attribute":
        r = rng.random()
        if r < 0.6:
            return ("name", rng.choice(ATTR_NAMES))
        if r < 0.85:
            return ("wildcard",)
        return ("node",)
    r = rng.random()
    if r < 0.55:
        return ("name", rng.choice(NAMES))
    if r < 0.70:
        return ("wildcard",)
    if r < 0.84:
        return ("text",)
    if r < 0.91:
        return ("comment",)
    return ("node",)


def _render_test(axis: str, test: tuple) -> str:
    if test[0] == "name":
        return test[1]
    if test[0] == "wildcard":
        return "*"
    return f"{test[0]}()"


def _gen_relpath(rng, depth: int) -> tuple[list, str]:
    """1-2 step relative path for predicates; inner positional
    predicates (the r9 bug class) with real probability."""
    steps, text = [], []
    for i in range(rng.randrange(1, 3)):
        r = rng.random()
        if r < 0.15 and i == 0:
            steps.append(("xstep", "self", ("node",), []))
            text.append(".")
            continue
        if r < 0.45 and i > 0:
            # mid-relpath '//' (a relpath cannot START with '//' —
            # the predicate grammar reads a leading '/'-path as an
            # absolute-existence predicate)
            steps.append(("xstep", "descendant-or-self", ("node",), []))
            test = _gen_test(rng, "child")
            preds = _gen_inner_preds(rng, depth, "child")
            steps.append(("xstep", "child", test, preds))
            text.append("//" + _render_test("child", test)
                        + _render_preds_text(preds))
            continue
        if r < 0.25:
            axis = "attribute"
            test = _gen_test(rng, "attribute")
            if test[0] == "node":
                body = "attribute::node()"
            else:
                body = "@" + ("*" if test[0] == "wildcard" else test[1])
        elif r < 0.8:
            axis = "child"
            test = _gen_test(rng, "child")
            body = _render_test("child", test)
        else:
            axis = rng.choice(
                ["descendant", "following-sibling", "preceding-sibling",
                 "parent", "ancestor"]
            )
            test = _gen_test(rng, axis)
            body = f"{axis}::{_render_test(axis, test)}"
        preds = _gen_inner_preds(rng, depth, axis)
        steps.append(("xstep", axis, test, preds))
        sep = "" if i == 0 else "/"
        text.append(sep + body + _render_preds_text(preds))
    return steps, "".join(text)


#: per-path budget of relpath-bearing predicates (exists/cmp/
#: absexists). eval_steps has no mid-plan lineage cuts (docmodel owns
#: those), so every nested relpath multiplies the logical plan; a
#: path stacking ~10 of them compiled past the 2M-char ceiling
#: (campaign case 42/130). Positional predicates stay unbudgeted —
#: they're one window each.
MAX_REL_PREDS = 5
_BUDGET = {"rel": MAX_REL_PREDS}


def _gen_inner_preds(rng, depth: int, axis: str) -> list:
    if depth >= 2 or rng.random() < 0.7:
        return []
    r = rng.random()
    if r < 0.45 or _BUDGET["rel"] <= 0:
        return [("pos", rng.randrange(1, 4))]
    if r < 0.6:
        return [("poslast",)]
    # simple value comparison one level down (no further nesting)
    _BUDGET["rel"] -= 1
    rel, txt = _gen_relpath(rng, 99)
    _REL_TEXTS[id(rel)] = txt
    return [_gen_cmp(rng, rel)]


def _gen_cmp(rng, rel) -> tuple:
    op = rng.choice(["=", "=", "=", "!=", "<", "<=", ">", ">="])
    if rng.random() < 0.55:
        return ("cmp", rel, op, rng.choice(WORDS))
    return ("cmp", rel, op, float(rng.randrange(0, 21)))


def _render_pred_body(pred: tuple) -> str:
    k = pred[0]
    if k == "pos":
        return str(pred[1])
    if k == "poslast":
        return "last()"
    if k == "exists":
        return _rel_text(pred[1])
    if k == "cmp":
        lit = pred[3]
        lit_s = f"'{lit}'" if isinstance(lit, str) else str(int(lit))
        return f"{_rel_text(pred[1])} {pred[2]} {lit_s}"
    if k == "absexists":
        return _rel_text(pred[1], absolute=True)
    if k in ("and", "or"):
        return f"{_render_pred_body(pred[1])} {k} {_render_pred_body(pred[2])}"
    raise ValueError(k)


_REL_TEXTS: dict[int, str] = {}


def _rel_text(steps, absolute=False) -> str:
    return _REL_TEXTS[id(steps)]


def _render_preds_text(preds: list) -> str:
    return "".join(f"[{_render_pred_body(p)}]" for p in preds)


def _gen_pred(rng, depth: int, axis: str) -> tuple:
    r = rng.random()
    if r < 0.28 or (r >= 0.38 and _BUDGET["rel"] <= 0):
        return ("pos", rng.randrange(1, 5))
    if r < 0.38:
        return ("poslast",)
    if r < 0.43 and depth == 0:
        p1 = _gen_pred(rng, depth + 1, axis)
        p2 = _gen_pred(rng, depth + 1, axis)
        while p1[0] in ("and", "or"):
            p1 = _gen_pred(rng, depth + 1, axis)
        while p2[0] in ("and", "or"):
            p2 = _gen_pred(rng, depth + 1, axis)
        return (rng.choice(["and", "or"]), p1, p2)
    _BUDGET["rel"] -= 1
    if r < 0.48:
        rel, txt = _gen_relpath(rng, depth + 1)
        # absolute existence: reuse a relpath rendered from the root
        _REL_TEXTS[id(rel)] = "/" + txt if not txt.startswith("//") else txt
        return ("absexists", rel)
    rel, txt = _gen_relpath(rng, depth + 1)
    _REL_TEXTS[id(rel)] = txt
    if r < 0.72:
        return ("exists", rel)
    return _gen_cmp(rng, rel)


def _gen_preds(rng, axis: str) -> list:
    r = rng.random()
    if r < 0.5:
        return []
    if r < 0.88:
        return [_gen_pred(rng, 0, axis)]
    return [_gen_pred(rng, 0, axis), _gen_pred(rng, 0, axis)]


def gen_path(rng: random.Random) -> tuple[list, str]:
    """Random absolute path → (expected xstep tuples, query text)."""
    _REL_TEXTS.clear()
    _BUDGET["rel"] = MAX_REL_PREDS
    steps, text = [], []
    for i in range(rng.randrange(1, 5)):
        r = rng.random()
        if r < 0.40:
            test = _gen_test(rng, "child")
            preds = _gen_preds(rng, "child")
            if rng.random() < 0.35:
                steps.append(("xstep", "descendant-or-self", ("node",), []))
                text.append("//" + _render_test("child", test)
                            + _render_preds_text(preds))
            else:
                text.append("/" + _render_test("child", test)
                            + _render_preds_text(preds))
            steps.append(("xstep", "child", test, preds))
        elif r < 0.52:
            test = _gen_test(rng, "attribute")
            if test[0] == "node":
                test = ("wildcard",)
            preds = _gen_preds(rng, "attribute")
            body = "@" + ("*" if test[0] == "wildcard" else test[1])
            if rng.random() < 0.3:
                steps.append(("xstep", "descendant-or-self", ("node",), []))
                text.append("//" + body + _render_preds_text(preds))
            else:
                text.append("/" + body + _render_preds_text(preds))
            steps.append(("xstep", "attribute", test, preds))
        elif r < 0.62 and i > 0:
            if rng.random() < 0.6:
                steps.append(("xstep", "parent", ("node",), []))
                text.append("/..")
            else:
                steps.append(("xstep", "self", ("node",), []))
                text.append("/.")
        else:
            axis = rng.choice(FORWARD_AXES + REVERSE_AXES)
            test = _gen_test(rng, axis)
            preds = _gen_preds(rng, axis)
            steps.append(("xstep", axis, test, preds))
            text.append(
                f"/{axis}::{_render_test(axis, test)}"
                + _render_preds_text(preds)
            )
    return steps, "".join(text)


# ------------------------------------------------------------ runner
def _engine_eval(nodes_df, path_text: str, expected_steps: list,
                 max_plan_chars: int) -> str:
    from sirix_spark.jsoniq import parser as P
    from sirix_spark.jsoniq.xpath import eval_steps, serialize_result

    ast = P.parse("xml:doc('d','r')" + path_text)
    got_steps = list(ast.steps)
    if got_steps != expected_steps:
        raise AssertionError(
            f"parser disagreement: {got_steps!r} != {expected_steps!r}"
        )
    fr = eval_steps(nodes_df, ast.steps)
    size = len(fr._jdf.queryExecution().logical().toString())
    if size > max_plan_chars:
        raise RuntimeError(
            f"compiled plan too large: {size:,} chars > "
            f"{max_plan_chars:,} ceiling"
        )
    rows = serialize_result(nodes_df, fr).orderBy("doc", "node_key").collect()
    return " ".join(r.text for r in rows)


def run_fuzz(spark, n: int, seed: int, verbose: bool = False,
             doc_every: int = 8,
             max_plan_chars: int = MAX_PLAN_CHARS,
             threads: int = 4) -> list[dict]:
    """Run n generated cases; returns the failure list. A fresh tree
    is shredded every ``doc_every`` cases; query generation stays
    per-case random and is IDENTICAL for any thread count (each
    block's cases are generated from per-case seeds under one lock —
    the generator uses module-level state — then evaluated against
    Spark in parallel: fuzz jobs are 1-2 tiny tasks each, so worker
    threads fill the otherwise-idle cores)."""
    import threading as _threading

    from sirix_spark.sources.xml_source import shred_xml

    saved = {}
    # tiny-data session scope: one shuffle partition (node tables are
    # tens of rows; 32-partition windows are pure task overhead), AQE
    # off (its per-shuffle stage materialization adds a job per
    # exchange — thousands of stages across a campaign), constraint
    # propagation off (same superlinear-analysis scoping _doc_conf
    # applies: fuzz plans are deep node-table self-joins), and NO
    # codegen (janino compilation of one-shot tiny plans dominated
    # the per-case cost; interpreted mode measured ~35% faster).
    # Restored on exit.
    conf = {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    }
    for k, v in conf.items():
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    failures: list[dict] = []
    lock = _threading.Lock()
    blocks = [(s, min(s + doc_every, n)) for s in range(0, n, doc_every)]
    done = [0]

    def _gen_block(lo: int, hi: int):
        """Generate one block's tree + cases (NOT thread-safe — the
        path generator uses module globals; callers hold ``lock``).
        Case streams are byte-identical to the single-threaded
        runner: per-case seeds, block tree drawn from case lo's rng
        which then continues into lo's path."""
        cases = []
        doc = nodes = xml = None
        for i in range(lo, hi):
            rng = random.Random(seed * 1_000_003 + i)
            if i == lo:
                doc, nodes = gen_tree(rng)
                xml = to_xml(doc.children[0])
            steps, text = gen_path(rng)
            expected = serialize_oracle(
                eval_steps_oracle(doc, steps, [doc], nodes)
            )
            cases.append((i, text, steps, expected))
        return xml, cases

    def _worker():
        while True:
            with lock:
                if not blocks:
                    return
                lo, hi = blocks.pop(0)
                xml, cases = _gen_block(lo, hi)
            ndf = shred_xml(
                spark.createDataFrame([("d", xml)], "doc string, xml string")
            ).localCheckpoint(eager=True)
            for i, text, steps, expected in cases:
                try:
                    got = _engine_eval(ndf, text, steps, max_plan_chars)
                except Exception as e:  # noqa: BLE001 — a crash IS a finding
                    got = f"<{type(e).__name__}: {e}>"
                with lock:
                    done[0] += 1
                    if got != expected:
                        failures.append({
                            "case": i, "seed": seed, "xml": xml,
                            "path": text, "expected": expected, "got": got,
                        })
                        if verbose:
                            print(f"FAIL case {i}\n  xml: {xml}"
                                  f"\n  path: {text}\n  exp: {expected!r}"
                                  f"\n  got: {got!r}", flush=True)
                    elif verbose and done[0] % 200 == 0:
                        print(f"ok {done[0]}/{n}", flush=True)

    try:
        if threads <= 1:
            _worker()
        else:
            ts = [
                _threading.Thread(target=_worker, daemon=True)
                for _ in range(threads)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    failures.sort(key=lambda f: f["case"])
    return failures


def main() -> int:
    import argparse
    import sys

    sys.path.insert(0, ".")

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from sirix_spark import get_spark

    spark = get_spark("fuzz-xpath")
    failures = run_fuzz(
        spark, args.n, args.seed, verbose=args.verbose,
        threads=args.threads,
    )
    print(f"{args.n} cases, {len(failures)} failures")
    for f in failures[:10]:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
