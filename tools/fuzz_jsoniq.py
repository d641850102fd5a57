"""Grammar-level fuzz of the JSONiq string entry.

The reference fuzzes round-trips and temporal consistency
(bundles/sirix-core/src/test/java/io/sirix/fuzz/JsonRoundTripFuzz.java,
RandomWorkloadTemporalConsistencyFuzz.java); its query corpus is mined
dry, so the next correctness frontier is generative: random
FLWOR/path/arithmetic/predicate compositions whose expected output is
computed by a naive Python evaluator built ALONGSIDE the query text —
each generator returns ``(jsoniq_text, python_eval_fn)`` pairs, so the
oracle cannot drift from the query.

Restrictions that keep the naive oracle trivially correct:

- integers only in arithmetic (+ - *), so no float/decimal formatting;
- every record carries every field (no empty-sequence propagation);
- the return clause is always an OBJECT constructor, so items
  serialize as compact JSON and atomic string-quoting rules never
  apply;
- ``order by`` keys either ARE or END WITH the unique int field
  ``a``, so stability cannot be observed (string keys — ASCII only,
  so Spark and Python agree on collation — always carry the unique
  tiebreaker);
- string comparisons are eq/ne only (no collation);
- ``group by`` keys are plain record fields and groups are ordered
  by key, so group emission order cannot be observed.

Round-9 grammar extensions (round-8 verdict ask 7): string order-by
keys (with tiebreaker), a group-by shape (let-key + count/sum over
the grouped variable), let-bound sequences consumed more than once
(``let $q := $x.arr[]`` then sum($q)/count($q) in several object
entries), and nested object/array constructors in return position.

Usage::

    python tools/fuzz_jsoniq.py --n 5000 --seed 1

or in-suite via tests/test_fuzz_jsoniq.py (seeded, budgeted subset).
"""

from __future__ import annotations

import json
import random

STRS = ["apple", "pear", "kiwi", "fig", "plum", "zz top", "x"]
CMPS = [
    ("eq", lambda a, b: a == b),
    ("ne", lambda a, b: a != b),
    ("lt", lambda a, b: a < b),
    ("le", lambda a, b: a <= b),
    ("gt", lambda a, b: a > b),
    ("ge", lambda a, b: a >= b),
]
OPS = [("+", lambda a, b: a + b), ("-", lambda a, b: a - b), ("*", lambda a, b: a * b)]


def _compact(v) -> str:
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def gen_records(rng: random.Random) -> list[dict]:
    n = rng.randrange(2, 9)
    a_vals = list(range(n))
    rng.shuffle(a_vals)
    return [
        {
            "a": a_vals[i],
            "b": rng.randrange(0, 21),
            "s": rng.choice(STRS),
            "f": rng.random() < 0.5,
            "o": {"x": rng.randrange(0, 21), "y": rng.choice(STRS)},
            "arr": [rng.randrange(0, 21) for _ in range(rng.randrange(1, 5))],
        }
        for i in range(n)
    ]


# env maps var name -> python value; rec vars hold a record dict.
# kinds: "rec" | "int"
def gen_int(rng, d, env: dict[str, str]):
    rec_vars = [v for v, k in env.items() if k == "rec"]
    int_vars = [v for v, k in env.items() if k == "int"]
    seq_vars = [v for v, k in env.items() if k == "iseq"]
    choices = ["lit", "lit"]
    if rec_vars:
        choices += ["field", "field", "agg"]
    if int_vars:
        choices += ["ivar", "ivar"]
    if seq_vars:
        # a let-bound integer sequence, consumed via an aggregate —
        # appearing in several object entries exercises multi-use of
        # one binding (round-9 grammar extension)
        choices += ["aggseq", "aggseq"]
    if d > 0:
        choices += ["arith", "arith", "if", "switch"]
    c = rng.choice(choices)
    if c == "switch":
        # round-10 grammar: the switch expression (desugars to
        # fn:deep-equal chains) — integer operand, literal cases,
        # first match wins in both engine and oracle
        st, sf = gen_int(rng, d - 1, env)
        cases = []
        for _ in range(rng.randrange(1, 4)):
            lit = rng.randrange(0, 21)
            rt, rf = gen_int(rng, d - 1, env)
            cases.append((lit, rt, rf))
        dt, dfn = gen_int(rng, d - 1, env)
        text = (
            f"(switch ({st}) "
            + " ".join(f"case {l} return {t}" for l, t, _ in cases)
            + f" default return {dt})"
        )

        def ev(env_, sf=sf, cases=tuple(cases), dfn=dfn):
            v = sf(env_)
            for lit, _t, rf in cases:
                if v == lit:
                    return rf(env_)
            return dfn(env_)

        return text, ev
    if c == "aggseq":
        v = rng.choice(seq_vars)
        fn = rng.choice(["sum", "count", "min", "max"])
        py = {"sum": sum, "count": len, "min": min, "max": max}[fn]
        return f"{fn}(${v})", (lambda env_, v=v, py=py: py(env_[v]))
    if c == "lit":
        v = rng.randrange(0, 21)
        return str(v), (lambda env_, v=v: v)
    if c == "ivar":
        v = rng.choice(int_vars)
        return f"${v}", (lambda env_, v=v: env_[v])
    if c == "field":
        v = rng.choice(rec_vars)
        path = rng.choice(["a", "b", "o.x"])
        if path == "o.x":
            return f"${v}.o.x", (lambda env_, v=v: env_[v]["o"]["x"])
        return f"${v}.{path}", (lambda env_, v=v, p=path: env_[v][p])
    if c == "agg":
        v = rng.choice(rec_vars)
        fn = rng.choice(["sum", "count", "min", "max"])
        py = {"sum": sum, "count": len, "min": min, "max": max}[fn]
        return f"{fn}(${v}.arr[])", (lambda env_, v=v, py=py: py(env_[v]["arr"]))
    if c == "arith":
        lt, lf = gen_int(rng, d - 1, env)
        rt, rf = gen_int(rng, d - 1, env)
        op, opf = rng.choice(OPS)
        return f"({lt} {op} {rt})", (lambda env_, lf=lf, rf=rf, opf=opf: opf(lf(env_), rf(env_)))
    # if
    pt, pf = gen_bool(rng, d - 1, env)
    at, af = gen_int(rng, d - 1, env)
    bt, bf = gen_int(rng, d - 1, env)
    return (
        f"(if ({pt}) then {at} else {bt})",
        lambda env_, pf=pf, af=af, bf=bf: af(env_) if pf(env_) else bf(env_),
    )


def gen_str(rng, d, env):
    rec_vars = [v for v, k in env.items() if k == "rec"]
    choices = ["lit"]
    if rec_vars:
        choices += ["field", "field"]
    if d > 0:
        choices.append("if")
    c = rng.choice(choices)
    if c == "lit":
        s = rng.choice(STRS)
        return f'"{s}"', (lambda env_, s=s: s)
    if c == "field":
        v = rng.choice(rec_vars)
        path = rng.choice(["s", "o.y"])
        if path == "o.y":
            return f"${v}.o.y", (lambda env_, v=v: env_[v]["o"]["y"])
        return f"${v}.s", (lambda env_, v=v: env_[v]["s"])
    pt, pf = gen_bool(rng, d - 1, env)
    at, af = gen_str(rng, d - 1, env)
    bt, bf = gen_str(rng, d - 1, env)
    return (
        f"(if ({pt}) then {at} else {bt})",
        lambda env_, pf=pf, af=af, bf=bf: af(env_) if pf(env_) else bf(env_),
    )


def gen_bool(rng, d, env):
    rec_vars = [v for v, k in env.items() if k == "rec"]
    choices = ["icmp", "icmp", "scmp"]
    if rec_vars:
        choices.append("flag")
    if d > 0:
        choices += ["and", "or", "not"]
    c = rng.choice(choices)
    if c == "flag":
        v = rng.choice(rec_vars)
        return f"${v}.f", (lambda env_, v=v: env_[v]["f"])
    if c == "icmp":
        lt, lf = gen_int(rng, max(d - 1, 0), env)
        rt, rf = gen_int(rng, max(d - 1, 0), env)
        op, opf = rng.choice(CMPS)
        return f"({lt} {op} {rt})", (lambda env_, lf=lf, rf=rf, opf=opf: opf(lf(env_), rf(env_)))
    if c == "scmp":
        lt, lf = gen_str(rng, max(d - 1, 0), env)
        rt, rf = gen_str(rng, max(d - 1, 0), env)
        op, opf = rng.choice(CMPS[:2])
        return f"({lt} {op} {rt})", (lambda env_, lf=lf, rf=rf, opf=opf: opf(lf(env_), rf(env_)))
    if c == "not":
        pt, pf = gen_bool(rng, d - 1, env)
        return f"not({pt})", (lambda env_, pf=pf: not pf(env_))
    lt, lf = gen_bool(rng, d - 1, env)
    rt, rf = gen_bool(rng, d - 1, env)
    if c == "and":
        return f"({lt} and {rt})", (lambda env_, lf=lf, rf=rf: lf(env_) and rf(env_))
    return f"({lt} or {rt})", (lambda env_, lf=lf, rf=rf: lf(env_) or rf(env_))


def gen_array(rng, d, env):
    """A literal array constructor `[e1, …]` of int/str elements."""
    ne = rng.randrange(1, 4)
    elems = []
    for _ in range(ne):
        kind = rng.choice(["int", "int", "str"])
        elems.append({"int": gen_int, "str": gen_str}[kind](rng, d, env))
    text = "[" + ", ".join(t for t, _ in elems) + "]"

    def build(env_, elems=elems):
        return [f(env_) for _, f in elems]

    return text, build


def gen_object(rng, d, env):
    nf = rng.randrange(1, 4)
    entries = []
    for i in range(nf):
        kinds = ["int", "int", "str", "bool"]
        if d > 0:
            # nested constructors in return position (round-9
            # grammar extension)
            kinds += ["obj", "arr"]
        kind = rng.choice(kinds)
        t, f = {
            "int": gen_int,
            "str": gen_str,
            "bool": gen_bool,
            "obj": lambda rng, d, env: gen_object(rng, d - 1, env),
            "arr": lambda rng, d, env: gen_array(rng, d - 1, env),
        }[kind](rng, d, env)
        entries.append((f"k{i}", t, f))
    text = "{" + ", ".join(f'"{k}": {t}' for k, t, _ in entries) + "}"

    def build(env_, entries=entries):
        return {k: f(env_) for k, _, f in entries}

    return text, build


def gen_query(rng: random.Random, records: list[dict], db: str, res: str):
    """Returns (query_text, expected_serialized_output)."""
    shape = rng.choice(
        ["flwor", "flwor", "flwor", "scalar", "topagg", "groupby"]
    )
    if shape == "groupby":
        # let-bound key, group by, ordered groups, aggregates over the
        # grouped (now sequence-valued) for variable
        keyf = rng.choice(["s", "b", "o.x"])
        keypath = {"s": "$x.s", "b": "$x.b", "o.x": "$x.o.x"}[keyf]
        keyget = {
            "s": lambda r: r["s"],
            "b": lambda r: r["b"],
            "o.x": lambda r: r["o"]["x"],
        }[keyf]
        aggf = rng.choice(["b", "a", "o.x"])
        aggget = {
            "b": lambda r: r["b"],
            "a": lambda r: r["a"],
            "o.x": lambda r: r["o"]["x"],
        }[aggf]
        aggpath = {"b": "$r.b", "a": "$r.a", "o.x": "$r.o.x"}[aggf]
        query = (
            f"for $x in jn:doc('{db}','{res}')[] let $g := {keypath} "
            f"group by $g order by $g return "
            '{"g": ' + "$g" + ', "n": count($x), "t": '
            f"sum(for $r in $x return {aggpath})" + "}"
        )
        groups: dict = {}
        for r in records:
            groups.setdefault(keyget(r), []).append(r)
        expected = " ".join(
            _compact({"g": k, "n": len(g), "t": sum(aggget(r) for r in g)})
            for k, g in sorted(groups.items())
        )
        return query, expected
    if shape == "scalar":
        env = {}
        parts = []
        vals = {}
        for v in ("va", "vb")[: rng.randrange(1, 3)]:
            t, f = gen_int(rng, 2, env)
            vals[v] = f(vals)
            parts.append(f"let ${v} := {t}")
            env[v] = "int"
        ot, of = gen_object(rng, 2, env)
        parts.append(f"return {ot}")
        return " ".join(parts), _compact(of(vals))

    if shape == "topagg":
        env = {"x": "rec"}
        fn = rng.choice(["sum", "count"])
        where_t, where_f = (None, None)
        if rng.random() < 0.6:
            where_t, where_f = gen_bool(rng, 2, env)
        it, if_ = gen_int(rng, 2, env)
        inner = f"for $x in jn:doc('{db}','{res}')[] "
        if where_t:
            inner += f"where {where_t} "
        inner += f"return {it}"
        vals = [if_({"x": r}) for r in records if (where_f({"x": r}) if where_f else True)]
        agg = sum(vals) if fn == "sum" else len(vals)
        return "{" + f'"v": {fn}(({inner}))' + "}", _compact({"v": agg})

    # flwor
    env = {"x": "rec"}
    clauses = []
    use_pos = rng.random() < 0.3
    clauses.append(
        f"for $x{' at $p' if use_pos else ''} in jn:doc('{db}','{res}')[]"
    )
    if use_pos:
        env["p"] = "int"
    tuples = [{"x": r, "p": i + 1} for i, r in enumerate(records)]
    nested = rng.random() < 0.3
    if nested:
        clauses.append("for $z in $x.arr[]")
        env["z"] = "int"
        tuples = [{**t, "z": e} for t in tuples for e in t["x"]["arr"]]
    if rng.random() < 0.4:
        t, f = gen_int(rng, 2, env)
        clauses.append(f"let $y := {t}")
        env["y"] = "int"
        tuples = [{**tp, "y": f(tp)} for tp in tuples]
    if rng.random() < 0.3:
        # sequence-valued let, consumed (possibly several times) by
        # aggseq int expressions in the return object
        clauses.append("let $q := $x.arr[]")
        env["q"] = "iseq"
        tuples = [{**tp, "q": tp["x"]["arr"]} for tp in tuples]
    if rng.random() < 0.6:
        t, f = gen_bool(rng, 2, env)
        clauses.append(f"where {t}")
        tuples = [tp for tp in tuples if f(tp)]
    if not nested and rng.random() < 0.5:
        desc = rng.random() < 0.5
        if rng.random() < 0.4:
            # string primary key + the unique int tiebreaker (ASCII
            # strings, so Spark and Python agree); independent
            # per-key directions
            desc2 = rng.random() < 0.5
            clauses.append(
                f"order by $x.s{' descending' if desc else ''}, "
                f"$x.a{' descending' if desc2 else ''}"
            )
            tuples = sorted(
                tuples, key=lambda tp: tp["x"]["a"], reverse=desc2
            )
            tuples = sorted(
                tuples, key=lambda tp: tp["x"]["s"], reverse=desc
            )
        else:
            clauses.append(f"order by $x.a{' descending' if desc else ''}")
            tuples = sorted(tuples, key=lambda tp: tp["x"]["a"], reverse=desc)
    ot, of = gen_object(rng, 2, env)
    clauses.append(f"return {ot}")
    expected = " ".join(_compact(of(tp)) for tp in tuples)
    return " ".join(clauses), expected


#: compiled-plan size ceiling per fuzz case. The round-8 campaign's
#: first find was a case whose compiled logical plan serialized to a
#: 76.7 MiB task binary and OOM'd the shared 16 GiB local[32] JVM —
#: one pathological case must fail CLEANLY and keep the session. The
#: scalar compiler is linear in AST size since round 9 (_let1/_let2
#: in jsoniq/docmodel.py), so honest cases sit around 10-60k chars;
#: anything near the ceiling is a regression, not a big query.
MAX_PLAN_CHARS = 2_000_000


def _execute_guarded(ev, query: str, max_plan_chars: int = MAX_PLAN_CHARS) -> str:
    """Compile, assert the compiled logical plan stays small, then
    execute — the fail-fast gate between compile and the Spark action
    so a compiler blowup fails one case instead of killing the JVM."""
    from sirix_spark.jsoniq import parser as P

    ast = P.parse(query)
    with ev._doc_conf():
        seq = ev.compile(ast)
        size = len(seq.df._jdf.queryExecution().logical().toString())
        if size > max_plan_chars:
            raise RuntimeError(
                f"compiled plan too large: {size:,} chars "
                f"> {max_plan_chars:,} ceiling"
            )
        return ev.serialize(seq)


def run_fuzz(
    spark, store_dir: str, n: int, seed: int, verbose: bool = False,
    doc_every: int = 10, max_plan_chars: int = MAX_PLAN_CHARS,
):
    """Run n generated cases; returns the list of failure dicts.

    A fresh document is generated and stored every ``doc_every``
    cases (storing is the expensive step; query generation stays
    per-case random), so ~doc_every queries amortize each store."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    store = DocumentStore(spark, store_dir)
    failures = []
    records, db, res = None, "fz", None
    for i in range(n):
        rng = random.Random(seed * 1_000_003 + i)
        if records is None or i % doc_every == 0:
            records = gen_records(rng)
            res = f"r{i}.jn"
            store.store(db, res, json.dumps(records))
        query, expected = gen_query(rng, records, db, res)
        try:
            got = _execute_guarded(
                DocEvaluator(spark, store), query, max_plan_chars
            )
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            got = f"<{type(e).__name__}: {e}>"
        if got != expected:
            failures.append(
                {"case": i, "seed": seed, "query": query, "expected": expected, "got": got}
            )
            if verbose:
                print(f"FAIL case {i}\n  q: {query}\n  exp: {expected}\n  got: {got}")
        elif verbose and i % 50 == 0:
            print(f"ok {i}")
    return failures


def main() -> int:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, ".")
    from sirix_spark.session import get_spark

    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="jsoniq_fuzz_")
    import time

    t0 = time.time()
    failures = run_fuzz(spark, tmp, n=args.n, seed=args.seed, verbose=True)
    dt = time.time() - t0
    print(f"{args.n} cases in {dt:.0f}s ({dt / max(args.n, 1) * 1000:.0f} ms/case): "
          f"{len(failures)} failures")
    for f in failures[:20]:
        print(json.dumps(f, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
