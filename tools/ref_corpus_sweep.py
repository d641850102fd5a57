"""Extract and replay JsonQueryCorrectnessSweepTest.java — the
reference's 61-case correctness sweep (arithmetic, FLWOR joins and
group-by, string/number function library, numeric-precision edge
cases, unicode, and time-travel over generated revision chains).

The Java harness stores each case's document (or builds a revision
chain from a list of full document states via in-place JSONiq
updates), substitutes DB/RES placeholders into the query, and
compares results as space-joined sequences of JSON values (numbers by
numeric value, objects key-order-insensitive, quoted-vs-bare string
leniency). This module replicates the harness: the extraction reuses
tools/extract_ref_corpus's Java-literal evaluator; `build_revisions`
mirrors the reference's emitUpdates diff (matching object keys /
equal-length arrays recurse, everything else replaces); and
`results_equal` mirrors resultsEqual/itemsEqual/splitTopLevel."""

from __future__ import annotations

import json
import re
from decimal import Decimal

from tools.extract_ref_corpus import (
    REF_QUERY_TEST_DIR,
    _Evaluator,
    _find_call,
    _split_args,
)

SWEEP_FILE = (
    REF_QUERY_TEST_DIR / "function/jn/io/JsonQueryCorrectnessSweepTest.java"
)

DB, RES = "mycol", "myres"


# ----------------------------------------------------------- extraction
def extract_sweep_cases() -> list[dict]:
    src = SWEEP_FILE.read_text()
    ev = _Evaluator({})
    cases = []
    pat = re.compile(r"Case\.(single|revs)\s*\(")
    idx = 0
    while True:
        m = pat.search(src, idx)
        if not m:
            break
        kind = m.group(1)
        args_src, idx = _find_call(src, f"Case.{kind}", m.start())
        args = [ev.value(a) for a in _split_args(args_src)]
        if kind == "single":
            name, data, query, expected = args
            cases.append(
                {
                    "name": f"Sweep#{name}",
                    "source": "JsonQueryCorrectnessSweepTest.java",
                    "setup": [],
                    "sweep_data": data,
                    "query": _substitute(query),
                    "expected": expected,
                    "compare": "sweep-json",
                    "ignore_node_keys": False,
                }
            )
        else:
            name, query, expected = args[:3]
            cases.append(
                {
                    "name": f"Sweep#{name}",
                    "source": "JsonQueryCorrectnessSweepTest.java",
                    "setup": [],
                    "sweep_revisions": args[3:],
                    "query": _substitute(query),
                    "expected": expected,
                    "compare": "sweep-json",
                    "ignore_node_keys": False,
                }
            )
    return cases


def _substitute(query: str) -> str:
    return query.replace("DB,RES", f"'{DB}','{RES}'").replace(
        "'mycol','myres'", f"'{DB}','{RES}'"
    )


# --------------------------------------------------- revision building
def _field_access(key: str) -> str:
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        return key
    return '"' + key.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _json_key(key: str) -> str:
    return '"' + key.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _to_json_literal(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, (int, float)):
        return json.dumps(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{_json_key(k)}:{_to_json_literal(x)}" for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, list):
        return "[" + ",".join(_to_json_literal(x) for x in v) + "]"
    raise TypeError(type(v))


def _emit_updates(path: str, old, new, out: list[str]) -> None:
    if _json_equal(old, new):
        return
    if isinstance(old, dict) and isinstance(new, dict):
        for k in old:
            if k not in new:
                out.append(f"delete json {path}.{_field_access(k)}")
        for k, v in new.items():
            if k not in old:
                out.append(
                    f"insert json {{{_json_key(k)}: {_to_json_literal(v)}}} "
                    f"into {path}"
                )
            else:
                _emit_updates(f"{path}.{_field_access(k)}", old[k], v, out)
        return
    if isinstance(old, list) and isinstance(new, list) and len(old) == len(new):
        for i, (o, n) in enumerate(zip(old, new)):
            _emit_updates(f"{path}[{i}]", o, n, out)
        return
    out.append(f"replace json value of {path} with {_to_json_literal(new)}")


def build_revisions(spark, store, states: list[str]) -> None:
    """Replicates the Java buildRevisions: store the first state, then
    per state apply in-place updates (each auto-commits); identical
    consecutive states force an empty sdb:commit."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    store.store(DB, RES, states[0])
    prev = json.loads(states[0], parse_float=Decimal, parse_int=Decimal)
    for state in states[1:]:
        nxt = json.loads(state, parse_float=Decimal, parse_int=Decimal)
        updates: list[str] = []
        _emit_updates(f"jn:doc('{DB}','{RES}')", prev, nxt, updates)
        for u in updates:
            DocEvaluator(spark, store).execute(u)
        if not updates:
            DocEvaluator(spark, store).execute(
                f"sdb:commit(jn:doc('{DB}','{RES}'))"
            )
        prev = nxt


# ------------------------------------------------------------ comparing
def _split_top_level(s: str) -> list[str]:
    out: list[str] = []
    depth, in_str, esc = 0, False, False
    cur: list[str] = []
    for ch in s:
        if in_str:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            cur.append(ch)
        elif ch in "{[":
            depth += 1
            cur.append(ch)
        elif ch in "}]":
            depth -= 1
            cur.append(ch)
        elif ch == " " and depth == 0:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _try_parse(s: str):
    try:
        return json.loads(s, parse_float=Decimal, parse_int=Decimal)
    except (ValueError, TypeError):
        return _SENTINEL


_SENTINEL = object()


def _json_equal(x, y) -> bool:
    if isinstance(x, Decimal) and isinstance(y, Decimal):
        return x == y
    if isinstance(x, bool) or isinstance(y, bool):
        return x is y
    if isinstance(x, dict) and isinstance(y, dict):
        return x.keys() == y.keys() and all(
            _json_equal(v, y[k]) for k, v in x.items()
        )
    if isinstance(x, list) and isinstance(y, list):
        return len(x) == len(y) and all(
            _json_equal(a, b) for a, b in zip(x, y)
        )
    return type(x) is type(y) and x == y


def _string_content(s: str):
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        v = _try_parse(s)
        if isinstance(v, str):
            return v
    return None


def _items_equal(x: str, y: str) -> bool:
    xs, ys = x.strip(), y.strip()
    if xs == ys:
        return True
    xstr, ystr = _string_content(xs), _string_content(ys)
    if xstr is not None and xstr == ys:
        return True
    if ystr is not None and ystr == xs:
        return True
    if xstr is not None and ystr is not None:
        return xstr == ystr
    xv, yv = _try_parse(xs), _try_parse(ys)
    if xv is _SENTINEL or yv is _SENTINEL:
        return xs == ys
    return _json_equal(xv, yv)


def results_equal(expected: str, actual: str) -> bool:
    e = (expected or "").strip()
    a = (actual or "").strip()
    if e == a:
        return True
    es, as_ = _split_top_level(e), _split_top_level(a)
    if len(es) != len(as_):
        return False
    return all(_items_equal(x, y) for x, y in zip(es, as_))
