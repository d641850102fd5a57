"""Extract the reference's JSONiq integration-test corpus into JSON fixtures.

Parses the Java test sources under
``/root/reference/bundles/sirix-query/src/test/java/io/sirix/query/``
(JsonIntegrationTest.java + function tests), recovering for each
``@Test`` method the setup queries, the final query, and the expected
serialized output that `AbstractJsonTest.test(...)` asserts.  The
result is a list of cases::

    {"name": ..., "setup": [q1, q2, ...], "query": q, "expected": s,
     "ignore_node_keys": bool}

Run at test-collection time (tests/test_ref_corpus.py) so nothing
derived from the reference tree is committed; if the reference tree is
absent the corpus tests skip.

This module interprets only the handful of Java idioms the corpus
uses: text blocks (JLS 3.10.6 incidental-indentation stripping),
string literals, local `final String` assignments, `String.format`,
`Files.readString(...)` of expected-output resources, and
`JSON_RESOURCE_PATH.resolve(...).toUri()` document URIs.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF_QUERY_TEST_DIR = Path(
    "/root/reference/bundles/sirix-query/src/test/java/io/sirix/query"
)
REF_JSON_RESOURCES = Path(
    "/root/reference/bundles/sirix-query/src/test/resources/json"
)


class Unsupported(Exception):
    """Raised when a test body uses a Java idiom we don't interpret."""


# --------------------------------------------------------------- lexing


def _strip_text_block(raw: str) -> str:
    """Java text-block semantics: drop the line break after the opening
    delimiter, strip the common incidental indentation (determined by
    non-blank lines AND the closing-delimiter line), strip trailing
    whitespace per line."""
    lines = raw.split("\n")
    if lines and lines[0].strip() == "":
        lines = lines[1:]
    if not lines:
        return ""
    # closing delimiter position participates in the indent computation;
    # the caller passes content up to (not incl.) the closing ``\"\"\"``,
    # so the last element is the whitespace preceding it (or content).
    indents = []
    for i, ln in enumerate(lines):
        if ln.strip() == "" and i != len(lines) - 1:
            continue
        indents.append(len(ln) - len(ln.lstrip(" \t")))
    indent = min(indents) if indents else 0
    out = [ln[indent:].rstrip() for ln in lines]
    # if closing delimiter was on its own line, the final element is ""
    # and the joined string ends with "\n"
    return "\n".join(out)


_STR_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\", "s": " ",
}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _STR_ESCAPES:
                out.append(_STR_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _scan_string(src: str, i: int) -> tuple[str, int]:
    """Scan a Java string starting at src[i] (either text block or
    plain literal); return (value, index after closing quote)."""
    if src.startswith('"""', i):
        j = i + 3
        # text block: find closing """ not preceded by backslash
        while True:
            j = src.index('"""', j)
            if src[j - 1] != "\\":
                break
            j += 3
        raw = src[i + 3:j]
        return _strip_text_block(raw), j + 3
    assert src[i] == '"'
    j = i + 1
    while True:
        if src[j] == "\\":
            j += 2
            continue
        if src[j] == '"':
            break
        j += 1
    return _unescape(src[i + 1:j]), j + 1


def _split_args(argsrc: str) -> list[str]:
    """Split a Java argument list at top-level commas (strings and
    nested parens respected)."""
    parts, depth, i, start = [], 0, 0, 0
    while i < len(argsrc):
        c = argsrc[i]
        if c == '"':
            _, i = _scan_string(argsrc, i)
            continue
        if c in "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(argsrc[start:i].strip())
            start = i + 1
        i += 1
    tail = argsrc[start:].strip()
    if tail:
        parts.append(tail)
    return parts


def _find_call(src: str, name: str, from_idx: int = 0) -> tuple[str, int] | None:
    """Find `name(` at top level; return (args-source, end-index)."""
    pat = re.compile(r"\b" + re.escape(name) + r"\s*\(")
    m = pat.search(src, from_idx)
    if not m:
        return None
    i = m.end()
    depth = 1
    start = i
    while depth:
        c = src[i]
        if c == '"':
            _, i = _scan_string(src, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return src[start:i - 1], i


# ----------------------------------------------------- expression eval


class _Evaluator:
    def __init__(self, assigns: dict[str, str]):
        self.assigns = assigns  # var name -> expression source

    def value(self, expr: str) -> str:
        expr = expr.strip()
        # chained .strip()/.stripIndent()/.trim()
        m = re.match(r"^(.*)\.(strip|stripIndent|trim|stripTrailing)\(\)$", expr, re.S)
        if m:
            base = self.value(m.group(1))
            meth = m.group(2)
            if meth in ("strip", "trim"):
                return base.strip()
            if meth == "stripTrailing":
                return base.rstrip()
            return base  # stripIndent: text blocks already stripped
        if expr.startswith(('"""', '"')):
            val, end = _scan_string(expr, 0)
            rest = expr[end:].strip()
            rep = re.match(r"^\.repeat\(\s*(\d+)\s*\)", rest)
            if rep:
                val = val * int(rep.group(1))
                rest = rest[rep.end():].strip()
            if rest.startswith("+"):
                return val + self.value(rest[1:])
            if rest:
                raise Unsupported(f"trailing source after string: {rest[:40]!r}")
            return val
        if expr.startswith("String.format"):
            found = _find_call(expr, "String.format")
            if not found:
                raise Unsupported("bad String.format")
            args = _split_args(found[0])
            fmt = self.value(args[0])
            vals = [self.value(a) for a in args[1:]]
            for v in vals:
                # replace whichever of %s/%d comes first
                si, di = fmt.find("%s"), fmt.find("%d")
                if si == -1 and di == -1:
                    raise Unsupported("format args without %s/%d")
                spec = "%s" if di == -1 or (si != -1 and si < di) else "%d"
                fmt = fmt.replace(spec, v, 1)
            return fmt
        if expr.startswith("Files.readString"):
            found = _find_call(expr, "Files.readString")
            path = self._resolve_path(found[0].strip())
            return path.read_text()
        if "JSON_RESOURCE_PATH" in expr and ".toUri()" in expr:
            path = self._resolve_path(expr[: expr.rindex(".toUri()")])
            return path.as_uri()
        # FUSED_NAMED_PRIMITIVES ? a : b — the reference runs fused
        # node numbering; our shredder is the legacy (non-fused)
        # numbering, so take the FALSE branch. The reference's own
        # comments pin that both modes serialize identically — only
        # sdb:select-item nodeKey arguments shift.
        tern = re.match(r"^FUSED?_NAMED_PRIMITIVES\s*\?\s*", expr, re.S)
        if tern:
            # split on the ':' at depth 0 OUTSIDE string literals
            # (JSON-bearing branches contain ':' inside quotes)
            i = tern.end()
            depth = 0
            while i < len(expr):
                c = expr[i]
                if c == '"':
                    _, i = _scan_string(expr, i)
                    continue
                if c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                elif c == ":" and depth == 0:
                    return self.value(expr[i + 1 :])
                i += 1
            raise Unsupported("unterminated ternary")
        m = re.fullmatch(r"(\d+)L?", expr)
        if m:
            return m.group(1)
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            if expr not in self.assigns:
                raise Unsupported(f"unknown variable {expr}")
            return self.value(self.assigns[expr])
        raise Unsupported(f"unhandled expression {expr[:60]!r}")

    def _resolve_path(self, expr: str) -> Path:
        expr = expr.strip()
        if not expr.startswith("JSON_RESOURCE_PATH"):
            raise Unsupported(f"non-resource path {expr[:40]!r}")
        p = REF_JSON_RESOURCES
        for seg in re.findall(r"\.resolve\(\s*\"([^\"]+)\"\s*\)", expr):
            p = p / seg
        return p


# ------------------------------------------------------------- parsing


def _method_bodies(src: str):
    """Yield (name, body-source) for every @Test method (public or
    package-private, optional @DisplayName etc. between)."""
    pat = re.compile(
        r"@Test\s+(?:@\w+(?:\([^)]*\))?\s+)*(?:public\s+)?void (\w+)\(\)[^{]*\{"
    )
    matches = list(pat.finditer(src))
    for k, m in enumerate(matches):
        start = m.end()
        end = matches[k + 1].start() if k + 1 < len(matches) else len(src)
        yield m.group(1), src[start:end]


_ASSIGN = re.compile(
    r"(?:private\s+)?(?:static\s+)?(?:final\s+)?"
    r"(?:String|var|URI|long|int|boolean)\s+(\w+)\s*=\s*",
    re.S,
)


def _collect_assigns(body: str) -> dict[str, str]:
    out = {}
    for m in _ASSIGN.finditer(body):
        i = m.end()
        # scan to the terminating ; at depth 0
        depth = 0
        j = i
        while j < len(body):
            c = body[j]
            if c == '"':
                _, j = _scan_string(body, j)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == ";" and depth == 0:
                break
            j += 1
        out[m.group(1)] = body[i:j]
    return out


def extract_file(path: Path) -> tuple[list[dict], list[dict]]:
    """Return (cases, skipped) for one Java test source.

    Walks each @Test method POSITIONALLY: standalone ``query(...)``
    calls accumulate as setup; every ``test(query, expected)`` /
    ``testIgnoreNodeKeys(...)`` call emits one case whose setup is
    everything executed before it in source order (earlier test()
    queries re-run as setup — reads are idempotent). Methods with
    several assertions (e.g. ProjectionIndexFunctionTest's
    find→drop→find) therefore extract in execution order instead of
    collapsing to the first assertion."""
    src = path.read_text()
    cases, skipped = [], []
    class_assigns = _collect_assigns(src)  # class-level constants
    call_pat = re.compile(r"\b(testIgnoreNodeKeys|test|query)\s*\(")
    for name, body in _method_bodies(src):
        ev = _Evaluator({**class_assigns, **_collect_assigns(body)})
        setup: list[str] = []
        n_emitted = 0
        failed = None
        idx = 0
        while True:
            m = call_pat.search(body, idx)
            if not m:
                break
            fn = m.group(1)
            found = _find_call(body, fn, m.start())
            if not found:
                break
            args_src, idx = found
            try:
                args = [ev.value(a) for a in _split_args(args_src)]
            except Unsupported as e:
                if fn == "query":
                    continue  # un-evaluable setup: skip it
                failed = str(e)
                break
            if fn == "query":
                if args:
                    setup.append(args[0])
                continue
            if len(args) < 2:
                failed = f"{len(args)} args"
                break
            live = "\n".join(
                ln for ln in args[-2].splitlines()
                if not ln.lstrip().startswith("//")
            ).strip()
            if not live:
                continue  # fully commented-out assertion
            n_emitted += 1
            case_name = name if n_emitted == 1 else f"{name}#{n_emitted}"
            cases.append(
                {
                    "name": case_name,
                    "setup": setup + args[:-2],
                    "query": args[-2],
                    "expected": args[-1],
                    "ignore_node_keys": fn == "testIgnoreNodeKeys",
                }
            )
            # later assertions in the same method see this state
            setup = setup + args[:-2] + [args[-2]]
        if failed is not None:
            skipped.append({"name": name, "reason": failed})
        elif n_emitted == 0:
            skipped.append({"name": name, "reason": "no test(...) call"})
    return cases, skipped


def extract_corpus(paths: list[Path] | None = None) -> dict:
    if paths is None:
        paths = [
            REF_QUERY_TEST_DIR / "JsonIntegrationTest.java",
            REF_QUERY_TEST_DIR / "JsonMultipleUpdatesTest.java",
            REF_QUERY_TEST_DIR
            / "function/jn/index/PredicateOverUnwrappedArrayTest.java",
            REF_QUERY_TEST_DIR
            / "function/jn/index/ArrayIndexAccessOptimizerTest.java",
            REF_QUERY_TEST_DIR
            / "function/jn/index/IndexVersioningIntegrationTest.java",
            REF_QUERY_TEST_DIR / "ProjectionIndexFunctionTest.java",
            REF_QUERY_TEST_DIR / "ProjectionDoubleAggregateServingTest.java",
            REF_QUERY_TEST_DIR / "VectorizedSourceRefServingTest.java",
            # ProjectionIndexWtxServingTest deliberately excluded: its
            # assertions interleave raw JsonNodeTrx mutations between
            # the query() calls, which string extraction cannot see —
            # an extracted case would replay an incomplete setup
        ]
    all_cases, all_skipped = [], []
    for p in paths:
        cases, skipped = extract_file(p)
        for c in cases:
            c["source"] = p.name
        all_cases.extend(cases)
        all_skipped.extend(skipped)
    return {"cases": all_cases, "skipped": all_skipped}


if __name__ == "__main__":
    import sys

    corpus = extract_corpus(
        [Path(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else None
    )
    print(
        f"extracted {len(corpus['cases'])} cases, "
        f"{len(corpus['skipped'])} skipped",
        file=sys.stderr,
    )
    for s in corpus["skipped"]:
        print(f"  SKIP {s['name']}: {s['reason'][:80]}", file=sys.stderr)
    json.dump(corpus, sys.stdout, indent=1)
