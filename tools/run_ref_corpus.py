"""Run the reference's JSONiq integration-test corpus against the
document-mode engine and print a pass/fail/unsupported scoreboard.

Usage::

    python tools/run_ref_corpus.py [--only NAME_SUBSTR] [--verbose]

Each case gets a fresh DocumentStore (temp dir); setup queries run
first (store/load/index DDL/updates), then the final query's
serialized output is compared with the reference's expected string
(nodeKey integers stripped for testIgnoreNodeKeys cases, matching
AbstractJsonTest.stripNodeKeys).
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import tempfile
import traceback

sys.path.insert(0, ".")

from tools.extract_ref_corpus import extract_corpus  # noqa: E402

_NK = re.compile(r"(\"(?:nodeKey|nodekey)\"\s*:\s*)(-?\d+)")


def strip_nk(s: str) -> str:
    return _NK.sub(r"\1<nk>", s)


def run_case(spark, case) -> tuple[str, str]:
    """Returns (status, detail): status in pass|fail|unsupported|error."""
    from sirix_spark.jsoniq.compiler import JsoniqCompileError
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.jsoniq.parser import JsoniqSyntaxError
    from sirix_spark.store.docstore import DocumentStore

    tmp = tempfile.mkdtemp(prefix="refcorpus_")
    try:
        store = DocumentStore(spark, tmp)
        try:
            for q in case["setup"]:
                DocEvaluator(spark, store).execute(q)
            got = DocEvaluator(spark, store).execute(case["query"])
        except (JsoniqCompileError, JsoniqSyntaxError) as e:
            return "unsupported", f"{type(e).__name__}: {e}"
        except Exception as e:
            tb = traceback.format_exc()
            frames = [
                ln for ln in tb.splitlines() if "sirix_spark/" in ln
            ][-3:]
            return "error", f"{type(e).__name__}: {e}\n" + "\n".join(frames)
        want = case["expected"].strip()
        got = got.strip()
        if case["ignore_node_keys"]:
            want, got = strip_nk(want), strip_nk(got)
        if got == want:
            return "pass", ""
        return "fail", f"want={want[:160]!r}\n         got={got[:160]!r}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()

    from sirix_spark.session import get_spark

    spark = get_spark()
    corpus = extract_corpus()
    cases = corpus["cases"]
    if args.only:
        cases = [c for c in cases if args.only.lower() in c["name"].lower()]

    counts = {"pass": 0, "fail": 0, "unsupported": 0, "error": 0}
    results = []
    for case in cases:
        try:
            status, detail = run_case(spark, case)
        except Exception as e:
            status, detail = "error", traceback.format_exc()[-400:]
        counts[status] += 1
        results.append({"name": case["name"], "status": status, "detail": detail})
        mark = {"pass": ".", "fail": "F", "unsupported": "u", "error": "E"}[status]
        if args.verbose or status != "pass":
            print(f"{mark} {case['name']}: {detail.splitlines()[0] if detail else 'ok'}")
            if status == "fail" and len(detail.splitlines()) > 1:
                print("  " + detail.splitlines()[1].strip())
        else:
            print(mark, end="", flush=True)
    print()
    total = len(cases)
    print(
        f"corpus: {counts['pass']}/{total} pass, {counts['fail']} fail, "
        f"{counts['unsupported']} unsupported, {counts['error']} error"
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"counts": counts, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
