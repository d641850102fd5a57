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
_HASH_RE = re.compile(r"\"hash\"\s*:\s*\"[0-9a-fA-F]+\"")


def strip_nk(s: str) -> str:
    return _NK.sub(r"\1<nk>", s)


# Documented semantic deltas: cases where the reference's expected
# output encodes a reference-internal artifact we deliberately do NOT
# reproduce. Each entry pins OUR output exactly (so regressions still
# fail) and records why it differs.
KNOWN_DELTAS = {
    "testCreateAndScanNameIndex": {
        # Our nodeKeys (9,25,40,56,71,87,96) match the reference's
        # exactly; our paths are each node's true instance path. The
        # reference prints, for the three ARRAY-valued `foo` key
        # nodes (keys 9/40/71), the path of a DIFFERENT (neighboring)
        # index entry — a fused-node cursor-positioning artifact of
        # GetPath.java's moveToParent walk (its own comments describe
        # the fused OBJECT_NAMED_* complications). We emit
        # /sirix/[i]/revision/foo for those nodes instead.
        "why": "reference GetPath fused-mode walk misattributes paths "
        "of array-valued key nodes to neighboring index entries",
        "expected": (
            '{"nodeKey":9,"path":"/sirix/[0]/revision/foo","revision":2} '
            '{"nodeKey":25,"path":"/sirix/[0]/revision/tada/[0]/foo","revision":2} '
            '{"nodeKey":40,"path":"/sirix/[1]/revision/foo","revision":2} '
            '{"nodeKey":56,"path":"/sirix/[1]/revision/tada/[0]/foo","revision":2} '
            '{"nodeKey":71,"path":"/sirix/[2]/revision/foo","revision":2} '
            '{"nodeKey":87,"path":"/sirix/[2]/revision/tada/[0]/foo","revision":2} '
            '{"nodeKey":96,"path":"/sirix/[2]/revision/tada/[4]/[0]/foo","revision":2}'
        ),
    },
}


def run_case(spark, case) -> tuple[str, str]:
    """Returns (status, detail): status in pass|fail|unsupported|error."""
    from sirix_spark.jsoniq.compiler import JsoniqCompileError
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.jsoniq.parser import JsoniqSyntaxError
    from sirix_spark.store.docstore import DocStoreError, DocumentStore

    tmp = tempfile.mkdtemp(prefix="refcorpus_")
    try:
        store = DocumentStore(spark, tmp)
        mode = case.get("assert")
        try:
            if case.get("setup_py"):
                from tools.ref_corpus_manual import SETUPS

                SETUPS[case["setup_py"]](spark, store)
            if case.get("sweep_data") is not None:
                from tools.ref_corpus_sweep import DB, RES

                store.store(DB, RES, case["sweep_data"])
            if case.get("sweep_revisions"):
                from tools.ref_corpus_sweep import build_revisions

                build_revisions(spark, store, case["sweep_revisions"])
            for q in case["setup"]:
                DocEvaluator(spark, store).execute(q)
            got = DocEvaluator(spark, store).execute(case["query"])
        except (JsoniqCompileError, JsoniqSyntaxError) as e:
            if mode == "error":
                return "pass", ""
            return "unsupported", f"{type(e).__name__}: {e}"
        except DocStoreError as e:
            if mode == "error":
                return "pass", ""
            tb = traceback.format_exc()
            return "error", f"DocStoreError: {e}\n" + tb.splitlines()[-2]
        except Exception as e:
            if mode == "error":
                return "pass", ""
            tb = traceback.format_exc()
            frames = [
                ln for ln in tb.splitlines() if "sirix_spark/" in ln
            ][-3:]
            return "error", f"{type(e).__name__}: {e}\n" + "\n".join(frames)
        # soft assertion modes (the reference test asserted a property,
        # not an exact string)
        if mode == "error":
            return "fail", f"expected an error, got {got[:120]!r}"
        if mode == "nonempty":
            return ("pass", "") if got.strip() else ("fail", "empty output")
        if mode == "valid_json":
            # the reference's metadataSerialization sweep asserts only
            # that every mode x level combination emits VALID JSON
            try:
                json.loads(got)
                return "pass", ""
            except ValueError as e:
                return "fail", f"invalid JSON: {e}: {got[:120]!r}"
        if mode == "int_gt0":
            try:
                return ("pass", "") if int(got.strip()) > 0 else (
                    "fail", f"expected >0, got {got!r}"
                )
            except ValueError:
                return "fail", f"not an int: {got[:80]!r}"
        if isinstance(mode, list):
            missing = [m for m in mode if m not in got]
            return ("pass", "") if not missing else (
                "fail", f"missing {missing} in {got[:120]!r}"
            )
        if isinstance(mode, dict):
            missing = [m for m in mode.get("contains", []) if m not in got]
            present = [m for m in mode.get("not_contains", []) if m in got]
            if missing or present:
                return "fail", (
                    f"missing {missing}, unexpected {present} in {got[:120]!r}"
                )
            return "pass", ""
        want = case["expected"].strip()
        got = got.strip()
        if case.get("normalize_hashes"):
            # the reference's serializer tests normalize hashes the
            # same way before comparing (JsonSerializerTest.java:283,
            # replaceAll("[0-9a-fA-F]{16}", "0000...")); rolling-hash
            # values are storage internals we deliberately don't match
            want = _HASH_RE.sub('"hash":"<h>"', want)
            got = _HASH_RE.sub('"hash":"<h>"', got)
        if case.get("compare") == "json-equal":
            # JSONAssert.assertEquals(..., strict=true) semantics:
            # arrays ordered, objects unordered, whitespace ignored
            try:
                if json.loads(want) == json.loads(got):
                    return "pass", ""
            except ValueError:
                pass
            return "fail", f"want={want[:160]!r}\n         got={got[:160]!r}"
        if case.get("compare") == "sweep-json":
            from tools.ref_corpus_sweep import results_equal

            return ("pass", "") if results_equal(want, got) else (
                "fail", f"want={want[:160]!r}\n         got={got[:160]!r}"
            )
        if case["ignore_node_keys"]:
            want, got = strip_nk(want), strip_nk(got)
        if got == want:
            return "pass", ""
        from tools.ref_corpus_manual import MANUAL_DELTAS

        delta = KNOWN_DELTAS.get(case["name"]) or MANUAL_DELTAS.get(case["name"])
        if delta is not None:
            pinned = delta["expected"].strip()
            if case["ignore_node_keys"]:
                pinned = strip_nk(pinned)
            if got == pinned:
                return "delta", delta["why"]
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
    from tools.ref_corpus_manual import CASES as MANUAL_CASES
    from tools.ref_corpus_r7 import CASES as R7_CASES
    from tools.ref_corpus_serializer import CASES as SER_CASES
    from tools.ref_corpus_sweep import extract_sweep_cases

    corpus = extract_corpus()
    cases = (
        corpus["cases"] + MANUAL_CASES + SER_CASES + extract_sweep_cases()
        + R7_CASES
    )
    if args.only:
        cases = [c for c in cases if args.only.lower() in c["name"].lower()]

    counts = {"pass": 0, "fail": 0, "unsupported": 0, "error": 0, "delta": 0}
    results = []
    for case in cases:
        # XMark replays shred a 1 MB document into tens of thousands
        # of plan nodes per query; accumulated JVM state (plan caches,
        # broadcast refs) kills the single-session runner after a few.
        # A fresh session per heavy case keeps the replay bounded
        # (each case already gets its own store, so isolation is
        # unchanged).
        if case.get("setup_py") == "xmark":
            spark.stop()
            spark = get_spark()
        try:
            status, detail = run_case(spark, case)
        except Exception as e:
            status, detail = "error", traceback.format_exc()[-400:]
        counts[status] += 1
        results.append({"name": case["name"], "status": status, "detail": detail})
        mark = {"pass": ".", "fail": "F", "unsupported": "u", "error": "E", "delta": "d"}[status]
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
        f"{counts['unsupported']} unsupported, {counts['error']} error, "
        f"{counts['delta']} documented-delta"
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"counts": counts, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
