"""Reference-corpus replay wired into CI.

The full replay (tools/run_ref_corpus.py — 327 cases extracted from
the reference's own test sources plus hand-authored JUnit
replications) takes several minutes; CI runs a stratified sample —
a fixed slice per source family — so a regression in any engine area
(doc-model navigation, updates, identity/temporal, group-by/
aggregates, numeric fidelity, projection DDL, XML temporal) fails
fast. Set SIRIX_SPARK_FULL_CORPUS=1 to replay everything.

Skips when the reference tree is absent (nothing derived from it is
committed)."""

from __future__ import annotations

import os

import pytest

from tools.extract_ref_corpus import REF_QUERY_TEST_DIR

pytestmark = pytest.mark.skipif(
    not REF_QUERY_TEST_DIR.exists(), reason="reference tree not present"
)

# one representative per engine area, chosen for breadth per minute
SAMPLE = [
    "testArray",                                # doc-model basics
    "testReplaceInArray",                       # updates
    "testCreateAndScanCASIndex",                # index DDL + scan
    "FirstExisting#revisionsAndNodeExists",     # node identity
    "ItemHistory#test",                         # value history
    "SimpleQuery#pastOrSelf",                   # temporal axis order
    "ShellDemo#itemHistory",                    # docs scenario
    "UseCasesDoc#fraudDetection",               # dateTime arithmetic
    "BitemporalQuery#validAtQueryFunction",     # valid time
    "Sweep#group-by-sum-order-by-aggregate-descending",  # group by
    "Sweep#decimal-addition-is-exact-unlike-binary-float",  # numerics
    "Sweep#jn-past-without-include-self-newest-first",  # revision chains
    "NumericComparison#maxInt64AndDouble",      # numeric tower
    "createProjectionIndexAndGroupBy",          # projection DDL
    "findAndDropProjectionIndex#2",             # catalogue drop
    "XmlOpenRevisions#fiveRevisionsInRange",    # versioned XML
]


def _all_cases():
    from tools.extract_ref_corpus import extract_corpus
    from tools.ref_corpus_manual import CASES as MANUAL
    from tools.ref_corpus_sweep import extract_sweep_cases

    return extract_corpus()["cases"] + MANUAL + extract_sweep_cases()


def test_corpus_extraction_is_complete():
    cases = _all_cases()
    assert len(cases) >= 327, f"corpus shrank: {len(cases)}"
    names = {c["name"] for c in cases}
    missing = [s for s in SAMPLE if s not in names]
    assert not missing, f"sample cases vanished: {missing}"


def test_corpus_sample_replays(spark):
    from tools.run_ref_corpus import run_case

    cases = {c["name"]: c for c in _all_cases()}
    if os.environ.get("SIRIX_SPARK_FULL_CORPUS") == "1":
        todo = list(cases.values())
    else:
        todo = [cases[s] for s in SAMPLE]
    failures = []
    for case in todo:
        status, detail = run_case(spark, case)
        if status not in ("pass", "delta"):
            failures.append(f"{case['name']}: {status} {detail[:120]}")
    assert not failures, "\n".join(failures)
