"""Paired-oracle fuzz of the XPath/XML axis surface (round-9 verdict
top ask: the r9 per-origin positional defect lived in this family and
was review-found, not fuzz-found; the reference pins these semantics
with bundles/sirix-core/src/test/java/io/sirix/axis/*Test.java and
its io/sirix/fuzz family).

The generator (tools/fuzz_xpath.py) builds random small XML trees and
random axis/predicate step chains TOGETHER with a naive tree-walking
oracle, so query text and expected output cannot drift apart. The
in-suite run is a seeded, budgeted subset; the full campaign
(`python tools/fuzz_xpath.py --n 5000`) is recorded in BENCH_NOTES.

Round-10 campaign finds, fixed in jsoniq/xpath.py and pinned by the
seeds below staying green:
- ANSI cast crash: [rel = <number>] over a non-numeric string-value
  crashed the query instead of comparing false (cast → try_cast);
- sibling axes leaked an attribute context's element children;
- self::node()/descendant-or-self::node() from an attribute context
  returned empty (node() test wrongly excluded attributes);
- or-predicate dedup collapsed rows across contexts (same family as
  the r9 per-origin positional defect);
- exponential plan growth in chained relpath predicates (~2x per
  predicate) — now linear via pre-predicate base frontiers.
"""

from __future__ import annotations

import os


def test_xpath_axis_fuzz(spark):
    # n=40 keeps the in-suite subset under the ~120 s budget
    # (measured ~37 s at 0.93 s/case with 6 worker threads); the
    # full campaign runs via tools/fuzz_xpath.py --n 5000.
    from tools.fuzz_xpath import run_fuzz

    n = int(os.environ.get("SIRIX_FUZZ_XPATH_N", "40"))
    failures = run_fuzz(spark, n=n, seed=20260816, threads=6)
    assert failures == [], failures[:3]


def test_xpath_fuzz_survives_plan_ceiling(spark):
    """The fail-fast plan-size guard: a case over the ceiling must
    fail CLEANLY (recorded as a failure dict) and keep the shared
    session usable — not kill the JVM (the round-8 jsoniq-fuzz
    lesson, applied to this harness)."""
    from tools.fuzz_xpath import run_fuzz

    failures = run_fuzz(spark, n=6, seed=20260816, max_plan_chars=100,
                        threads=2)
    assert failures, "every case should trip a 100-char ceiling"
    assert all("plan too large" in f["got"] for f in failures)
    # session survived: a normal subset still runs green
    assert run_fuzz(spark, n=4, seed=20260816, threads=2) == []
