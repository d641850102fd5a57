"""A/B the dedup-family bench drift (round-9 verdict What's-wrong #1).

r8→r9 the dedup family drifted 15-40% at floor parity with NO dedup
code change; the judge reproduced the drift, so it is either real
(follows the checkout) or box/env state (follows the box). This
script settles it: interleaved passes (A,B,A,B,A,B) of the six
drifted queries over the SAME testdata on an idle box, side A = a
prior-round checkout (git worktree), side B = HEAD. Interleaving
makes slow-box epochs hit both sides equally.

Usage::

    git worktree add /tmp/ab_r8 bb95600   # round-8 end snapshot
    python tools/ab_dedup.py /tmp/ab_r8 .  [--passes 3]

Prints a per-query table (best-of-passes per side, B/A ratio) and a
one-line verdict: CHECKOUT (B consistently slower → bisect the diff)
or ENV (sides within noise → the drift is box state).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

QUERIES = [
    "minhash_signatures", "minhash_lsh_pairs", "jaccard_near_dup",
    "simhash", "fuzzy_verify_pairs", "embedding_near_dup",
]

PASS_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
from sirix_spark import get_spark
from sirix_spark.queries import registry

spark = get_spark("ab-dedup")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reg = registry()
out = {}
for name in json.loads(os.environ["AB_QUERIES"]):
    fn = reg[name].fn
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    out[name] = min(ts)
print("ABRESULT " + json.dumps(out))
"""


def run_pass(side_dir: str) -> dict:
    env = {**os.environ, "AB_QUERIES": json.dumps(QUERIES)}
    p = subprocess.run(
        [sys.executable, "-c", PASS_SCRIPT], cwd=side_dir, env=env,
        capture_output=True, text=True, timeout=900,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            return json.loads(ln[len("ABRESULT "):])
    raise RuntimeError(
        f"pass in {side_dir} produced no result; stderr tail: "
        f"{p.stderr[-1500:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("side_a", help="prior-round checkout dir (worktree)")
    ap.add_argument("side_b", help="current checkout dir (usually .)")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for i in range(args.passes):
        print(f"pass {i + 1}/{args.passes} side A …", flush=True)
        a_runs.append(run_pass(args.side_a))
        print(f"pass {i + 1}/{args.passes} side B …", flush=True)
        b_runs.append(run_pass(args.side_b))

    print(f"\n{'query':28} {'A best':>8} {'B best':>8} {'B/A':>6}")
    ratios = []
    for q in QUERIES:
        a = min(r[q] for r in a_runs)
        b = min(r[q] for r in b_runs)
        ratios.append(b / a)
        print(f"{q:28} {a:8.3f} {b:8.3f} {b / a:6.2f}")
    geo = statistics.geometric_mean(ratios)
    print(f"\nfamily geomean B/A: {geo:.3f}")
    verdict = "CHECKOUT (bisect the diff)" if geo > 1.15 else (
        "ENV (box state — record and move on)" if 0.87 <= geo else
        "CHECKOUT-FASTER (B faster; prior-round artifact was inflated)"
    )
    print("verdict:", verdict)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
