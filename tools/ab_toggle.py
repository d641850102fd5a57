"""Interleaved same-session A/B for optimization toggles.

This box shows multi-minute throughput wobble (r9 verdict What's-wrong
#1, adjudicated ENV), so before/after numbers from separate runs are
unreliable. This harness alternates the OLD and NEW code paths inside
ONE SparkSession, pass-interleaved (A,B,A,B,...), 1 warmup + N timed
runs per query per pass, and reports best-of-passes per side — the
same adjudication shape as tools/ab_dedup.py but driven by an env
toggle read per call.

Usage:
    python tools/ab_toggle.py SIRIX_OPT_TS_DEDUP \
        previous_next_event valid_at [--passes 3] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("toggle")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--sides", default="0,1", help="toggle values to compare (first=reported as old)")
    args = ap.parse_args()

    os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    spark = get_spark("sirix-spark-ab")
    reg = registry()
    best: dict[tuple[str, str], float] = {}
    sides = args.sides.split(",")

    def run_query(name):
        df = reg[name].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()

    # global warmup: both sides once (fills caches, JIT)
    for side in sides:
        os.environ[args.toggle] = side
        for name in args.queries:
            run_query(name)

    for p in range(args.passes):
        for side in sides:
            os.environ[args.toggle] = side
            for name in args.queries:
                spark.sparkContext.setJobDescription(f"ab:{args.toggle}={side}:{name}")
                run_query(name)  # per-pass warmup
                ts = []
                for _ in range(args.n):
                    t0 = time.perf_counter()
                    run_query(name)
                    ts.append(time.perf_counter() - t0)
                key = (name, side)
                best[key] = min(best.get(key, 9e9), min(ts))
        print(f"pass {p}: " + "  ".join(
            f"{n}: A={best.get((n,sides[0]), 0):.3f}/B={best.get((n,sides[1]), 0):.3f}"
            for n in args.queries))
    print("\nfinal (best of passes, min of %d):" % args.n)
    for n in args.queries:
        a, b = best[(n, sides[0])], best[(n, sides[1])]
        print(f"{n:32s} old={a:7.3f}  new={b:7.3f}  ratio={b/a:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
