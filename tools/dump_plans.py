"""Dump .explain("formatted") for every registry query to a directory.

Usage:
    python tools/dump_plans.py plans/r10 --suffix _before [--only name,name2]

The optimization-round deliverable: plans/r10/<query>_before.txt /
..._after.txt so plan-shape claims in OPTIMIZATION_r10.md are
checkable without running Spark. Queries that need a per-call store
build (vector_search_routed, jsoniq_all_times_store, ...) still run
their setup; the dump is the FINAL DataFrame's formatted plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    spark = get_spark("sirix-spark-plandump")
    os.makedirs(args.outdir, exist_ok=True)
    names = args.only.split(",") if args.only else list(registry())
    reg = registry()
    for name in names:
        out = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        try:
            df = reg[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "ERROR\n" + traceback.format_exc()
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
