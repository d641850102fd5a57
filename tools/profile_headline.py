"""Per-query breakdown for headline-suite optimization (guide §1):
for each query, split wall time into (a) DataFrame construction +
analysis/optimization (driver-side) and (b) execution to the noop
sink, after one uncounted warmup — the same warm+min-of-N protocol
bench.py uses, so numbers line up with the artifact.

Usage:
    python tools/profile_headline.py [--only a,b,c] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    import bench

    spark = get_spark("sirix-spark-profile")
    reg = registry()
    names = args.only.split(",") if args.only else [n for n in bench.HEADLINE if n in reg]
    out = {}
    for name in names:
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warmup (also fills table caches / memoized intermediates)
        df = fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        build_ts, exec_ts, total_ts = [], [], []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            # force analysis + optimization + physical planning
            df._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
            total_ts.append(t2 - t0)
        out[name] = {
            "build_min": round(min(build_ts), 4),
            "exec_min": round(min(exec_ts), 4),
            "total_min": round(min(total_ts), 4),
        }
        print(f"{name:32s} build={min(build_ts):7.3f}  exec={min(exec_ts):7.3f}  total={min(total_ts):7.3f}")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
