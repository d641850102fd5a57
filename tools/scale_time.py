"""Time a list of registry queries at a given sf_dir / core count —
the scale-proof harness (r10 verdict next-round #6). One session,
warmup + min-of-N per query, one JSON line out. Core count comes from
SPARK_GRAFT_CPUS exactly as in bench.py, so 8-vs-32-core ratios are
measured by running this twice.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scale_time.py /tmp/r11/sf1sim \
        jaccard_near_dup minhash_lsh_pairs [--n 3] [--passes 2]
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
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    spark = get_spark("sirix-spark-scale")
    reg = registry()
    best: dict[str, float] = {}

    def run(name):
        reg[name].fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in args.queries:  # global warmup (caches, JIT)
        run(name)
    for _p in range(args.passes):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"scale:{name}")
            run(name)  # per-pass warmup
            for _ in range(args.n):
                t0 = time.perf_counter()
                run(name)
                best[name] = min(
                    best.get(name, 9e9), time.perf_counter() - t0
                )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "queries": {k: round(v, 4) for k, v in best.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
