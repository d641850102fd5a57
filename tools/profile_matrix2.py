"""Round 2 of matrix profiling: raw-parquet scan variants aimed at
cutting per-query job count (AQE stage materialization = 1 extra job
per shuffle; the 71 ms job floor x 18 jobs dominates the suite).

Usage: python tools/profile_matrix2.py [n_rows] 2>/dev/null
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
N_TIMED = 3

VARIANTS = {
    "aqe": {},
    "noaqe_shuffle1": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "1",
    },
    "noaqe_shuffle4": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
    },
    "aqe_256m": {"spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024)},
    "noaqe_shuffle1_256m": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    },
}


def main():
    from sirix_spark import get_spark
    from sirix_spark.fixtures import generated_records, matrix_queries

    spark = get_spark("matrix-profile2", extra_conf={"spark.driver.memory": "64g"})
    rec_path = os.path.join(tempfile.mkdtemp(prefix="mprof2_"), "records")
    generated_records(spark, N).write.parquet(rec_path)
    qs = matrix_queries()

    def min_time(run):
        ts = []
        for _ in range(N_TIMED):
            t = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t)
        return min(ts)

    defaults = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.files.maxPartitionBytes": "134217728",
    }
    results = {}
    for vname, conf in VARIANTS.items():
        for k, v in {**defaults, **conf}.items():
            spark.conf.set(k, v)
        df = spark.read.parquet(rec_path)
        out = {}
        for name, fn in qs.items():
            run = lambda: fn(df).write.format("noop").mode("overwrite").save()  # noqa: E731
            run()
            out[name] = round(min_time(run), 4)
        results[vname] = out
        print(
            f"{vname:22s} total={sum(out.values()):.3f}s  "
            + " ".join(f"{k}={v:.3f}" for k, v in out.items()),
            flush=True,
        )
    print(json.dumps({"n": N, "variants": results}))


if __name__ == "__main__":
    main()
