"""Profile the 9-query records matrix at 100M under config variants.

Round-2 verdict #3: judge measured 4.56 s total vs the reference's
0.618 s (7.4x; gate is 2x). This harness isolates where the time goes:
cache codec, cache batch size, AQE planning round-trips, shuffle
partition count, raw-parquet vs cached scan — plus a job-floor probe
(count over a 32-row cached frame) to bound the irreducible
scheduling share per query.

Usage: python tools/profile_matrix.py [n_rows] 2>/dev/null
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
    "baseline": {},
    "nocompress": {"spark.sql.inMemoryColumnarStorage.compression": "false"},
    "bigbatch": {"spark.sql.inMemoryColumnarStorage.batchSize": "131072"},
    "nocompress_bigbatch": {
        "spark.sql.inMemoryColumnarStorage.compression": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "131072",
    },
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "noaqe_nocompress_bigbatch": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.inMemoryColumnarStorage.compression": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "131072",
    },
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
}


def main():
    from sirix_spark import get_spark
    from sirix_spark.fixtures import generated_records, matrix_queries

    spark = get_spark(
        "matrix-profile", extra_conf={"spark.driver.memory": "64g"}
    )
    rec_path = os.path.join(tempfile.mkdtemp(prefix="mprof_"), "records")
    t0 = time.perf_counter()
    generated_records(spark, N).write.parquet(rec_path)
    print(f"# ingest {time.perf_counter()-t0:.1f}s", flush=True)

    qs = matrix_queries()

    def bench(df):
        out = {}
        for name, fn in qs.items():
            run = lambda: fn(df).write.format("noop").mode("overwrite").save()  # noqa: E731
            run()  # warmup: codegen compile + cache touch
            out[name] = round(min_time(run), 4)
        return out

    def min_time(run):
        ts = []
        for _ in range(N_TIMED):
            t = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t)
        return min(ts)

    # job-floor probe: a do-nothing 32-partition job, min of 5
    tiny = spark.range(32, numPartitions=32).persist()
    tiny.count()
    floor = min(min_time(lambda: tiny.write.format("noop").mode("overwrite").save()) for _ in range(2))
    print(f"# job floor (32-task noop): {floor*1000:.0f} ms", flush=True)

    defaults = {
        "spark.sql.inMemoryColumnarStorage.compression": "true",
        "spark.sql.inMemoryColumnarStorage.batchSize": "10000",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "32",
    }
    results = {}
    for vname, conf in VARIANTS.items():
        for k, v in {**defaults, **conf}.items():
            spark.conf.set(k, v)
        df = spark.read.parquet(rec_path).persist()
        df.count()
        r = bench(df)
        df.unpersist()
        results[vname] = r
        total = sum(r.values())
        print(f"{vname:28s} total={total:.3f}s  " + " ".join(f"{k}={v:.3f}" for k, v in r.items()), flush=True)

    # raw parquet scan (page-cache warm), defaults
    for k, v in defaults.items():
        spark.conf.set(k, v)
    raw = spark.read.parquet(rec_path)
    r = bench(raw)
    results["raw_parquet"] = r
    print(f"{'raw_parquet':28s} total={sum(r.values()):.3f}s  " + " ".join(f"{k}={v:.3f}" for k, v in r.items()), flush=True)

    print(json.dumps({"n": N, "floor_ms": round(floor * 1000), "variants": results}))


if __name__ == "__main__":
    main()
