"""Matrix tuning A/B at 100M: task granularity + aggregate codegen
flags on the string-keyed group-bys (the residual gap per
BENCH_NOTES.md "Where the residual gap lives").

Variants (all with AQE off, shuffle.partitions=1, v2 source — the
bench matrix config):
  base        — as bench.py runs today
  small-tasks — maxPartitionBytes=32m (4x more, smaller scan tasks)
  vec-hashmap — codegen.aggregate.map.vectorized.enable=true
  both        — the two combined

Usage: python tools/profile_matrix4.py 2>/dev/null
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("MPROF_N", 100_000_000))


def main():
    from sirix_spark import get_spark
    from sirix_spark.fixtures import generated_records, matrix_queries

    spark = get_spark(
        "matrix-profile4", extra_conf={"spark.driver.memory": "64g"}
    )
    rec_path = os.path.join(tempfile.mkdtemp(prefix="mprof4_"), "records")
    generated_records(spark, N).write.parquet(rec_path)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")

    qs = matrix_queries()
    small = {"spark.sql.files.maxPartitionBytes": "33554432"}
    variants = {
        "warmup": {},
        "base-1": {},
        "small-1": small,
        "base-2": {},
        "small-2": small,
    }
    defaults = {
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
        "spark.sql.codegen.aggregate.map.vectorized.enable": spark.conf.get(
            "spark.sql.codegen.aggregate.map.vectorized.enable", "false"
        ),
    }
    for tag, conf in variants.items():
        for k, v in {**defaults, **conf}.items():
            spark.conf.set(k, v)
        records = spark.read.parquet(rec_path)
        out = {}
        for name, fn in qs.items():
            run = lambda: fn(records).write.format("noop").mode("overwrite").save()  # noqa: E731
            run()
            out[name] = round(
                min(
                    (lambda t0: (run(), time.perf_counter() - t0)[1])(
                        time.perf_counter()
                    )
                    for _ in range(3)
                ),
                3,
            )
        print(
            f"{tag:12s} total={sum(out.values()):.3f}s  "
            + "  ".join(f"{k}={v}" for k, v in out.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
