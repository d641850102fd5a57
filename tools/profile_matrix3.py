"""Reproduce the full-bench groupBy2Keys pathology: run a headline
prefix with cached sf0.1 tables first (bench context), then the 100M
matrix — with and without clearing the cache in between.

Usage: python tools/profile_matrix3.py 2>/dev/null
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
N = 100_000_000


def main():
    from sirix_spark import get_spark
    from sirix_spark.fixtures import generated_records, matrix_queries
    from sirix_spark.queries import registry

    spark = get_spark("matrix-profile3", extra_conf={"spark.driver.memory": "64g"})
    reg = registry()
    sf_dir = "/root/testdata/sf0.1"

    # bench-context warm: run a representative headline slice with
    # cached tables (includes the heavy dedup family)
    for name in (
        "pricing_summary", "group_by_2keys", "asof_join_orders_events",
        "minhash_lsh_pairs", "jaccard_near_dup", "embedding_near_dup",
        "sessionize_events", "multimodal_features",
    ):
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print("# headline prefix done", flush=True)

    rec_path = os.path.join(tempfile.mkdtemp(prefix="mprof3_"), "records")
    generated_records(spark, N).write.parquet(rec_path)
    qs = matrix_queries()

    def run_matrix(tag):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        records = spark.read.parquet(rec_path)
        out = {}
        for name, fn in qs.items():
            run = lambda: fn(records).write.format("noop").mode("overwrite").save()  # noqa: E731
            run()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            out[name] = round(min(ts), 3)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        print(f"{tag:18s} total={sum(out.values()):.3f}s  "
              + " ".join(f"{k}={v}" for k, v in out.items()), flush=True)

    run_matrix("dirty")          # caches still pinned
    spark.catalog.clearCache()   # drop every cached table
    run_matrix("cleared")


if __name__ == "__main__":
    main()
