"""Scale-adjudicate the expensive dedup/similarity shapes (round-5/6
verdict ask): run each at sf0.01 and sf0.1 (10× the documents/
embeddings rows) and report the growth exponent
log10(t_sf0.1 / t_sf0.01) — sub-quadratic scaling shows as ≤ 1.3
(1.0 = perfectly linear; small-scale fixed overheads usually push it
below 1).

Usage: python tools/profile_dedup_scaling.py [n_repeats]
Prints one JSON line; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "exact_dedup",
    "minhash_lsh_pairs",
    "jaccard_near_dup",
    "embedding_near_dup",
    "fuzzy_verify_pairs",
)
SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> int:
    import math

    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("dedup-scaling")
    reg = registry()
    out: dict = {"n_repeats": n, "rows": {}}
    for sf in SFS:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
        emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).count()
        out["rows"][sf.rsplit("/", 1)[-1]] = {"documents": docs, "embeddings": emb}
    results: dict = {}
    for name in QUERIES:
        q = reg[name]
        times = {}
        for sf in SFS:
            best = None
            for _ in range(n):
                t0 = time.perf_counter()
                q.fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[sf.rsplit("/", 1)[-1]] = round(best, 3)
        t1, t10 = times["sf0.01"], times["sf0.1"]
        exp = math.log10(t10 / t1) if t1 > 0 else None
        results[name] = {**times, "exponent": round(exp, 3)}
        print(f"{name}: {times} exponent={exp:.3f}", file=sys.stderr)
    out["queries"] = results
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
