"""Deterministic 10x (sf1-shaped) scale replica of the sf0.1 corpus,
for SCALE-PROOF MEASUREMENT ONLY (r10 verdict next-round #6: the r10
exchange-merge and pair-emission wins were proven at sf0.1 where every
query is sub-second and floor-bound; this gives them second-scale
evidence). Never used by bench.py or the oracle — the driver's data
stays /root/testdata.

Construction keeps the per-replica workload shape EXACTLY sf0.1's:

- documents: every word of replica k is suffixed `q{k}` — an
  injective token rename, so within a replica every shingle set, set
  size and pairwise intersection is identical to sf0.1's, while
  replicas share no shingles at all (their md5 bucket keys are
  disjoint in probability; the posting/bucket size DISTRIBUTION is
  preserved, the bucket COUNT scales 10x). doc_id offset 10M/replica.
- events: user_id offset 1M, event_id offset 1B per replica; ts and
  values unchanged (windows are per-user, so each replica is an
  independent copy of the sf0.1 stream).

Usage: python tools/gen_scaled_corpus.py /tmp/r11/sf1sim [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_DEFAULT = 10
SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r11/sf1sim"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else K_DEFAULT
    from pyspark.sql import functions as F

    from sirix_spark import get_spark

    spark = get_spark("gen-scaled-corpus")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(k).select(F.col("id").alias("_k"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_k") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("q"), F.col("_k").cast("string")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_k") * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_k") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    print(f"wrote {out} (k={k})")
    spark.stop()


if __name__ == "__main__":
    main()
