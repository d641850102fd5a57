"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol mirrors the reference bench (docs/COMPARISON_DUCKDB.md:15-16):
1 warmup + 3 timed runs per query, report the min. Prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Fault isolation (round-2 verdict #2): a failing query records an
entry in "errors" and the run continues; the final JSON line is
ALWAYS emitted, even on unexpected top-level failure. A soft deadline
($SIRIX_SPARK_BENCH_DEADLINE, default 540 s) stops starting new
queries so a driver-side timeout can't kill the process before the
JSON is printed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the 9-shape analytics matrix, the flagship group-agg,
# joins (broadcast/shuffle/as-of), temporal ops, and the
# pipeline operators (dedup/similarity/text).
HEADLINE = [
    "filter_count",
    "group_by_count",
    "sum_qty",
    "avg_qty",
    "min_max_qty",
    "group_by_2keys",
    "filter_group_by",
    "count_distinct",
    "compound_filter_count",
    "computed_agg",
    "pricing_summary",
    "top_k_orders",
    "shipping_priority",
    "running_sum_per_user",
    "customers_per_region",
    "revenue_by_priority",
    "national_revenue",
    "asof_join_orders_events",
    "previous_next_event",
    "snapshot_diff",
    "valid_at",
    "json_deref_sum",
    # JSONiq string entry vs its hand-written twin (identical
    # semantics): the compiler adds zero runtime operators, so these
    # two should be within noise of each other.
    "events_filter_project",
    "jsoniq_filter_project",
    "json_field_filter",
    "token_count",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "jaccard_near_dup",
    "fuzzy_verify_pairs",
    "simhash",
    "embedding_near_dup",
    "multimodal_features",
    "ngram_freq",
    "stratified_sample",
    "cosine_topk",
    "knn_join",
    "sessionize_events",
    "left_outer_join",
    "range_join_price_bands",
]

N_TIMED = int(os.environ.get("SIRIX_SPARK_BENCH_N_TIMED", 3))
DEADLINE_S = float(os.environ.get("SIRIX_SPARK_BENCH_DEADLINE", 540))
_START = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _START


def _min_time(run, n: int) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_once(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # Force full execution without driver-side materialization cost:
    # noop sink keeps every operator in the executed plan.
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    # Pin tables in memory, repartitioned — the analog of the
    # reference's prebuilt projection index (its bench runs with
    # projections built; see BASELINE.md config column).
    os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    n_records = int(os.environ.get("SIRIX_SPARK_RECORDS_N", 100_000_000))

    out = {
        "metric": "headline_suite_total_min_of_3",
        "value": None,
        "unit": "sec",
        "queries": {},
        "sf": sf,
        "records_n": n_records,
    }
    timings: dict[str, float] = out["queries"]
    errors: dict[str, str] = {}

    try:
        _run(sf_dir, n_records, timings, errors, out)
    except Exception:
        errors["__fatal__"] = traceback.format_exc(limit=3)
    finally:
        if errors:
            out["errors"] = errors
        out["value"] = round(sum(timings.values()), 4)
        print(json.dumps(out))
        sys.stdout.flush()
    sys.exit(0)


def _run(sf_dir, n_records, timings, errors, out):
    from sirix_spark import get_spark
    from sirix_spark.queries import registry

    # The records matrix runs at the reference's published scale
    # (100M rows) by default — the 10M runs of round 1 sat on Spark's
    # ~120 ms per-job floor and measured scheduling overhead, not
    # throughput. 100M cached columnar is a few GB; give the single
    # local JVM a real heap (the box has 128 GiB).
    spark = get_spark(
        "sirix-spark-bench",
        extra_conf={"spark.driver.memory": os.environ.get("SIRIX_SPARK_DRIVER_MEM", "64g")},
    )
    reg = registry()

    headline = list(HEADLINE)
    if os.environ.get("SIRIX_SPARK_BENCH_INJECT_FAIL"):
        # test hook: prove one failing query can't kill the run
        headline.insert(0, os.environ["SIRIX_SPARK_BENCH_INJECT_FAIL"])
    for name in headline:
        if _elapsed() > DEADLINE_S:
            errors.setdefault("__deadline__", f"stopped before {name} at {_elapsed():.0f}s")
            break
        try:
            fn = reg[name].fn
            run_once(fn, spark, sf_dir)  # warmup
            timings[name] = round(
                min(run_once(fn, spark, sf_dir) for _ in range(N_TIMED)), 4
            )
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {str(e)[:300]}"

    # --- secondary: the reference's own 9-query matrix over the
    # reference-shaped records table (BASELINE.md primary metric),
    # at its published 100M-row scale by default ---
    import tempfile

    from sirix_spark.fixtures import generated_records, matrix_queries

    label = f"records{n_records // 1_000_000}m"
    try:
        rec_path = os.path.join(tempfile.mkdtemp(prefix="sirix_bench_"), "records")
        # ingest metric: generate + write the snapshot (the analog of the
        # reference's shred; BASELINE.md reports 182k records/s for it)
        t0 = time.perf_counter()
        generated_records(spark, n_records).write.parquet(rec_path)
        ingest_sec = round(time.perf_counter() - t0, 4)
        timings[f"{label}_ingest_write"] = ingest_sec
        out["records_ingest_per_sec"] = round(n_records / ingest_sec)
        # Raw parquet scan, NOT .persist(): tools/profile_matrix.py at
        # 100M shows the vectorized parquet reader over the OS page
        # cache beats InMemoryTableScan on every matrix query (2.3-2.5s
        # vs 3.1-3.4s; the compressed cache is pathological on string
        # group-bys). The reference bench likewise scans its own
        # columnar projection files.
        records = spark.read.parquet(rec_path)
    except Exception as e:
        errors[f"{label}_ingest"] = f"{type(e).__name__}: {str(e)[:300]}"
        return
    # The headline suite pinned the sf tables in executor memory; that
    # storage pressure measurably degrades the matrix scans (profiled:
    # 4.2s dirty vs 2.5s cleared at 100M — unified-memory contention).
    # The matrix needs none of those caches: drop them all.
    from sirix_spark import tables as _tables

    _tables._CACHE.clear()
    spark.catalog.clearCache()
    # Matrix-scoped conf (restored after): every group-by here yields
    # <=64 groups, so the final agg is one tiny task — AQE's per-shuffle
    # stage materialization would add one extra ~70ms job per query
    # (out["records_job_floor_ms"] probes that floor), and 32 shuffle
    # partitions would add 31 no-op tasks. This is a bench-local
    # setting for the known-tiny-cardinality matrix ONLY — the engine
    # default (session.py) keeps AQE on, which is right at scale.
    matrix_conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "1",
        # v2 parquet source: aggregatePushdown only engages on v2
        # (v1, the engine default, silently ignores it) — with it,
        # minMaxAge reads column chunk stats instead of 100M rows
        # (plan shows PushedAggregation: [MIN(age), MAX(age)]).
        "spark.sql.sources.useV1SourceList": "",
    }
    saved = {k: spark.conf.get(k) for k in matrix_conf}
    for k, v in matrix_conf.items():
        spark.conf.set(k, v)
    # job-floor probe: min wall time of a 32-task noop job — the
    # irreducible per-query scheduling share at this core count.
    tiny = spark.range(32, numPartitions=32).persist()
    tiny.count()
    floor = min(
        _min_time(lambda: tiny.write.format("noop").mode("overwrite").save(), 3)
        for _ in range(2)
    )
    tiny.unpersist()
    out["records_job_floor_ms"] = round(floor * 1000)
    matrix_total = 0.0
    for name, fn in matrix_queries().items():
        if _elapsed() > DEADLINE_S:
            errors.setdefault("__deadline__", f"stopped before matrix {name} at {_elapsed():.0f}s")
            break
        try:
            run = lambda: fn(records).write.format("noop").mode("overwrite").save()  # noqa: E731
            run()
            t = _min_time(run, N_TIMED)
            timings[f"{label}_{name}"] = round(t, 4)
            matrix_total += t
        except Exception as e:
            errors[f"{label}_{name}"] = f"{type(e).__name__}: {str(e)[:300]}"
    for k, v in saved.items():
        spark.conf.set(k, v)
    # BASELINE.md comparison key: the reference's 9-query matrix
    # compute total (its 100M JVM total is 0.618 s).
    out["records_matrix_total_sec"] = round(matrix_total, 4)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
