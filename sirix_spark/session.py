"""SparkSession factory tuned for the engine.

Scale notes (100 TB design intent, tested on local[32]):
- AQE on: runtime coalescing, skew-join splitting, dynamic join
  strategy switch replace the reference's cost-based Mesh/DPhyp
  stages (SURVEY.md §4 — SirixOptimizer.java:83-134 maps to Catalyst).
- shuffle.partitions is a local default; on a real cluster AQE
  coalesces from a high initial number, so we set the initial high
  and let AQE shrink.
- UTC session timezone so timestamp semantics match the DuckDB
  oracle (naive UTC micros in parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # --- adaptive execution: runtime re-planning at scale ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    # --- scan physics: pushdown + pruning (reference's zone maps /
    #     PAX regions come free from parquet, SURVEY.md §2.2) ---
    "spark.sql.parquet.filterPushdown": "true",
    # NOTE: aggregatePushdown only engages on the v2 parquet source
    # (set spark.sql.sources.useV1SourceList="" per-query/phase to
    # activate it, as bench.py's matrix phase does); the v1 default
    # silently ignores it. We keep v1 as the engine default — the
    # mature path for bucketing/nested pruning — and opt into v2
    # where footer-stat aggregates matter.
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # --- joins: broadcast small dims; CBO join reorder (reference
    #     DPhyp, AdaptiveJoinOrderOptimizer.java:8-22) ---
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # --- python boundary: Arrow batches only (never row-at-a-time) ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- determinism for oracle comparison ---
    "spark.sql.session.timeZone": "UTC",
    # local runs stay quiet
    "spark.ui.enabled": "false",
    # driver heap: Catalyst analysis of deeply-nested correlated
    # plans (XMark q09/q10 doc-mode replays) overflows the 1g
    # default; the box has 128 GiB (only applies at JVM launch —
    # inert on getOrCreate reuse)
    "spark.driver.memory": "16g",
}


def get_spark(
    app_name: str = "sirix-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SIRIX_SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
