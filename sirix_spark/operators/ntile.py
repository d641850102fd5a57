"""Distributed EXACT ntile — no single-partition window.

`F.ntile(n).over(Window.orderBy(...))` is exact but moves every row
through ONE task (Exchange SinglePartition + one sort): the carried
scale residual of the windows family since round 2. This operator
keeps the exact semantics with only PARALLEL stages:

1. range-repartition by the order columns (the same distributed sort
   Spark uses for orderBy — partition i holds keys below partition
   i+1's) and sort within partitions;
2. per-partition row number DERIVED from
   ``monotonically_increasing_id`` — its documented layout is
   (partitionId << 33) + rowNumberInPartition, so one map-side
   projection yields both (__pid, __rn). r10 optimization: the
   previous implementation computed __rn with a window PARTITIONED
   by spark_partition_id, and `Window.partitionBy(__pid)` hash-
   repartitions — a SECOND full Exchange of the data right after the
   range exchange (plans/r10/ntile_value_quartiles_before.txt). The
   id decomposition is map-only: the data now crosses the network
   once. Bound: 2^33 rows per range partition (8.6 B) — far above
   any sane partition size;
3. per-partition counts → cumulative offsets (a tiny P-row frame;
   its single-partition window is over P rows, not the data);
4. global rank = offset + local row number, broadcast-joined back;
5. the closed-form rank→bucket map (first `total % n` buckets get
   one extra row — SQL ntile's exact definition).

Ranks are globally consistent with the sort order; among DUPLICATE
order keys the assignment is arbitrary, exactly like window ntile
with a non-unique ORDER BY — pass a tiebreaker column for
determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN_MASK = (1 << 33) - 1


def exact_ntile(
    df: DataFrame, n: int, order_cols: list, output: str = "tile"
) -> DataFrame:
    """``df`` + column ``output`` = exact ntile(n) over the global
    order given by ``order_cols`` (names or Columns), computed with
    parallel stages only."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    # monotonically_increasing_id is nondeterministic-flagged, so
    # Catalyst cannot reorder it below the sort; rows are numbered in
    # the in-partition sort order.
    local = (
        ranged.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), 33).cast("int"))
        .withColumn(
            "__rn", F.col("__mid").bitwiseAND(F.lit(_RN_MASK)) + F.lit(1)
        )
        .drop("__mid")
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # offsets over the tiny per-partition-count frame (P rows)
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy(F.lit(1))
    offs = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(wo), F.lit(0))
    ).withColumn("__total", F.sum("__cnt").over(wall)).drop("__cnt")
    out = local.join(F.broadcast(offs), "__pid")
    rank = F.col("__off") + F.col("__rn")
    total = F.col("__total")
    size = F.floor(total / n).cast("bigint")
    rem = (total % n).cast("bigint")
    big = rem * (size + F.lit(1))
    # integer ceil(a/b) = floor((a + b - 1) / b); greatest() guards
    # the (never-taken when size=0) otherwise branch against /0
    tile = F.when(
        rank <= big,
        F.floor((rank + size) / (size + F.lit(1))),
    ).otherwise(
        rem + F.floor(
            (rank - big + F.greatest(size, F.lit(1)) - 1)
            / F.greatest(size, F.lit(1))
        )
    )
    return out.withColumn(output, tile.cast("int")).drop(
        "__pid", "__rn", "__off", "__total"
    )
