"""Distributed EXACT ntile — no single-partition window.

`F.ntile(n).over(Window.orderBy(...))` is exact but moves every row
through ONE task (Exchange SinglePartition + one sort): the carried
scale residual of the windows family since round 2. This operator
keeps the exact semantics with only PARALLEL stages:

1. range-repartition by the order columns (the same distributed sort
   Spark uses for orderBy — partition i holds keys below partition
   i+1's);
2. per-partition row_number, partitioned by spark_partition_id — a
   parallel window;
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


def exact_ntile(
    df: DataFrame, n: int, order_cols: list, output: str = "tile"
) -> DataFrame:
    """``df`` + column ``output`` = exact ntile(n) over the global
    order given by ``order_cols`` (names or Columns), computed with
    parallel stages only."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    wp = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__rn", F.row_number().over(wp))
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
