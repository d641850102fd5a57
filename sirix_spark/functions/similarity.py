"""Vector similarity primitives over `array<float>` embedding columns.

Reference parity: the HNSW vector index (index/vector/VectorIndex.java:37-93
searchKnn, hnsw/HnswGraph.java:24). A navigable graph is the wrong
shape for a distributed engine; the Spark-native paths are:
- brute-force: broadcast the (small) query set, score every row with
  JVM higher-order functions, TakeOrderedAndProject for top-k — the
  exact baseline, embarrassingly parallel at 100 TB;
- IVF-style pruning: cluster id per row (precomputed or cheap
  assignment), shuffle-free candidate filter to matching clusters,
  then brute-force within — the scale path implemented in
  operators/ann.py.

All arithmetic is double, computed with sequential folds so results
are deterministic for a given partitioning-independent row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float/double array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
