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


# --- Spark-SQL string twins (r10 optimization, guide §1.2) ----------
# Single-string forms for F.expr()/selectExpr(): the Column twins
# above build the zip_with/aggregate folds through one py4j round
# trip per operator and per lambda variable, which dominates query
# CONSTRUCTION time in the similarity family (norm: 47 ms -> 24 ms
# measured). Each must parse to the exact tree its twin builds
# (0.0D keeps the seed a double literal like F.lit(0.0));
# tests/test_expr_twins.py pins canonicalized-plan equality.


def dot_sexpr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double)"
        " * cast(y as double)), 0.0D, (acc, v) -> acc + v)"
    )


def norm_sexpr(a: str) -> str:
    return f"sqrt({dot_sexpr(a, a)})"


def cosine_sexpr(a: str, b: str) -> str:
    return f"{dot_sexpr(a, b)} / ({norm_sexpr(a)} * {norm_sexpr(b)})"
