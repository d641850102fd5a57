"""Similarity-search operators over the `embeddings` table
(array<float> column): brute-force cosine top-k and batch kNN join.

Scale design: the query set is broadcast (single-row or small), the
corpus side is never shuffled — score is computed per-partition with
JVM higher-order functions, and top-k is TakeOrderedAndProject
(per-partition heaps + driver merge).

Determinism: Spark's sequential fold and DuckDB's list_cosine_
similarity produce BIT-IDENTICAL doubles here (verified on all 2000
vectors at sf0.1); scores are floor-scaled to 1e-4 ticks (`cos_e4`)
before ranking so tie-breaking (cos_e4 desc, vec_id asc) selects the
same row set in both engines. floor beats round(x,4) because round
implementations disagree at .00005 boundaries on identical inputs.
"""

from __future__ import annotations



from pyspark.sql import functions as F

from sirix_spark.functions.similarity import cosine_sexpr, dot_sexpr, norm_sexpr
from sirix_spark.queries import Query
from sirix_spark.tables import load

# r10 optimization (guide §1.2 "per-task work"): cosine(a,b) =
# dot(a,b) / (norm(a) * norm(b)); the norms depend on ONE vector, so
# where candidate pairs outnumber vectors (knn_join: K queries per
# corpus row) they are computed once per row in a projection BELOW
# the pair join instead of once per candidate pair. Catalyst cannot
# hoist them itself (the projections sit on opposite sides of the
# join, and higher-order-function folds run interpreted — 3
# folds/pair → 1). Bit-identical: the norm fold is the same
# expression on the same vector, and the (na * nb) multiply keeps
# the original operand order, so every double matches the previous
# formulation exactly. cosine_topk deliberately KEEPS the fused
# form: with exactly one pair per corpus row there is nothing to
# amortize, and the A/B measured the hoisted form 15-20% slower
# there (extra projection + wider join rows for zero saved folds).
TOP_K = 10
KNN_QUERIES = 5
KNN_K = 3


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    # cosine built as ONE Spark-SQL string (r10, guide §1.2): the
    # Column-combinator fold construction was ~half this query's
    # driver time; identical tree (tests/test_expr_twins.py).
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "label",
            f"cast(floor({cosine_sexpr('embedding', 'qv')} * 10000) as bigint)"
            " AS cos_e4",
        )
    )
    return scored.orderBy(F.col("cos_e4").desc(), F.col("vec_id").asc()).limit(TOP_K)


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) * 10000) AS BIGINT) AS cos_e4
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cos_e4 DESC, vec_id ASC
LIMIT {TOP_K}
"""


def knn_join(spark, sf_dir):
    """Batch kNN: for each query vector (vec_id < KNN_QUERIES), the
    KNN_K nearest neighbors. Queries broadcast; ranking windowed per
    query."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES).selectExpr(
        "vec_id AS query_id",
        "embedding AS qv",
        f"{norm_sexpr('embedding')} AS nq",
    )
    scored = (
        emb.selectExpr("vec_id", "embedding", f"{norm_sexpr('embedding')} AS nv")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "vec_id",
            f"cast(floor({dot_sexpr('embedding', 'qv')} / (nv * nq) * 10000)"
            " as bigint) AS cos_e4",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e4").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "vec_id", "cos_e4", "rank")
    )


KNN_JOIN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {KNN_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qv AS DOUBLE[])) * 10000) AS BIGINT) AS cos_e4
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_e4, rank FROM (
  SELECT query_id, vec_id, cos_e4,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_e4 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {KNN_K}
"""


# --- index-routed search (round-2 verdict #7) -----------------------
VS_QUERIES = 3
VS_K = 5
VS_CELLS = 4


def vector_search_routed(spark, sf_dir):
    """create_vector_index → auto-routed vector_search, end-to-end
    through the persisted IVF index (VectorIndex.java:37-93 lifecycle):
    the corpus is committed to a store, the index is built (centroids
    trained, vectors written partitioned by cell), and the search is
    served from the index path — the plan reads vidx_* files, not the
    snapshot (asserted in tests/test_indexes.py).

    Probes ALL cells (nprobe = n_cells) so the candidate set is the
    full corpus and the result is EXACTLY the brute-force kNN — which
    is what makes an approximate-index route oracle-checkable. Cell
    pruning with nprobe < n_cells is covered by the recall tests in
    tests/test_ann.py / test_indexes.py."""
    import tempfile

    from sirix_spark.store.indexes import ProjectionIndexes
    from sirix_spark.store.store import VersionedStore

    emb = _emb(spark, sf_dir)
    st = VersionedStore(spark, tempfile.mkdtemp(prefix="vidx_bench_"))
    st.store("bench", "emb", emb, key="vec_id")
    idx = ProjectionIndexes(st)
    idx.create_vector_index("bench", "emb", "ann", n_cells=VS_CELLS, method="ivf")
    queries = emb.filter(F.col("vec_id") < VS_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return idx.vector_search(
        "bench", "emb", queries, k=VS_K, nprobe=VS_CELLS
    ).withColumnRenamed("record_key", "vec_id")


VECTOR_SEARCH_ROUTED_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {VS_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qv AS DOUBLE[])) * 10000) AS BIGINT) AS cos_e4
  FROM embeddings e, q
)
SELECT query_id, vec_id, cos_e4, rank FROM (
  SELECT query_id, vec_id, cos_e4,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_e4 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {VS_K}
"""


QUERIES = {
    "cosine_topk": Query(cosine_topk, COSINE_TOPK_SQL, ("similarity",)),
    "knn_join": Query(knn_join, KNN_JOIN_SQL, ("similarity",)),
    "vector_search_routed": Query(
        vector_search_routed, VECTOR_SEARCH_ROUTED_SQL, ("similarity", "index")
    ),
}
