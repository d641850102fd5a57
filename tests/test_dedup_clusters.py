"""_min_label_propagate must compute per-component min labels — the
connected-components core of dedup_clusters — and converge without
the per-round labels⋈labels convergence join it used before r10 (the
previous label now rides through the propagation aggregate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.queries.dedup import _min_label_propagate


def _components_naive(n_nodes, pairs):
    """Union-find ground truth: doc -> min doc_id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def _run(spark, n_nodes, pairs, max_iter=12):
    edges_rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(
        edges_rows or [(0, 0)], "src bigint, dst bigint"
    )
    if not edges_rows:
        edges = edges.filter(F.lit(False))
    labels = spark.createDataFrame(
        [(i, i) for i in range(n_nodes)], "doc_id bigint, cluster bigint"
    )
    got = _min_label_propagate(edges, labels, max_iter=max_iter)
    return {r["doc_id"]: r["cluster"] for r in got.collect()}


def test_chain_path_and_triangle(spark):
    # path 0-1-2-3, triangle 4-5-6, isolated 7
    pairs = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)]
    assert _run(spark, 8, pairs) == _components_naive(8, pairs)


def test_converging_star_and_duplicate_edges(spark):
    # star into 9 (hub labelled LAST, so labels must flow uphill),
    # duplicate and self-referential shapes mixed in
    pairs = [(0, 9), (1, 9), (2, 9), (0, 9), (3, 4), (4, 3)]
    assert _run(spark, 10, pairs) == _components_naive(10, pairs)


def test_no_edges_is_identity(spark):
    assert _run(spark, 5, []) == {i: i for i in range(5)}


def test_fewer_jobs_than_convergence_join_form(spark):
    """Regression pin for the r10 optimization: the propagation loop
    must run strictly fewer Spark jobs than the old form that
    re-joined new labels against old labels every round for the
    changed-count. Differential in ONE session (absolute job counts
    vary with AQE stage materialization); measured 50 → 38 on this
    graph."""
    from sirix_spark.queries.dedup import CLUSTER_MAX_ITER

    def old_propagate(edges, labels):
        for _ in range(CLUSTER_MAX_ITER):
            prop = edges.join(
                labels.withColumnRenamed("doc_id", "dst_id"),
                edges.dst == F.col("dst_id"),
            ).select(F.col("src").alias("doc_id"), "cluster")
            new_labels = (
                labels.unionByName(prop)
                .groupBy("doc_id")
                .agg(F.min("cluster").alias("cluster"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("cluster", "old"), "doc_id"
                )
                .filter(F.col("cluster") < F.col("old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels

    pairs = [(i, i + 1) for i in range(5)]
    sc = spark.sparkContext

    def count_jobs(tag, fn):
        edges = spark.createDataFrame(
            [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
            "src bigint, dst bigint",
        )
        labels = spark.createDataFrame(
            [(i, i) for i in range(6)], "doc_id bigint, cluster bigint"
        )
        sc.setJobGroup(tag, tag)
        try:
            out = fn(edges, labels)
            assert out.count() == 6
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    old_jobs = count_jobs("cc-old-form", old_propagate)
    new_jobs = count_jobs("cc-new-form", _min_label_propagate)
    assert new_jobs < old_jobs, (new_jobs, old_jobs)


def test_iteration_cap_is_respected(spark):
    # a 6-node path needs >2 rounds to fully converge; with
    # max_iter=1 the result must be the one-round propagation
    # (each node takes min of itself and neighbours), not the fixpoint
    pairs = [(i, i + 1) for i in range(5)]
    got = _run(spark, 6, pairs, max_iter=1)
    expect = {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    assert got == expect
    # and with the default cap it reaches the fixpoint
    assert _run(spark, 6, pairs) == {i: 0 for i in range(6)}
