"""Approximate nearest-neighbor search over embedding columns — the
scale path beyond brute force (reference: HNSW vector index,
index/vector/VectorIndex.java:37-93, hnsw/HnswGraph.java:24).

A navigable small-world graph is a pointer-chasing structure that
doesn't distribute; the Spark-native equivalents:

- IVF (inverted file): k-means-style coarse centroids; every vector
  is assigned to its nearest centroid (one map-only pass, centroids
  broadcast). A query probes only `nprobe` nearest cells — at 100 TB
  the candidate scan shrinks by ~ncells/nprobe with partition
  pruning if the table is written partitioned by cell.

- Random-hyperplane LSH: sign-bit signatures over broadcast
  hyperplanes; candidates = same-bucket rows (multi-table OR).
  Deterministic planes derive from a seeded hash so results are
  reproducible across runs/engines.

Both return exact cosine rankings over the candidate set (scores
from sirix_spark.functions.similarity, sequential-fold double math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sirix_spark.functions.similarity import cosine

EMB = "embedding"


# ---------- IVF ------------------------------------------------------
def ivf_assign(df: DataFrame, centroids: list[list[float]], emb_col: str = EMB) -> DataFrame:
    """Assign each row to its nearest centroid (map-only: centroid
    array is a broadcast literal; no shuffle)."""
    carr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    # cell = argmax cosine(embedding, centroid_i); ties → lowest i
    sims = F.transform(carr, lambda c: F.round(cosine(F.col(emb_col), c), 6))
    cell = F.expr(
        "array_position(sims, array_max(sims))"
    )
    return df.withColumn("sims", sims).withColumn(
        "cell", (cell - 1).cast("int")
    ).drop("sims")


def train_centroids(
    df: DataFrame, n_cells: int, emb_col: str = EMB, n_iter: int = 3, sample_frac: float = 1.0
) -> list[list[float]]:
    """Lloyd iterations with deterministic seed-free init: the
    initial centroids are the first n_cells rows by key order (works
    because embeddings are pre-shuffled synthetic/real corpora; a
    production run would use k-means|| via MLlib)."""
    first_col = df.columns[0]
    init = [
        [float(x) for x in r[emb_col]]
        for r in df.orderBy(first_col).limit(n_cells).collect()
    ]
    centroids = init
    work = df.sample(fraction=sample_frac, seed=42) if sample_frac < 1.0 else df
    for _ in range(n_iter):
        assigned = ivf_assign(work, centroids, emb_col)
        dim = len(centroids[0])
        sums = assigned.groupBy("cell").agg(
            *[F.sum(F.element_at(F.col(emb_col), i + 1)).alias(f"s{i}") for i in range(dim)],
            F.count("*").alias("n"),
        )
        rows = {r["cell"]: r for r in sums.collect()}
        centroids = [
            [rows[c][f"s{i}"] / rows[c]["n"] for i in range(dim)]
            if c in rows
            else centroids[c]
            for c in range(n_cells)
        ]
    return centroids


def ivf_search(
    df: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    emb_col: str = EMB,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest cells per query, exact-rank within.
    queries: (query_id, qv). Corpus side is filtered to probed cells
    BEFORE scoring — the candidate-reduction step."""
    corpus = ivf_assign(df, centroids, emb_col)
    q = ivf_probe_cells(queries, centroids, nprobe)
    cand = corpus.join(
        F.broadcast(q.select("query_id", "qv", F.explode("probe_cells").alias("cell"))),
        "cell",
    )
    scored = cand.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col(emb_col), F.col("qv")), 4).alias("cos"),
    ).filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def ivf_probe_cells(
    queries: DataFrame, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    sims = F.transform(carr, lambda c: F.round(cosine(F.col("qv"), c), 6))
    # top-nprobe cell indices by similarity (0-based)
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.arrays_zip(sims.alias("s"), idx.alias("i"))
    ordered = F.reverse(F.array_sort(pairs))  # sort by (s, i) asc → reverse
    return queries.withColumn(
        "probe_cells",
        F.slice(F.transform(ordered, lambda p: p.getField("i")), 1, nprobe),
    )


def assignment_margin(
    df: DataFrame, centroids: list[list[float]], emb_col: str = EMB
) -> float:
    """Structure statistic for the IVF route guard: mean top-1
    assignment margin, avg(sim(best cell) - sim(2nd-best cell)).

    Clustered data assigns decisively (measured 0.45 on the 10-blob
    fixture); i.i.d.-random high-dim vectors see every centroid at
    near-equal similarity (measured 0.15 on the synthetic embeddings
    table) — and in that regime nprobe-pruning recall collapses to
    ~0.5 (BENCH_NOTES recall table), information-theoretically
    unavoidable for ANY pruning index. One map-only aggregation over
    the broadcast centroid array — scales like the assignment pass."""
    if len(centroids) < 2:
        # a single cell has no 2nd-best similarity (element_at(top2,2)
        # is NULL → avg NULL → float(None) TypeError); one cell means
        # no pruning is possible, so report zero margin → exhaustive
        return 0.0
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    sims = F.transform(carr, lambda c: cosine(F.col(emb_col), c))
    top2 = F.slice(F.reverse(F.array_sort(sims)), 1, 2)
    m = F.element_at(top2, 1) - F.element_at(top2, 2)
    avg = df.select(F.avg(m)).first()[0]
    return 0.0 if avg is None else float(avg)


# Below this mean margin the index build pins route="exhaustive":
# midpoint of the measured fixtures (0.45 clustered / 0.15 random),
# biased low so genuinely clusterable corpora keep the fast path.
STRUCTURE_MARGIN_MIN = 0.25
# At or above this margin the corpus is decisively clustered and the
# default nprobe=2 probe holds recall@10 ≥ 0.97 (BENCH_NOTES round-4
# recall table, clustered fixture).
STRUCTURE_MARGIN_STRONG = 0.45


def margin_to_nprobe(margin: float, n_cells: int) -> int | None:
    """Continuous margin→nprobe routing (the HNSW recall/speed trade
    analog, HnswGraph.java:24 — round-5/6 verdict ask). The BENCH_NOTES
    round-4 recall table measures recall@10 on mid-structure data
    recovering with wider probes (nprobe=4 → 0.65, nprobe=8 → 0.83 on
    the structureless fixture; 1.0 from nprobe=4 on the clustered
    one), so instead of the binary exhaustive/nprobe=2 guard:

    - margin < 0.25: None — no usable structure, pruning halves
      recall; caller pins route='exhaustive'.
    - 0.25 ≤ margin < 0.45: linear ramp 8 → 4; mid-structure corpora
      pay a wider (but still pruned) probe instead of a full scan.
    - margin ≥ 0.45: 2 — the measured-0.97-recall default.

    Always capped at n_cells (an all-cells probe is exhaustive)."""
    if margin < STRUCTURE_MARGIN_MIN:
        return None
    if margin >= STRUCTURE_MARGIN_STRONG:
        return min(2, n_cells)
    import math

    span = STRUCTURE_MARGIN_STRONG - STRUCTURE_MARGIN_MIN
    np_f = 8.0 - (margin - STRUCTURE_MARGIN_MIN) / span * 4.0
    # ceil, not round: the band exists to protect recall — always err
    # toward the wider probe (measured: the half-clustered fixture at
    # nprobe=6 sits exactly AT 0.90 recall@10; 7 clears it)
    return min(math.ceil(np_f), n_cells)


# ---------- random-hyperplane LSH -----------------------------------
def _plane_value(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in
    [-0.5, 0.5): md5-seeded, reproducible anywhere."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{i}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) - 0.5)
    return out


def lsh_signature(
    df: DataFrame, dim: int, n_tables: int = 4, n_planes: int = 8, emb_col: str = EMB
) -> DataFrame:
    """Append `sig_t` (bit-packed int) per hash table: sign bits of
    dot(embedding, plane). Map-only; planes are literals."""
    out = df
    for t in range(n_tables):
        bits = None
        for p in range(n_planes):
            plane = F.array(*[F.lit(v) for v in _plane_value(t, p, dim)])
            d = F.aggregate(
                F.zip_with(F.col(emb_col), plane, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        out = out.withColumn(f"sig_{t}", bits)
    return out


def lsh_search(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    emb_col: str = EMB,
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidates = rows sharing any table signature with the query;
    exact cosine rank over candidates. Shuffles only by signature
    buckets (corpus explode factor = n_tables)."""
    corpus = lsh_signature(df, dim, n_tables, n_planes, emb_col)
    qsig = lsh_signature(
        queries.withColumnRenamed("qv", emb_col), dim, n_tables, n_planes, emb_col
    ).withColumnRenamed(emb_col, "qv")
    c_buckets = corpus.select(
        id_col,
        emb_col,
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig_{t}").alias("s")) for t in range(n_tables)])
        ).alias("b"),
    ).select(id_col, emb_col, F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    q_buckets = qsig.select(
        "query_id",
        "qv",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig_{t}").alias("s")) for t in range(n_tables)])
        ).alias("b"),
    ).select("query_id", "qv", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    cand = (
        c_buckets.join(F.broadcast(q_buckets), ["t", "s"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, emb_col, "qv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col(emb_col), F.col("qv")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )
