"""Spark-SQL string twins must parse to the EXACT expression tree
their Column-combinator twins build (r10 optimization: query
construction moved from per-operator py4j calls to one-shot
F.expr/selectExpr strings — ~10× cheaper to build, and safe only
while the parsed tree is identical, because identical trees make
results bit-identical by construction).

Each test builds the same projection both ways over a tiny local
DataFrame and asserts canonicalized-analyzed-plan equality — the same
proof used to adopt the rewrite (plans/r10: canonicalized plans of
all 27 affected registry queries byte-identical before/after).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sirix_spark.functions.hashing import (
    P,
    bucket_hash,
    bucket_hash_sexpr,
    md5_long,
    md5_long_sexpr,
    minhash_seeds,
    perm,
    perm_sexpr,
)
from sirix_spark.functions.similarity import (
    cosine,
    cosine_sexpr,
    dot,
    dot_sexpr,
    norm,
    norm_sexpr,
)


def _canon(df) -> str:
    return df._jdf.queryExecution().analyzed().canonicalized().toString()


def _strings(spark):
    return spark.createDataFrame([("a b c",)], "text string")


def _vectors(spark):
    return spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])],
        "va array<float>, vb array<float>",
    )


def test_md5_long_twin(spark):
    df = _strings(spark)
    a = df.select(md5_long(F.col("text")).alias("h"))
    b = df.select(F.expr(md5_long_sexpr("text")).alias("h"))
    assert _canon(a) == _canon(b)


def test_bucket_hash_twin(spark):
    df = _strings(spark)
    a = df.select(bucket_hash(F.col("text")).alias("h"))
    b = df.select(F.expr(bucket_hash_sexpr("text")).alias("h"))
    assert _canon(a) == _canon(b)


def test_perm_twin_all_seeds(spark):
    df = _strings(spark)
    hw = md5_long(F.col("text")) % F.lit(P)
    for a_, b_ in minhash_seeds():
        a = df.select(perm(hw, a_, b_).alias("p"))
        b = df.select(
            F.expr(perm_sexpr(bucket_hash_sexpr("text"), a_, b_)).alias("p")
        )
        assert _canon(a) == _canon(b), (a_, b_)


def test_perm_inside_transform_twin(spark):
    """The minhash_signatures shape: permutation folded over a
    materialized hash array via a lambda variable."""
    df = _strings(spark).select(
        F.expr(f"transform(split(text, ' '), w -> {bucket_hash_sexpr('w')})").alias(
            "_h"
        )
    )
    a_, b_ = minhash_seeds()[0]
    a = df.select(
        F.array_min(F.transform(F.col("_h"), lambda h: perm(h, a_, b_))).alias("m")
    )
    b = df.selectExpr(f"array_min(transform(_h, h -> {perm_sexpr('h', a_, b_)})) AS m")
    assert _canon(a) == _canon(b)


def test_dot_twin(spark):
    df = _vectors(spark)
    a = df.select(dot(F.col("va"), F.col("vb")).alias("d"))
    b = df.select(F.expr(dot_sexpr("va", "vb")).alias("d"))
    assert _canon(a) == _canon(b)


def test_norm_twin(spark):
    df = _vectors(spark)
    a = df.select(norm(F.col("va")).alias("n"))
    b = df.select(F.expr(norm_sexpr("va")).alias("n"))
    assert _canon(a) == _canon(b)


def test_cosine_twin(spark):
    df = _vectors(spark)
    a = df.select(cosine(F.col("va"), F.col("vb")).alias("c"))
    b = df.select(F.expr(cosine_sexpr("va", "vb")).alias("c"))
    assert _canon(a) == _canon(b)


def test_simhash_vote_and_pack_twins(spark):
    """The simhash shapes: shifted-bit vote terms and the packed
    CASE-WHEN signature."""
    df = spark.createDataFrame([(7, 1, -2)], "hw bigint, v0 int, v1 int")
    bit = 3
    a = df.select(
        (F.shiftright(F.col("hw"), bit).bitwiseAND(F.lit(1)) * 2 - 1).alias("t")
    )
    b = df.selectExpr(f"(shiftright(hw, {bit}) & 1) * 2 - 1 AS t")
    assert _canon(a) == _canon(b)

    packed_col = None
    for i in range(2):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        packed_col = term if packed_col is None else packed_col + term
    a = df.select(packed_col.cast("bigint").alias("s"))
    packed_sql = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(2)
    )
    b = df.selectExpr(f"cast({packed_sql} as bigint) AS s")
    assert _canon(a) == _canon(b)


def test_emb_band_key_twin(spark):
    """The embedding_near_dup band key: packed sign bits of
    consecutive dimensions behind concat_ws."""
    df = spark.createDataFrame([([0.5, -0.5],)], "embedding array<float>")
    band, n_bits = 1, 2
    packed_col = None
    for b_ in range(n_bits):
        dim = band * n_bits + b_ + 1
        term = F.when(
            F.element_at(F.col("embedding"), dim) >= 0, F.lit(1 << b_)
        ).otherwise(F.lit(0))
        packed_col = term if packed_col is None else packed_col + term
    a = df.select(F.concat_ws("_", F.lit(band), packed_col).alias("k"))
    bits = " + ".join(
        f"(CASE WHEN element_at(embedding, {band * n_bits + b_ + 1}) >= 0"
        f" THEN {1 << b_} ELSE 0 END)"
        for b_ in range(n_bits)
    )
    b = df.selectExpr(f"concat_ws('_', {band}, {bits}) AS k")
    assert _canon(a) == _canon(b)


def test_norm_twin_sexpr_values(spark):
    """Belt and braces: identical trees imply identical values, but
    pin one computed number anyway."""
    df = _vectors(spark)
    row = df.select(
        F.expr(dot_sexpr("va", "vb")).alias("d"),
        F.expr(norm_sexpr("va")).alias("n"),
    ).collect()[0]
    assert row["d"] == 11.0
    assert abs(row["n"] - 5.0**0.5) < 1e-12
