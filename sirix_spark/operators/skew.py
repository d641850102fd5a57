"""Skew-resistant join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; salting is the explicit fallback for pathological hot
keys (a handful of keys owning most of the fact side) — the pattern
a 100 TB pipeline needs when one user/document dominates.

    fact ⋈ dim on k  →  fact(salt = hash(row) % n) ⋈ dim×(0..n-1)
                        on (k, salt)

The dim side is replicated n ways (fine — it's the small side), the
fact side's hot key spreads over n tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in fact.columns])) % n_salts).cast("int")
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = fact_s.join(dim_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
