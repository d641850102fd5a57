"""Deterministic cross-engine hashing.

Everything dedup/LSH-related needs a hash that is bit-identical in
Spark and in the DuckDB oracle. xxhash64/hash() differ between
engines, so we define:

    h(s) = int(md5(s)[:15 hex chars], 16)        (60-bit, positive)

- Spark:  conv(substring(md5(s), 1, 15), 16, 10) cast to bigint
- DuckDB: CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT)

MinHash permutations are the classic universal-hash family
(a*h + b) mod P over the Mersenne prime P = 2^31 - 1 (same family
the reference's dictionary sketches use for cardinality estimation —
StringDictSketch.java; our use is MinHash signatures).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1

# Deterministic seed family (literals derived from small primes).
N_MINHASH = 16


def minhash_seeds(n: int = N_MINHASH) -> list[tuple[int, int]]:
    return [(1_000_003 + 7_919 * j, 7 + 104_729 * j) for j in range(n)]


def md5_long(col: Column) -> Column:
    """60-bit positive hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# --- Spark-SQL string twins (r10 optimization, guide §1.2) ----------
# One F.expr()/selectExpr() call parses a whole expression in the JVM,
# where the Column-combinator forms above pay one py4j round-trip per
# operator — measured 350 ms -> 35 ms to construct the 16 minhash
# signature columns. Each *_sexpr MUST parse to the exact expression
# tree its Column twin builds (plain int literals, same operator
# shapes) so results are bit-identical; tests/test_expr_twins.py pins
# canonicalized-plan equality for every pair.


def md5_long_sexpr(expr: str) -> str:
    """Spark-SQL string form of md5_long (same expression tree)."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def md5_long_sql(expr: str) -> str:
    """Same hash, DuckDB SQL."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def bucket_hash(col: Column) -> Column:
    """h(s) mod P — the value MinHash permutations are applied to."""
    return md5_long(col) % F.lit(P)


def bucket_hash_sexpr(expr: str) -> str:
    """Spark-SQL string form of bucket_hash (same expression tree).
    Parenthesized so it embeds safely in larger expressions (e.g.
    inside perm_sexpr, where an unparenthesized `% P` would
    re-associate with the permutation's multiply)."""
    return f"({md5_long_sexpr(expr)} % {P})"


def bucket_hash_sql(expr: str) -> str:
    return f"({md5_long_sql(expr)} % {P})"


def perm(hw: Column, a: int, b: int) -> Column:
    """One MinHash permutation over an already-bucketed hash value."""
    return (F.lit(a) * hw + F.lit(b)) % F.lit(P)


def perm_sexpr(hw: str, a: int, b: int) -> str:
    """Spark-SQL string form of perm (same expression tree).
    Outer-parenthesized like perm_sql so it embeds safely in larger
    expressions (an unparenthesized `% P` would re-associate if a
    caller placed it in a multiplicative/modulo context)."""
    return f"(({a} * {hw} + {b}) % {P})"


def perm_sql(hw_expr: str, a: int, b: int) -> str:
    return f"(({a} * {hw_expr} + {b}) % {P})"
