"""Deterministic fixture generators mirroring the reference's bench
dataset shape (FIXTURES.md §1; GeneratedRecordsReader.java:22-56
defines {id, age 18..65, dept/city 8 values, active} with a fixed
seed — we reproduce the SHAPE and distributions, not Java's RNG
stream, using hash-based columns so generation is pure Spark,
parallel, and identical everywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEPTS = ("Eng", "Sales", "Mkt", "Ops", "HR", "Finance", "Legal", "Supp")
CITIES = ("NYC", "LA", "SF", "ATL", "BOS", "CHI", "DEN", "DAL")


def matrix_queries(decode: dict | None = None) -> dict[str, "callable"]:
    """The reference's 9 bench queries (SirixVsDuckBenchMain.java:
    39-47 / BASELINE.md), as DataFrame closures over a records df.

    With ``decode`` (the dict-coded ingest layout's vocab,
    records_vocab()), the group-bys run over the tinyint code columns
    and rebuild the output strings at emit — the reference's own
    kernel strategy (SirixVectorizedExecutor.java:1247 sweeps
    composite dictionary ids, decoding only group heads). Output
    rows/schema are identical to the string plan."""
    if decode is not None:
        dept_arr = F.array(*[F.lit(d) for d in decode["dept"]])
        city_arr = F.array(*[F.lit(c) for c in decode["city"]])
        dec = lambda arr, code, name: F.element_at(  # noqa: E731
            arr, F.col(code).cast("int") + 1
        ).alias(name)
        return {
            "filterCount": lambda df: df.filter(
                (F.col("age") > 40) & F.col("active")
            ).agg(F.count("*").alias("cnt")),
            "groupByDept": lambda df: df.groupBy("dept_code")
            .agg(F.count("*").alias("cnt"))
            .select(dec(dept_arr, "dept_code", "dept"), "cnt"),
            "sumAge": lambda df: df.agg(F.sum("age").alias("s")),
            "avgAge": lambda df: df.agg(
                (F.sum("age") / F.count("age")).alias("a")
            ),
            "minMaxAge": lambda df: df.agg(
                F.min("age").alias("mn"), F.max("age").alias("mx")
            ),
            "groupBy2Keys": lambda df: df.groupBy("dept_code", "city_code")
            .agg(F.count("*").alias("cnt"))
            .select(
                dec(dept_arr, "dept_code", "dept"),
                dec(city_arr, "city_code", "city"),
                "cnt",
            ),
            "filterGroupBy": lambda df: df.filter("active")
            .groupBy("dept_code")
            .agg(F.count("*").alias("cnt"))
            .select(dec(dept_arr, "dept_code", "dept"), "cnt"),
            "countDistinct": lambda df: df.agg(
                F.countDistinct("dept_code").alias("cd")
            ),
            "compoundAndFilterCount": lambda df: df.filter(
                (F.col("age") > 30) & (F.col("age") < 50) & F.col("active")
            ).agg(F.count("*").alias("cnt")),
        }
    return {
        "filterCount": lambda df: df.filter((F.col("age") > 40) & F.col("active")).agg(
            F.count("*").alias("cnt")
        ),
        "groupByDept": lambda df: df.groupBy("dept").agg(F.count("*").alias("cnt")),
        "sumAge": lambda df: df.agg(F.sum("age").alias("s")),
        "avgAge": lambda df: df.agg((F.sum("age") / F.count("age")).alias("a")),
        "minMaxAge": lambda df: df.agg(
            F.min("age").alias("mn"), F.max("age").alias("mx")
        ),
        "groupBy2Keys": lambda df: df.groupBy("dept", "city").agg(
            F.count("*").alias("cnt")
        ),
        "filterGroupBy": lambda df: df.filter("active")
        .groupBy("dept")
        .agg(F.count("*").alias("cnt")),
        "countDistinct": lambda df: df.agg(F.countDistinct("dept").alias("cd")),
        "compoundAndFilterCount": lambda df: df.filter(
            (F.col("age") > 30) & (F.col("age") < 50) & F.col("active")
        ).agg(F.count("*").alias("cnt")),
    }


def generated_records(spark: SparkSession, n: int) -> DataFrame:
    """The 9-query matrix table at any scale: one narrow int column
    fanned out to the full schema with xxhash64-derived fields —
    map-only, no driver data."""
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))  # noqa: E731
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.lit(18) + h("age") % 48).cast("long").alias("age"),
            F.element_at(
                F.array(*[F.lit(d) for d in DEPTS]), (h("dept") % 8 + 1).cast("int")
            ).alias("dept"),
            F.element_at(
                F.array(*[F.lit(c) for c in CITIES]), (h("city") % 8 + 1).cast("int")
            ).alias("city"),
            (h("active") % 2 == 0).alias("active"),
        )
    )


def records_vocab() -> dict[str, list[str]]:
    """The dict-coded layout's decode vocab: code c → vocab[c]. At
    real scale this is the dictionary sidecar the ingest builds; here
    the vocab is the fixture's fixed 8-value domains."""
    return {"dept": list(DEPTS), "city": list(CITIES)}


def generated_records_coded(spark: SparkSession, n: int) -> DataFrame:
    """Dict-coded ingest layout of the records table: dept/city as
    tinyint codes (code c decodes to records_vocab()[col][c]), exactly
    the rows of generated_records(). Low-cardinality strings stored as
    dictionary codes is the reference's own columnar trick — its
    kernels aggregate dictionary ids and decode group heads only
    (SirixVectorizedExecutor.java:1247); at 100 TB it's also the
    layout that keeps group-by hash tables byte-keyed."""
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))  # noqa: E731
    return (
        spark.range(n)
        .select(
            F.col("id"),
            # int, not long: age is 18..65 — the reference stores a
            # 4-byte int (GeneratedRecordsReader.java age column) and
            # the narrower physical type halves the scan bytes for
            # every age-predicate/aggregate query.
            (F.lit(18) + h("age") % 48).cast("int").alias("age"),
            (h("dept") % 8).cast("tinyint").alias("dept_code"),
            (h("city") % 8).cast("tinyint").alias("city_code"),
            (h("active") % 2 == 0).alias("active"),
        )
    )
