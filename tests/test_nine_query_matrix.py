"""The reference's 9-query DuckDB matrix, verbatim shapes
(SirixVsDuckBenchMain.java:39-47 / BASELINE.md), over the
reference-shaped `records` table — Spark vs DuckDB on identical
parquet."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sirix_spark.fixtures import generated_records

N = 100_000


@pytest.fixture(scope="module")
def records(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("records") / "records.parquet")
    generated_records(spark, N).write.parquet(path, mode="overwrite")
    df = spark.read.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW records AS SELECT * FROM '{path}/*.parquet'")
    return df, con


# (name, spark_fn, duckdb_sql) — the nine shapes
MATRIX = [
    (
        "filterCount",
        lambda df: df.filter((F.col("age") > 40) & F.col("active")).agg(
            F.count("*").alias("cnt")
        ),
        "SELECT count(*) AS cnt FROM records WHERE age > 40 AND active",
    ),
    (
        "groupByDept",
        lambda df: df.groupBy("dept").agg(F.count("*").alias("cnt")),
        "SELECT dept, count(*) AS cnt FROM records GROUP BY dept",
    ),
    (
        "sumAge",
        lambda df: df.agg(F.sum("age").alias("s")),
        "SELECT sum(age) AS s FROM records",
    ),
    (
        "avgAge",
        lambda df: df.agg((F.sum("age") / F.count("age")).alias("a")),
        "SELECT sum(age) / count(age) AS a FROM records",
    ),
    (
        "minMaxAge",
        lambda df: df.agg(F.min("age").alias("mn"), F.max("age").alias("mx")),
        "SELECT min(age) AS mn, max(age) AS mx FROM records",
    ),
    (
        "groupBy2Keys",
        lambda df: df.groupBy("dept", "city").agg(F.count("*").alias("cnt")),
        "SELECT dept, city, count(*) AS cnt FROM records GROUP BY dept, city",
    ),
    (
        "filterGroupBy",
        lambda df: df.filter("active").groupBy("dept").agg(F.count("*").alias("cnt")),
        "SELECT dept, count(*) AS cnt FROM records WHERE active GROUP BY dept",
    ),
    (
        "countDistinct",
        lambda df: df.agg(F.countDistinct("dept").alias("cd")),
        "SELECT count(DISTINCT dept) AS cd FROM records",
    ),
    (
        "compoundAndFilterCount",
        lambda df: df.filter(
            (F.col("age") > 30) & (F.col("age") < 50) & F.col("active")
        ).agg(F.count("*").alias("cnt")),
        "SELECT count(*) AS cnt FROM records WHERE age > 30 AND age < 50 AND active",
    ),
]


@pytest.mark.parametrize("name,fn,sql", MATRIX, ids=[m[0] for m in MATRIX])
def test_matrix_query(records, name, fn, sql):
    df, con = records
    srows = {tuple(r) for r in fn(df).collect()}
    drows = {tuple(r) for r in con.execute(sql).fetchall()}
    assert srows == drows, name


@pytest.fixture(scope="module")
def coded_records(spark, tmp_path_factory):
    from sirix_spark.fixtures import generated_records_coded

    path = str(tmp_path_factory.mktemp("records_coded") / "records.parquet")
    generated_records_coded(spark, N).write.parquet(path, mode="overwrite")
    return spark.read.parquet(path)


def test_dict_coded_matrix_identical(spark, records, coded_records):
    """The dict-coded ingest layout (bench.py's matrix path) must
    produce byte-identical results to the string layout for all nine
    shapes: group on tinyint codes, decode at emit (the reference's
    dictionary-id kernel strategy, SirixVectorizedExecutor.java:1247)."""
    from sirix_spark.fixtures import matrix_queries, records_vocab

    df, _ = records
    string_q = matrix_queries()
    coded_q = matrix_queries(decode=records_vocab())
    assert set(string_q) == set(coded_q)
    for name in string_q:
        s = string_q[name](df)
        c = coded_q[name](coded_records)
        assert s.columns == c.columns, name
        srows = {tuple(r) for r in s.collect()}
        crows = {tuple(r) for r in c.collect()}
        assert srows == crows, name
