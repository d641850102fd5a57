"""The reference's headline property — time-travel open cost flat in
revision count (docs/BENCHMARKS.md:141-153) — holds by construction
here: doc(r) reads at most checkpoint_every delta files plus one
checkpoint, REGARDLESS of total history length. Pinned via the
physical plan (count of parquet scans), not wall clock."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sirix_spark.plans import explain_str
from sirix_spark.store import VersionedStore
from sirix_spark.store.store import RECORD_KEY

CKPT = 4
N_REVISIONS = 13


@pytest.fixture(scope="module")
def long_history(spark, tmp_path_factory):
    store = VersionedStore(
        spark, str(tmp_path_factory.mktemp("lh")), checkpoint_every=CKPT
    )
    df = spark.createDataFrame([(i, 0) for i in range(20)], "id long, v long")
    store.store("db", "r", df, key="id")
    for rev in range(2, N_REVISIONS + 1):
        store.replace_where("db", "r", F.col(RECORD_KEY) == rev % 20, {"v": rev})
    return store


def _n_scans(df) -> int:
    return explain_str(df, "simple").count("FileScan parquet")


def test_scan_count_bounded_by_checkpoint_interval(long_history):
    store = long_history
    for rev in range(1, N_REVISIONS + 1):
        n = _n_scans(store.doc("db", "r", revision=rev))
        assert n <= CKPT, f"revision {rev} reads {n} files (> {CKPT})"


def test_latest_read_not_proportional_to_history(long_history):
    # the read plan for the newest revision is as small as for an
    # early one — history length never enters the plan
    early = _n_scans(long_history.doc("db", "r", revision=2))
    late = _n_scans(long_history.doc("db", "r", revision=N_REVISIONS))
    assert late <= max(early, CKPT)


def test_all_revisions_still_correct(long_history):
    store = long_history
    # spot-check consistency at a checkpoint, after it, and at head
    for rev in (CKPT, CKPT + 1, N_REVISIONS):
        vals = {
            r[RECORD_KEY]: r["v"] for r in store.doc("db", "r", revision=rev).collect()
        }
        expected = {i: 0 for i in range(20)}
        for rr in range(2, rev + 1):
            expected[rr % 20] = rr
        assert vals == expected, f"revision {rev}"
