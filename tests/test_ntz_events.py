"""Timestamp-encoding regression net (round-2 verdict #1).

Three rounds lost to the same query: the driver's events.parquet kept
arriving with a different timestamp physical type than the local
fixtures (r1: tz-rendered strings; r2: isAdjustedToUTC=false µs read
as TIMESTAMP_NTZ → DATATYPE_MISMATCH in unix_micros). This file
WRITES all three parquet shapes itself and proves the load boundary
(sirix_spark/tables.py:_load_events) normalizes every one of them to
plain TIMESTAMP with identical values:

  - timestamp[us] naive  (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ)
  - timestamp[us] UTC    (isAdjustedToUTC=true  → Spark TIMESTAMP)
  - timestamp[ns] naive  (vectorized reader rejects → nanosAsLong path)

Then builds EVERY registry plan over an sf0.001 clone whose events
table is the NTZ shape — the exact analysis that threw in round 2.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sirix_spark import tables
from sirix_spark.operators.sessionize import session_stats

TS = [
    (1, "2024-01-01T10:00:00"),
    (1, "2024-01-01T10:10:00"),
    (1, "2024-01-01T20:00:00"),
    (2, "2024-01-01T09:00:00"),
    (2, "2024-01-02T09:00:00"),
]

SHAPES = {
    "ntz_us": pa.timestamp("us"),
    "utc_us": pa.timestamp("us", tz="UTC"),
    "ntz_ns": pa.timestamp("ns"),
}


def _write_events(path: str, ts_type: pa.DataType) -> None:
    naive = [datetime.datetime.fromisoformat(t) for _, t in TS]
    if ts_type.tz is not None:
        vals = [d.replace(tzinfo=datetime.timezone.utc) for d in naive]
    else:
        vals = naive
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(TS)), pa.int64()),
            "ts": pa.array(vals, ts_type),
            "user_id": pa.array([u for u, _ in TS], pa.int64()),
            "event_type": pa.array(["click"] * len(TS)),
            "value": pa.array([1.0] * len(TS), pa.float64()),
            "props": pa.array(["{}"] * len(TS)),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module", params=list(SHAPES))
def shaped_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    _write_events(str(d / "events.parquet"), SHAPES[request.param])
    return str(d)


def test_load_normalizes_to_timestamp(spark, shaped_dir):
    df = tables.load(spark, shaped_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", shaped_dir


def test_sessionize_identical_across_encodings(spark, shaped_dir):
    """The values (not just the types) must agree for every encoding —
    this is what 'deterministic under UTC session tz' means."""
    df = tables.load(spark, shaped_dir, "events")
    got = sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["session_start_s"])
        for r in session_stats(df).collect()
    )
    epoch = lambda s: int(  # noqa: E731
        datetime.datetime.fromisoformat(s + "+00:00").timestamp()
    )
    assert got == [
        (1, 1, 2, epoch("2024-01-01T10:00:00")),
        (1, 2, 1, epoch("2024-01-01T20:00:00")),
        (2, 1, 1, epoch("2024-01-01T09:00:00")),
        (2, 2, 1, epoch("2024-01-02T09:00:00")),
    ]


@pytest.fixture(scope="module")
def ntz_sf_dir(tmp_path_factory, sf_dir):
    """sf0.001 clone with events re-encoded as TIMESTAMP_NTZ — the
    round-2 driver shape."""
    d = tmp_path_factory.mktemp("ntz_sf")
    for t in tables.TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t == "events":
            # strip any tz annotation from the real table
            tbl = pq.read_table(src)
            ts = tbl.column("ts")
            ts = ts.cast(pa.timestamp("us"))
            idx = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(idx, "ts", ts)
            pq.write_table(tbl, str(d / "events.parquet"))
        else:
            os.symlink(src, str(d / f"{t}.parquet"))
    return str(d)


def test_full_registry_builds_on_ntz_events(spark, ntz_sf_dir):
    """Analysis of every registry plan over NTZ-events data — the
    exact phase that raised DATATYPE_MISMATCH in CORRECTNESS_r02."""
    from sirix_spark.queries import registry

    for name, q in registry().items():
        df = q.fn(spark, ntz_sf_dir)
        assert df.columns, name


def test_sessionize_executes_on_ntz_events(spark, ntz_sf_dir):
    from sirix_spark.queries import registry

    q = registry()["sessionize_events"]
    rows = q.fn(spark, ntz_sf_dir).limit(5).collect()
    assert rows
