"""Sessionization: batch/stream differential — the streaming stateful
operator must close the same sessions the batch operator computes."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sirix_spark.operators.sessionize import session_stats, sessionize_stream

EVENTS = [
    (1, "2024-01-01 10:00:00"),
    (1, "2024-01-01 10:10:00"),
    (1, "2024-01-01 20:00:00"),  # > 6h gap → new session
    (2, "2024-01-01 09:00:00"),
    (2, "2024-01-02 09:00:00"),  # new session
    (2, "2024-01-02 09:30:00"),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [(u, datetime.fromisoformat(t)) for u, t in EVENTS], "user_id long, ts timestamp"
    )


def test_batch_sessionize(ev):
    rows = {
        (r["user_id"], r["session_id"]): r for r in session_stats(ev).collect()
    }
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 2)]["n_events"] == 1
    assert rows[(2, 1)]["n_events"] == 1
    assert rows[(2, 2)]["n_events"] == 2
    # epoch-second bounds (tz-independent output; session tz is UTC
    # in the test session, so wall time == UTC instant)
    import calendar

    def epoch(s):
        return calendar.timegm(datetime.fromisoformat(s).timetuple())

    assert rows[(2, 2)]["session_start_s"] == epoch("2024-01-02 09:00:00")
    assert rows[(2, 2)]["session_end_s"] == epoch("2024-01-02 09:30:00")


def test_stream_sessionize_closes_sessions(spark, ev, tmp_path):
    """Feed the same events through a file stream; closed sessions
    (those followed by a gap) must match the batch result."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    lines = [
        json.dumps({"user_id": u, "ts": t}) for u, t in EVENTS
    ]
    (inbox / "all.json").write_text("\n".join(lines))
    stream = spark.readStream.schema("user_id long, ts timestamp").json(str(inbox))
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # sessions CLOSED by a later event (open tails stay in state)
    assert got == {(1, 1): 2, (2, 1): 1}
