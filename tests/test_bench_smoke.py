"""Bench smoke gate (round-2 verdict #2): a red bench must never ship
silently again. Runs bench.py as a subprocess at sf0.001 with 1 timed
repeat and a tiny records matrix, asserts the final line parses as
JSON with the matrix keys — and that an injected failing query is
fault-isolated into "errors" instead of aborting the run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SIRIX_SPARK_BENCH_N_TIMED="1",
        SIRIX_SPARK_RECORDS_N="100000",
        SIRIX_SPARK_DRIVER_MEM="4g",
        **extra_env,
    )
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in bench output; stderr tail: {p.stderr[-2000:]}"
    return p, json.loads(lines[-1])


def test_bench_emits_json_with_matrix():
    p, out = _run_bench({})
    assert p.returncode == 0, p.stderr[-2000:]
    assert out["value"] is not None and out["value"] > 0
    assert "errors" not in out, out.get("errors")
    qs = out["queries"]
    # headline + records matrix keys all present
    assert "pricing_summary" in qs and "sessionize_events" in qs
    matrix = [k for k in qs if k.startswith("records0m_")]
    assert len(matrix) >= 10, matrix  # ingest + 9 matrix queries
    assert "records_matrix_total_sec" in out
    assert "records_ingest_per_sec" in out


def test_bench_survives_failing_query():
    p, out = _run_bench({"SIRIX_SPARK_BENCH_INJECT_FAIL": "no_such_query"})
    assert p.returncode == 0
    assert "no_such_query" in out.get("errors", {})
    # the rest of the suite still ran and the JSON still landed
    assert "pricing_summary" in out["queries"]
    assert out["value"] > 0
