"""Property-based store oracle — random update workloads checked
against an in-memory model (the reference's
JsonModelBasedOracleRandomTest.java / RandomWorkloadTemporal-
ConsistencyFuzz.java approach, scaled to Spark test budgets:
few examples, deterministic seeds, every revision replayed)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sirix_spark.store import VersionedStore
from sirix_spark.store.store import RECORD_KEY

N_WORKLOADS = 3
N_OPS = 8


def _apply_random_workload(spark, store, db, res, rng):
    """Random ops; returns the model snapshot after every commit."""
    model = {k: rng.randint(0, 100) for k in range(1, 6)}
    df = spark.createDataFrame(list(model.items()), "id long, v long")
    store.store(db, res, df, key="id")
    snapshots = [dict(model)]
    next_key = 6
    for _ in range(N_OPS):
        op = rng.choice(["insert", "update", "delete", "upsert"])
        if op == "insert":
            k, v = next_key, rng.randint(0, 100)
            next_key += 1
            store.insert_records(
                db, res, spark.createDataFrame([(k, v)], "id long, v long"), key="id"
            )
            model[k] = v
        elif op == "update" and model:
            k = rng.choice(sorted(model))
            v = rng.randint(0, 100)
            store.replace_where(db, res, F.col(RECORD_KEY) == k, {"v": v})
            model[k] = v
        elif op == "delete" and model:
            k = rng.choice(sorted(model))
            store.delete_where(db, res, F.col(RECORD_KEY) == k)
            del model[k]
        else:
            k = rng.choice(sorted(model)) if model and rng.random() < 0.5 else next_key
            if k == next_key:
                next_key += 1
            v = rng.randint(0, 100)
            store.upsert_records(
                db, res, spark.createDataFrame([(k, v)], "id long, v long"), key="id"
            )
            model[k] = v
        snapshots.append(dict(model))
    return snapshots


@pytest.mark.parametrize("seed", range(N_WORKLOADS))
def test_random_workload_temporal_consistency(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    # small checkpoint interval → delta and checkpoint paths both hit
    store = VersionedStore(spark, str(tmp_path / f"s{seed}"), checkpoint_every=3)
    snapshots = _apply_random_workload(spark, store, "db", "r", rng)

    # every historical revision must equal the model snapshot
    for rev, expected in enumerate(snapshots, start=1):
        got = {
            r[RECORD_KEY]: r["v"] for r in store.doc("db", "r", revision=rev).collect()
        }
        assert got == expected, f"seed {seed} revision {rev}"

    # diff between any adjacent pair must reconstruct the model delta
    for rev in range(2, len(snapshots) + 1):
        prev, cur = snapshots[rev - 2], snapshots[rev - 1]
        ops = {
            r[RECORD_KEY]: r["op"] for r in store.diff("db", "r", rev - 1, rev).collect()
        }
        expected_ops = {}
        for k in set(prev) | set(cur):
            if k not in prev:
                expected_ops[k] = "insert"
            elif k not in cur:
                expected_ops[k] = "delete"
            elif prev[k] != cur[k]:
                expected_ops[k] = "update"
        assert ops == expected_ops, f"seed {seed} diff {rev-1}->{rev}"
