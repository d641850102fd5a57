"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def canon(v):
    """Canonicalize a cell for hashing (mirror driver tolerance)."""
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    """Order-insensitive: sort columns by name, hash sorted row reprs."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as entrymod

    if plain:
        # Driver-replica mode: a DEFAULT SparkSession (no UTC pin, no
        # sirix conf) — queries must be environment-independent on it
        # (run this under TZ=America/New_York to prove it).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-plain")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from sirix_spark import get_spark

        spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(srows)} rows (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            # Arrow fetch path: the driver fetches via Arrow, where
            # DuckDB HUGEINT/DECIMAL surface as Decimal (canon '4.0'
            # vs int '4') — hash this path too so type instability in
            # an oracle fails HERE, not on the driver (round-1 lesson).
            atbl = con.execute(oracles[name]).arrow()
            arows = [
                tuple(col[i].as_py() for col in atbl.columns)
                for i in range(atbl.num_rows)
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"value-hash {sh} vs {dh}")
            ah = value_hash(dcols, arows)
            if sh != ah:
                problems.append(f"arrow-fetch value-hash {sh} vs {ah}")
                drows = arows  # make the diff sample show the arrow view
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            # show a small diff sample
            sset = {"|".join(canon(v) for v in r) for r in srows}
            dset = {"|".join(canon(v) for v in r) for r in drows}
            for x in list(sset - dset)[:3]:
                print(f"   spark-only: {x[:200]}")
            for x in list(dset - sset)[:3]:
                print(f"   duck-only:  {x[:200]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")

    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
