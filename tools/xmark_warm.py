"""Warm steady-state XMark ledger: ALL 20 queries in ONE session.

Round-9 verdict ask #5: the per-query ledger (fresh store + fresh
JVM per query, tools/xmark_time.py) bills ~5-10 s of JVM/codegen
warmup to every query — a constant that amortizes at scale. This
runner stores auction.xml once, runs one UNTIMED warmup pass over
all 20 queries (JIT + page cache), then times a steady-state pass,
asserting byte parity against the reference goldens
(bundles/sirix-query/src/test/resources/xmark/results) throughout.

Usage::

    python tools/xmark_warm.py            # q01..q20
    python tools/xmark_warm.py q01 q07    # subset
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

XMARK_DIR = "/root/reference/bundles/sirix-query/src/test/resources/xmark"


def main() -> int:
    names = sys.argv[1:] or [f"q{i:02d}" for i in range(1, 21)]
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.session import get_spark
    from sirix_spark.store.docstore import DocumentStore
    from sirix_spark.store.xmlstore import XmlStore

    spark = get_spark("xmark-warm")
    tmp = tempfile.mkdtemp(prefix="xmarkwarm_")
    store = DocumentStore(spark, tmp)
    t0 = time.time()
    with open(f"{XMARK_DIR}/auction.xml") as f:
        XmlStore(store.root).store("xmark", "auction.xml", f.read())
    print(f"store: {time.time() - t0:.1f}s")

    cases = []
    for name in names:
        with open(f"{XMARK_DIR}/queries/fndoc/{name}.xq") as f:
            query = f.read()
        with open(f"{XMARK_DIR}/results/{name}.out") as f:
            expected = f.read().strip()
        cases.append((name, query, expected))

    mismatches = []
    for label, timed in (("warmup", False), ("steady", True)):
        total = 0.0
        for name, query, expected in cases:
            t0 = time.time()
            got = DocEvaluator(spark, store).execute(query)
            dt = time.time() - t0
            total += dt
            ok = got.strip() == expected
            if not ok:
                mismatches.append(name)
            if timed:
                print(f"{name}: {dt:6.2f}s  {'MATCH' if ok else 'MISMATCH'}",
                      flush=True)
        print(f"{label} total: {total:.1f}s", flush=True)
    if mismatches:
        print("MISMATCHES:", sorted(set(mismatches)))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
