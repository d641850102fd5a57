"""Time individual XMark queries through the corpus replay path.

Usage::

    python tools/xmark_time.py q01 q09 q10 q19

Each query gets a fresh SparkSession + store (matching the corpus
runner's per-XMark-case isolation) and reports wall seconds plus the
byte-parity verdict against the reference golden output.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

XMARK_DIR = "/root/reference/bundles/sirix-query/src/test/resources/xmark"


def main() -> int:
    names = sys.argv[1:] or ["q01", "q09", "q10", "q19"]
    for name in names:
        with open(f"{XMARK_DIR}/queries/fndoc/{name}.xq") as f:
            query = f.read()
        with open(f"{XMARK_DIR}/results/{name}.out") as f:
            expected = f.read().strip()

        from sirix_spark.session import get_spark

        spark = get_spark()
        from sirix_spark.jsoniq.docmodel import DocEvaluator
        from sirix_spark.store.docstore import DocumentStore
        from sirix_spark.store.xmlstore import XmlStore

        tmp = tempfile.mkdtemp(prefix="xmarktime_")
        store = DocumentStore(spark, tmp)
        t0 = time.time()
        with open(f"{XMARK_DIR}/auction.xml") as f:
            XmlStore(store.root).store("xmark", "auction.xml", f.read())
        t_reg = time.time() - t0
        t0 = time.time()
        got = DocEvaluator(spark, store).execute(query)
        t_q = time.time() - t0
        ok = got.strip() == expected
        print(
            f"{name}: register {t_reg:.1f}s  query {t_q:.1f}s  "
            f"{'MATCH' if ok else 'MISMATCH'}"
        )
        if not ok:
            print("  got: " + got.strip()[:200])
            print("  exp: " + expected[:200])
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
