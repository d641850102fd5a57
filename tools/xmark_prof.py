"""Profile one XMark query: cProfile the driver + per-job wall from
the status tracker. Usage: python tools/xmark_prof.py q09"""

from __future__ import annotations

import cProfile
import pstats
import sys
import tempfile
import time

sys.path.insert(0, ".")

XMARK_DIR = "/root/reference/bundles/sirix-query/src/test/resources/xmark"


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "q09"
    with open(f"{XMARK_DIR}/queries/fndoc/{name}.xq") as f:
        query = f.read()

    from sirix_spark.session import get_spark

    spark = get_spark()
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore
    from sirix_spark.store.xmlstore import XmlStore

    tmp = tempfile.mkdtemp(prefix="xmarkprof_")
    store = DocumentStore(spark, tmp)
    with open(f"{XMARK_DIR}/auction.xml") as f:
        XmlStore(store.root).store("xmark", "auction.xml", f.read())

    ev = DocEvaluator(spark, store)
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    ev.execute(query)
    pr.disable()
    print(f"\n{name}: {time.time() - t0:.1f}s total")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)
    return 0


if __name__ == "__main__":
    sys.exit(main())
