"""Debug: per-_share_lineage timing + plan size for one XMark query."""

from __future__ import annotations

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
    from sirix_spark.jsoniq import docmodel as dm
    from sirix_spark.store.docstore import DocumentStore
    from sirix_spark.store.xmlstore import XmlStore

    orig = dm.DocEvaluator._share_lineage
    stats = []

    def patched(self, df):
        t0 = time.time()
        jqe = df._jdf.queryExecution()
        n_analyzed = jqe.analyzed().toString().count("\n")
        t_an = time.time() - t0
        t1 = time.time()
        out = orig(self, df)
        dt = time.time() - t1
        # phase breakdown of the compile the checkpoint forced
        phases = {}
        it = jqe.tracker().phases().iterator()
        while it.hasNext():
            kv = it.next()
            ph = kv._2()
            phases[kv._1()] = (ph.endTimeMs() - ph.startTimeMs()) / 1000.0
        stats.append((dt, n_analyzed, t_an, phases))
        print(
            f"[share] lc={dt:.2f}s analyzed_lines={n_analyzed} "
            f"(tostring {t_an:.2f}s) phases={phases}",
            flush=True,
        )
        return out

    dm.DocEvaluator._share_lineage = patched

    tmp = tempfile.mkdtemp(prefix="xmarkdbg_")
    store = DocumentStore(spark, tmp)
    with open(f"{XMARK_DIR}/auction.xml") as f:
        XmlStore(store.root).store("xmark", "auction.xml", f.read())
    t0 = time.time()
    dm.DocEvaluator(spark, store).execute(query)
    print(f"{name}: {time.time() - t0:.1f}s total, {len(stats)} shares, "
          f"{sum(s[0] for s in stats):.1f}s in shares")
    return 0


if __name__ == "__main__":
    sys.exit(main())
