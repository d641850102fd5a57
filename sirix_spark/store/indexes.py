"""Secondary index layer — the Spark re-expression of the reference's
index family (SURVEY.md §2.11).

The reference builds red-black/HOT CAS, path, and name indexes plus
the covering columnar *projection index* (docs/PROJECTION_INDEXES.md,
index/projection/ProjectionIndexBuilder.java). In Spark:

- The snapshot parquet already IS a covering columnar store, so a
  projection index here = a column-pruned, SORTED materialization of
  a revision. Sorting by the hot predicate column(s) is what buys
  performance: parquet row-group min/max stats become real zone maps
  (clustered data → tight ranges → scans skip whole row groups —
  the reference's NumberZoneMapRegion effect).
- A CAS index (content-and-structure: typed value + path,
  CreateCASIndex.java) maps to the same machinery with the indexed
  column first in the sort key.
- Path/name indexes are schema lookups in Spark (columns are named
  paths) — answered by the path summary, no materialization needed.

The catalog records (revision, columns, sort) per index; `find`
routes a read to the best covering index, exactly like the
reference's FindProjectionIndex auto-routing
(docs/PROJECTION_INDEXES.md:27-55).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IndexCatalog:
    """Per-resource index metadata (analog of the reference's
    IndexDefs stored in the resource configuration)."""

    def __init__(self, res_path: str):
        self.path = os.path.join(res_path, "indexes.json")
        self.indexes: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.indexes = json.load(f)["indexes"]

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"indexes": self.indexes}, f, indent=1)
        os.replace(tmp, self.path)

    def add(self, entry: dict) -> None:
        self.indexes.append(entry)
        self.save()

    def drop(self, name: str) -> bool:
        before = len(self.indexes)
        self.indexes = [i for i in self.indexes if i["name"] != name]
        self.save()
        return len(self.indexes) < before

    def find_covering(self, columns: list[str], revision: int) -> dict | None:
        """Best covering index: all requested columns present, built
        at this revision; prefer fewest extra columns."""
        cands = [
            i
            for i in self.indexes
            if i["revision"] == revision and set(columns) <= set(i["columns"])
        ]
        if not cands:
            return None
        return min(cands, key=lambda i: len(i["columns"]))


class ProjectionIndexes:
    """Mixin-style helper bound to a VersionedStore."""

    def __init__(self, store):
        self.store = store

    def _catalog(self, db: str, res: str) -> IndexCatalog:
        return IndexCatalog(self.store._res_path(db, res))

    def create_projection_index(
        self,
        db: str,
        res: str,
        name: str,
        columns: list[str],
        sort_by: list[str] | None = None,
        revision: int | None = None,
    ) -> dict:
        """jn:create-projection-index — materialize a covering
        columnar view of `columns` (record_key always included),
        clustered by `sort_by` for zone-map pruning."""
        from sirix_spark.store.store import RECORD_KEY

        revision = revision or self.store.latest_revision(db, res)
        df = self.store.doc(db, res, revision=revision)
        cols = [RECORD_KEY] + [c for c in columns if c != RECORD_KEY]
        proj = df.select(*cols)
        if sort_by:
            # global sort → range-partitioned files, each covering a
            # narrow key range: max row-group skipping on range scans
            proj = proj.orderBy(*sort_by)
        path = os.path.join(self.store._res_path(db, res), f"idx_{name}_r{revision:06d}")
        proj.write.mode("errorifexists").parquet(path)
        entry = {
            "name": name,
            "type": "projection",
            "columns": cols,
            "sort_by": sort_by or [],
            "revision": revision,
            "path": path,
        }
        self._catalog(db, res).add(entry)
        return entry

    def create_cas_index(
        self, db: str, res: str, name: str, column: str, revision: int | None = None
    ) -> dict:
        """jn:create-cas-index — typed content index on one column:
        projection of (column, record_key) sorted by the column
        (value-ordered scan + range-scan support, ScanCASIndexRange)."""
        return self.create_projection_index(
            db, res, name, [column], sort_by=[column], revision=revision
        )

    def drop_index(self, db: str, res: str, name: str) -> bool:
        """jn:drop-*-index."""
        cat = self._catalog(db, res)
        entry = next((i for i in cat.indexes if i["name"] == name), None)
        if entry:
            import shutil

            shutil.rmtree(entry["path"], ignore_errors=True)
        return cat.drop(name)

    def find_index(self, db: str, res: str, columns: list[str], revision: int | None = None):
        revision = revision or self.store.latest_revision(db, res)
        return self._catalog(db, res).find_covering(columns, revision)

    def scan(
        self,
        db: str,
        res: str,
        columns: list[str],
        revision: int | None = None,
        predicate=None,
    ) -> DataFrame:
        """Covered read with auto-routing: serve from the smallest
        covering index if one exists, else from the snapshot
        (fail-closed fallback — the reference compiles the generic
        pipeline alongside every fast path)."""
        from sirix_spark.store.store import RECORD_KEY

        revision = revision or self.store.latest_revision(db, res)
        idx = self.find_index(db, res, columns, revision)
        if idx is not None:
            df = self.store.spark.read.parquet(idx["path"])
        else:
            df = self.store.doc(db, res, revision=revision)
        if predicate is not None:
            df = df.filter(predicate)
        keep = [RECORD_KEY] + [c for c in columns if c != RECORD_KEY]
        return df.select(*[c for c in keep if c in df.columns])
