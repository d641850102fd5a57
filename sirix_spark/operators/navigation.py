"""Path navigation over nested data — the Spark re-expression of the
reference's axis system and path summary (SURVEY.md §2.9, §1.3).

The reference walks a node tree with axes (ChildAxis,
DescendantAxis:34, axis/filter/PathNameFilter) guided by a dynamic
path summary (index/path/summary/PathSummaryReader.java — a tree of
all distinct paths with per-path counts). In Spark the full schema is
known at plan time, so:
- `..field` (descendant deref, DerefDescendantExpr.java:49) expands
  STATICALLY to the union of all matching paths — the same rewrite
  the reference's JsonPathStep optimizer stage does against the path
  summary, done here against the StructType.
- the path summary itself becomes `path_summary(df)`: schema walk +
  one aggregate pass for per-path non-null/element counts.

Array hops are handled by composing explodes only along the matched
paths (never a full flatten).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType


def iter_paths(schema: StructType, prefix: str = "") -> list[tuple[str, DataType]]:
    """All (dotted path, type) pairs; '[]' marks an array hop."""
    out: list[tuple[str, DataType]] = []
    for f in schema.fields:
        p = f"{prefix}.{f.name}" if prefix else f.name
        out.append((p, f.dataType))
        t = f.dataType
        # unwrap nested arrays
        suffix = ""
        while isinstance(t, ArrayType):
            suffix += "[]"
            t = t.elementType
        if suffix:
            out.append((p + suffix, t))
        if isinstance(t, StructType):
            out.extend(iter_paths(t, p + suffix))
    return out


def descendant_paths(schema: StructType, name: str) -> list[str]:
    """All paths whose final step is `name` — the `..name` expansion
    set (ordered by schema position = document order)."""
    return [
        p
        for p, _ in iter_paths(schema)
        if not p.endswith("[]") and (p == name or p.endswith("." + name))
    ]


def _build_path(col: Column, rest: list[str]) -> Column:
    if not rest:
        return col
    head, *tail = rest
    if head == "[]":
        return F.transform(col, lambda x: _build_path(x, list(tail))) if tail else col
    return _build_path(col.getField(head), tail)


def path_to_column_from(root: Column, path: str) -> Column:
    """Dotted path with '[]' hops rooted at an existing column —
    array hops become nested `transform`s, so a path with k array
    hops yields a k-deep array of the leaf values."""
    return _build_path(root, path.replace("[]", ".[]").split("."))


def _path_to_column(path: str) -> Column:
    """Same, rooted at a top-level dataframe column."""
    steps = path.replace("[]", ".[]").split(".")
    head, *tail = steps
    return _build_path(F.col(head), tail)


def select_descendant(df: DataFrame, name: str) -> DataFrame:
    """`$doc..name` → one column per matching path (missing-free:
    only schema-present paths exist, exactly like the reference's
    path-summary-guided rewrite)."""
    paths = descendant_paths(df.schema, name)
    if not paths:
        raise KeyError(f"no path ends in {name!r}")
    return df.select(
        *[_path_to_column(p).alias(p.replace("[]", "_arr")) for p in paths]
    )


def descendant_values(df: DataFrame, name: str) -> DataFrame:
    """`$doc..name` as ONE flattened value sequence (document order
    within each record): arrays along the way are exploded; output
    column `value` is STRING — the JSONiq sequence is heterogeneous
    (a `..url` can hit both string leaves and an object field named
    `url`), so non-scalar hits are JSON-serialized."""
    types = {p: t for p, t in iter_paths(df.schema)}
    paths = descendant_paths(df.schema, name)
    if not paths:
        raise KeyError(f"no path ends in {name!r}")

    stringify = _stringify

    parts = []
    for p in paths:
        depth = p.count("[]")
        leaf_t = types[p]
        if depth:
            flat = _path_to_column(p)
            for _ in range(depth - 1):
                flat = F.flatten(flat)
            elem = F.explode_outer(flat).alias("_v")
            parts.append(
                df.select(elem).select(stringify(F.col("_v"), leaf_t).alias("value"))
            )
        else:
            parts.append(df.select(stringify(_path_to_column(p), leaf_t).alias("value")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _stringify(col: Column, t: DataType) -> Column:
    if isinstance(t, (StructType, ArrayType)):
        return F.to_json(col)
    return col.cast("string")


def level_order(df: DataFrame, key: str, max_level: int | None = None) -> DataFrame:
    """JSON-side breadth-first node enumeration (LevelOrder.java —
    round-1 gap: implemented for XML nodes only). Emits one row per
    (record, schema path) as (key, level, path, value) in
    breadth-first path order; `level` is the step depth (array hop =
    one level, like the reference's node tree).

    Scale: the path set is STATIC (schema-derived, same as the
    reference's path summary), so this is one map-only projection +
    stack — no shuffle, no per-level passes."""
    paths = [
        (p, t) for p, t in iter_paths(df.schema)
        if p != key and not p.endswith("[]")
    ]
    levels = [(p, t, p.count(".") + p.count("[]") + 1) for p, t in paths]
    levels.sort(key=lambda x: (x[2], x[0]))
    if max_level is not None:
        levels = [x for x in levels if x[2] <= max_level]
    # stack(n, lvl1, path1, val1, ...) → rows in breadth-first order
    cols: list[Column] = []
    for p, t, lvl in levels:
        cols += [F.lit(lvl), F.lit(p), _stringify(_path_to_column(p), t)]
    stacked = F.stack(F.lit(len(levels)), *cols).alias("level", "path", "value")
    return df.select(F.col(key), stacked)


def parent_path(path: str) -> str | None:
    """Parent of a dotted/[]-hopped path; None at the root."""
    if path.endswith("[]"):
        return path[:-2]
    if "." in path:
        return path.rsplit(".", 1)[0]
    return None


def select_parent(df: DataFrame, path: str, key: str) -> DataFrame:
    """`sdb:select-parent` on nested JSON (SelectParent.java — round-1
    gap: XML-only before). Returns (key, parent) where parent is the
    containing object/array of `path` (JSON-serialized for
    heterogeneous output), or the whole record for a root field."""
    pp = parent_path(path)
    types = {p: t for p, t in iter_paths(df.schema)}
    if pp is None:
        payload = [c for c in df.columns if c != key]
        return df.select(
            F.col(key), F.to_json(F.struct(*payload)).alias("parent")
        )
    if pp not in types:
        raise KeyError(f"no such path {pp!r}")
    return df.select(
        F.col(key), _stringify(_path_to_column(pp), types[pp]).alias("parent")
    )


def path_summary(df: DataFrame) -> DataFrame:
    """The path summary as a stats table: (path, type, count) with
    counts of non-null occurrences (array paths count elements).
    One aggregate pass — no per-path scans."""
    aggs = []
    names = []
    for p, t in iter_paths(df.schema):
        dotted = p.replace("[]", "")
        safe = p.replace(".", "__").replace("[]", "_arr")
        if p.endswith("[]"):
            expr = F.sum(F.coalesce(F.size(_path_to_column(p[: -2])), F.lit(0)))
        else:
            expr = F.count(_path_to_column(p))
        aggs.append(expr.alias(safe))
        names.append((p, t.simpleString(), safe, dotted))
    row = df.agg(*aggs).collect()[0]
    data = [(p, ts, int(row[safe])) for p, ts, safe, _ in names]
    return df.sparkSession.createDataFrame(data, "path string, type string, count long")
