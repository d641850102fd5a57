"""JSON serialization with structural limits — parity with the
reference's serializer options (service/json/serialize/
JsonSerializer.java:68: maxLevel / maxChildren / maxNodes;
JsonRecordSerializer.java).

- max_level: nested structs deeper than the limit are pruned.
- max_children: arrays are sliced to the first N elements.
- max_nodes: row budget (applied as limit()).

All pure column expressions (to_json over a pruned projection) — the
serializer runs distributed, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType


def _prune(col: Column, t: DataType, level: int, max_level: int | None,
           max_children: int | None) -> Column | None:
    if isinstance(t, StructType):
        if max_level is not None and level >= max_level:
            return None
        fields = []
        for f in t.fields:
            sub = _prune(col.getField(f.name), f.dataType, level + 1, max_level, max_children)
            if sub is not None:
                fields.append(sub.alias(f.name))
        return F.struct(*fields) if fields else None
    if isinstance(t, ArrayType):
        inner = t.elementType
        out = col if max_children is None else F.slice(col, 1, max_children)
        if isinstance(inner, (StructType, ArrayType)):
            elem = _prune(F.lit(None), inner, level + 1, max_level, max_children)
            if elem is None:
                return None
            # rebuild element-wise via transform
            def tx(x):
                r = _prune(x, inner, level + 1, max_level, max_children)
                return r

            out = F.transform(out, tx)
        return out
    return col


def serialize(
    df: DataFrame,
    max_level: int | None = None,
    max_children: int | None = None,
    max_nodes: int | None = None,
) -> DataFrame:
    """Serialize each record to a JSON string column `json`
    (insertion-order field preservation comes from struct field
    order, matching the reference's serializer)."""
    cols = []
    for f in df.schema.fields:
        pruned = _prune(F.col(f.name), f.dataType, 1, max_level, max_children)
        if pruned is not None:
            cols.append(pruned.alias(f.name))
    out = df.select(F.to_json(F.struct(*cols)).alias("json"))
    if max_nodes is not None:
        out = out.limit(max_nodes)
    return out
