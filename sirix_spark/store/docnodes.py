"""JSON document shredder → node-table rows (document mode).

The reference stores arbitrary JSON documents as trees of keyed nodes
(pre-order ``nodeKey`` assignment by its shredder,
bundles/sirix-core/.../service/json/shredder/JsonShredder.java) and
answers structural queries — deref, descendant deref ``=>>``, array
unbox, CAS/path/name index scans — against that keyed tree.

Spark-first re-expression: a document shreds to a **node table**
DataFrame; every structural operator becomes a relational op on it:

- field deref        → equi-join on (container, fname)
- array unbox/index  → equi-join on container (+ ord)
- descendant ``=>>`` → pre-order interval predicate
  ``key ∈ (k, k+size)`` — same trick as the XML axis family
  (sirix_spark/sources/xml_source.py)
- CAS index scan     → value+path filter (parquet/columnar layout IS
  the index; the path column is the path-summary PCR analog)

NodeKey numbering matches the reference's non-fused shredder: keys
are assigned in pre-order; an object field contributes an OBJECT_KEY
node followed by its value node (JsonIntegrationTest.testArray pins
the numbering: second root-array object = nodeKey 11).

Single small documents shred on the driver (`shred_text`); large
*collections* of documents shred in parallel with
`shred_collection` (Arrow-batched `mapInPandas`, per-document
key-spaces — the ParallelJsonShredder.java:72 analog).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

NODE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("key", LongType(), False),
        StructField("parent", LongType(), True),
        # object | array | field | string | number | boolean | null
        StructField("kind", StringType(), False),
        # field name for `field` nodes AND for field-value nodes
        StructField("fname", StringType(), True),
        # the object/array node this value belongs to (field values →
        # the object, array members → the array); null for root/field
        StructField("container", LongType(), True),
        StructField("ord", LongType(), True),
        # positionless path-summary path: /name for fields, /[] for
        # array members (the PCR path the reference's indexes key on)
        StructField("path", StringType(), False),
        # instance path: array members carry their position (/[2])
        StructField("ipath", StringType(), False),
        # compact JSON serialization of the subtree
        StructField("json", StringType(), False),
        # subtree span: descendants have key ∈ (key, key+size)
        StructField("size", LongType(), False),
    ]
)


class JNum:
    """A JSON number carrying its serialization text — the BigDecimal-
    parity number model (reference: plain decimals round-trip exactly,
    exponent forms normalize through Java Double.toString, doubles
    that overflow fall back to exact plain expansion; zeros of any
    spelling normalize to 0)."""

    __slots__ = ("text", "num")

    def __init__(self, text: str, num):
        self.text = text
        self.num = num

    @staticmethod
    def _dec(x):
        # Exact Decimal view: Decimal(int) and Decimal(float) are
        # exact conversions, so comparisons never collapse distinct
        # out-of-double-range or >17-significant-digit values the way
        # a float() round-trip would, and hash() stays consistent
        # with numerically-equal int/float (Python's unified numeric
        # hash covers Decimal).
        import decimal

        return x if isinstance(x, decimal.Decimal) else decimal.Decimal(x)

    def __eq__(self, other):
        if isinstance(other, JNum):
            return self._dec(self.num) == self._dec(other.num)
        if isinstance(other, (int, float)):
            return self._dec(self.num) == self._dec(other)
        return NotImplemented

    def __hash__(self):
        return hash(self._dec(self.num))

    def __repr__(self):
        return f"JNum({self.text})"


def _java_double_text(v: float) -> str:
    """Java Double.toString layout from Python's shortest-round-trip
    repr: plain decimal for 1e-3 <= |v| < 1e7 (at least one digit each
    side of the point), else d.dddEn computerized scientific."""
    r = repr(v)
    neg = r.startswith("-")
    if neg:
        r = r[1:]
    if "e" in r:
        mant, exp = r.split("e")
        exp = int(exp)
    else:
        mant, exp = r, 0
    if "." in mant:
        ip, fp = mant.split(".")
    else:
        ip, fp = mant, ""
    digits = ip + fp
    lead = len(digits) - len(digits.lstrip("0"))
    sig = digits.lstrip("0").rstrip("0") or "0"
    if sig == "0":
        return "-0.0" if neg else "0.0"
    e10 = (len(ip) - 1 - lead) + exp
    if -3 <= e10 < 7:
        if e10 >= 0:
            ipart = sig[: e10 + 1].ljust(e10 + 1, "0")
            fpart = sig[e10 + 1:] or "0"
        else:
            ipart = "0"
            fpart = "0" * (-e10 - 1) + sig
        out = f"{ipart}.{fpart}"
    else:
        out = sig[0] + "." + (sig[1:] or "0") + "E" + str(e10)
    return "-" + out if neg else out


def _parse_float(lit: str):
    import math
    from decimal import Decimal

    d = Decimal(lit)
    if d == 0:
        return 0
    if "e" in lit or "E" in lit:
        f = float(lit)
        if math.isinf(f):
            # beyond double range: exact plain expansion (the
            # 2e308-round-trips-as-BigDecimal behavior)
            return JNum(format(d, "f"), d)
        return JNum(_java_double_text(f), f)
    return JNum(lit, d)


def loads_doc(text: str):
    """Parse document text with number fidelity (every number keeps a
    faithful serialization; ints are exact Python ints)."""
    return json.loads(text, parse_float=_parse_float)


def _compact(value) -> str:
    return dumps_doc(value)


def dumps_doc(value) -> str:
    """Compact serialization honoring JNum texts (json.dumps cannot
    emit raw number text)."""
    out: list[str] = []

    def emit(v) -> None:
        if isinstance(v, JNum):
            out.append(v.text)
        elif v is None or isinstance(v, (bool, int, float, str)):
            out.append(json.dumps(v, ensure_ascii=False))
        elif isinstance(v, dict):
            out.append("{")
            for i, (k, x) in enumerate(v.items()):
                if i:
                    out.append(",")
                out.append(json.dumps(str(k), ensure_ascii=False))
                out.append(":")
                emit(x)
            out.append("}")
        elif isinstance(v, list):
            out.append("[")
            for i, x in enumerate(v):
                if i:
                    out.append(",")
                emit(x)
            out.append("]")
        else:
            raise TypeError(f"not JSON-serializable: {type(v)}")

    emit(value)
    return "".join(out)


def _kind_of(value) -> str:
    if isinstance(value, dict):
        return "object"
    if isinstance(value, list):
        return "array"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float, JNum)):
        return "number"
    if value is None:
        return "null"
    return "string"


def shred_value(
    value,
    doc_id: str = "",
    start_key: int = 1,
    keys: list[int] | None = None,
) -> list[tuple]:
    """Shred a parsed JSON value into NODE_SCHEMA rows (python-side;
    the per-document unit of work `shred_collection` parallelizes).

    Path model matches the reference's path summary: **array nodes
    contribute the ``/[]`` step and members inherit the array's
    path** — so a CAS index on ``/[]/test/[]`` matches the primitive
    members of each ``test`` array, and ``sdb:path`` of a member is
    the array's instance path (ancestor members instantiate their
    position, e.g. ``/sirix/[0]/revision/foo/[]``).

    ``keys`` — explicit nodeKeys in enumeration (pre-order) order,
    one per node/field slot. This is how revision N>1 of a document
    keeps STABLE node identity across commits (the reference's
    monotonic nodeKey counter: unchanged nodes keep their key,
    inserted subtrees draw fresh keys — JsonNodeTrx insert*, node
    page persistence): the committer records the key sequence
    (store/docwtx.py) and the shredder assigns positionally instead
    of renumbering."""
    rows: list[tuple] = []
    if keys is not None:
        it = iter(keys)
        counter = None
    else:
        counter = [start_key]

    def next_key() -> int:
        if counter is None:
            return next(it)
        k = counter[0]
        counter[0] += 1
        return k

    def walk(v, parent, container, fname, ord_, pcr, inst, inst_pos) -> int:
        """Append rows for value v; return its subtree size.

        pcr      positionless path context (path-summary path)
        inst     instance path context (ancestor members carry [i])
        inst_pos like inst, but with THIS node's member position
                 instantiated — containers extend from it
        """
        key = next_key()
        kind = _kind_of(v)
        at = len(rows)
        rows.append(None)  # placeholder, patched with size below
        size = 1
        if kind == "object":
            for i, (fk, fv) in enumerate(v.items()):
                fkey = next_key()
                fat = len(rows)
                rows.append(None)
                fpcr = pcr + "/" + fk
                finst = inst_pos + "/" + fk
                fsize = 1 + walk(
                    fv, fkey, key, fk, 0, fpcr, finst, finst
                )
                rows[fat] = (
                    doc_id, fkey, key, "field", fk, None, i,
                    fpcr, finst, _compact(fv), fsize,
                )
                size += fsize
            ipath = inst_pos
        elif kind == "array":
            pcr = pcr + "/[]"
            ipath = inst_pos + "/[]"
            for i, item in enumerate(v):
                size += walk(
                    item, key, key, None, i, pcr, ipath, f"{inst_pos}/[{i}]"
                )
        else:
            # primitive: inherits the container's path (a member's
            # instance path is the array's, position NOT instantiated)
            ipath = inst
        rows[at] = (
            doc_id, key, parent, kind, fname, container, ord_,
            pcr, ipath, _compact(v), size,
        )
        return size

    walk(value, None, None, None, None, "", "", "")
    return rows


def shred_text(
    text: str, doc_id: str = "", keys: list[int] | None = None
) -> list[tuple]:
    return shred_value(loads_doc(text), doc_id=doc_id, keys=keys)


def enum_count(value) -> int:
    """Number of key slots a value consumes when shredded: one per
    node plus one per object field record."""
    if isinstance(value, dict):
        return 1 + sum(1 + enum_count(v) for v in value.values())
    if isinstance(value, list):
        return 1 + sum(enum_count(v) for v in value)
    return 1


def nodes_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, NODE_SCHEMA)


def shred_collection(docs: DataFrame, id_col: str, json_col: str) -> DataFrame:
    """Shred a DataFrame of (id, json-text) documents into one node
    table, in parallel (Arrow batches; each document's key space is
    independent, so no cross-partition coordination is needed — the
    parallel-shredder analog)."""
    import pandas as pd

    fields = [f.name for f in NODE_SCHEMA.fields]

    def shred_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, text in zip(pdf[id_col], pdf[json_col]):
                out.extend(shred_text(text, doc_id=str(doc_id)))
            yield pd.DataFrame(out, columns=fields)

    return docs.select(id_col, json_col).mapInPandas(shred_batches, NODE_SCHEMA)


def access_paths(rows: list[tuple]) -> dict[int, tuple]:
    """key → (kind, parent-container key, accessor) for python-side
    mutation of the original document object: accessor is the field
    name (str) or member index (int). Field nodes map to the same
    accessor as their value node."""
    # row layout: doc_id, key, parent, kind, fname, container, ord, ...
    out: dict[int, tuple] = {}
    by_key = {r[1]: r for r in rows}
    for r in rows:
        _, key, parent, kind, fname, container, ord_ = r[:7]
        if parent is None:
            out[key] = (kind, None, None)
        elif kind == "field":
            out[key] = (kind, parent, fname)
        elif container is not None and fname is not None:
            out[key] = (kind, container, fname)  # field value
        else:
            out[key] = (kind, container, ord_)  # array member
    return out
