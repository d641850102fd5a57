"""Node-level JSON serializer with the reference's options.

Parity targets (all in bundles/sirix-core):
- src/main/java/io/sirix/service/json/serialize/JsonSerializer.java
  (maxLevel / numberOfNodes / maxChildren / startNodeKey / metadata
  modes / multi-revision envelope)
- src/main/java/io/sirix/service/json/serialize/JsonRecordSerializer.java
  (top-level record pagination)
- goldens: src/test/java/io/sirix/service/json/serialize/
  JsonSerializerTest.java, JsonRecordSerializerTest.java and the
  src/test/resources/json fixtures (the *-fused variants — the
  reference runs with sirix.json.fuseNamedPrimitives=true).

The serializer walks the FUSED node view the reference persists:
every object field collapses with its value into one
OBJECT_NAMED_<TYPE> record (primitive fields carry the value
inline; container fields adopt the container's children), so fused
nodeKeys are sequential pre-order over that view. The node-budget
option (numberOfNodes), however, counts UNFUSED visits — a fused
OBJECT_NAMED_* consumes 2 budget units (key record + value record),
everything else 1 — which reproduces JsonSerializerTest's
maxLevel+numberOfNodes tables exactly.

Serializing one resource to ONE string is an inherently driver-side
boundary (same adjudication as the REST serializer); documents at
this surface are single-resource sized, not corpus-sized.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class FusedNode:
    key: int  # fused pre-order nodeKey
    type: str  # OBJECT | ARRAY | *_VALUE | OBJECT_NAMED_*
    name: str | None  # field name for OBJECT_NAMED_*
    text: str | None  # primitive literal (compact JSON text)
    cost: int  # unfused node count (budget units)
    children: list = field(default_factory=list)
    desc: int = 0  # fused descendant count

    @property
    def container(self) -> bool:
        return self.type in (
            "OBJECT", "ARRAY", "OBJECT_NAMED_OBJECT", "OBJECT_NAMED_ARRAY"
        )

    @property
    def arraylike(self) -> bool:
        return self.type in ("ARRAY", "OBJECT_NAMED_ARRAY")


_PRIM = {
    "string": "STRING",
    "number": "NUMBER",
    "boolean": "BOOLEAN",
    "null": "NULL",
}


def build_fused(rows: list) -> FusedNode:
    """rows: the doc-store node rows (docnodes.NODE_SCHEMA order:
    doc_id, key, parent, kind, fname, container, ord, path, ipath,
    json, size, ...). Returns the fused-view root."""
    by_key = {r[1]: r for r in rows}
    kids: dict[int, list[int]] = {}
    for r in rows:
        if r[2] is not None:
            kids.setdefault(r[2], []).append(r[1])
    for v in kids.values():
        v.sort()

    def conv(key: int) -> FusedNode:
        r = by_key[key]
        kind = r[3]
        if kind == "field":
            vkey = kids[key][0]
            vr = by_key[vkey]
            vkind = vr[3]
            if vkind in _PRIM:
                return FusedNode(0, f"OBJECT_NAMED_{_PRIM[vkind]}", r[4],
                                 vr[9], 2)
            t = "OBJECT_NAMED_OBJECT" if vkind == "object" else "OBJECT_NAMED_ARRAY"
            n = FusedNode(0, t, r[4], None, 2)
            n.children = [conv(k) for k in kids.get(vkey, [])]
            return n
        if kind in ("object", "array"):
            n = FusedNode(0, "OBJECT" if kind == "object" else "ARRAY",
                          None, None, 1)
            n.children = [conv(k) for k in kids.get(key, [])]
            return n
        return FusedNode(0, f"{_PRIM[kind]}_VALUE", None, r[9], 1)

    root = conv(rows[0][1])

    def number(n: FusedNode, nxt: int) -> int:
        n.key = nxt
        nxt += 1
        for c in n.children:
            nxt = number(c, nxt)
        n.desc = sum(1 + c.desc for c in n.children)
        return nxt

    number(root, 1)
    return root


def find_node(root: FusedNode, key: int) -> FusedNode | None:
    if root.key == key:
        return root
    for c in root.children:
        got = find_node(c, key)
        if got is not None:
            return got
    return None


class _Budget:
    def __init__(self, limit: int | None):
        self.limit = limit
        self.spent = 0
        self.stopped = False

    def take(self, cost: int) -> bool:
        if self.stopped:
            return False
        if self.limit is not None and self.spent + cost > self.limit:
            self.stopped = True
            return False
        self.spent += cost
        return True


def _emit_value(n: FusedNode, level: int, max_level: int | None,
                max_children: int | None, budget: _Budget,
                named: bool) -> str | None:
    """Compact value-mode text for one fused node, or None when the
    budget stopped before this node."""
    if not budget.take(n.cost):
        return None
    prefix = json.dumps(n.name) + ":" if named and n.name is not None else ""
    if not n.container:
        return prefix + (n.text if n.text is not None else "null")
    kids = n.children
    if max_children is not None:
        kids = kids[:max_children]
    parts: list[str] = []
    if max_level is None or level < max_level:
        for c in kids:
            frag = _emit_value(
                c, level + 1, max_level, max_children, budget,
                named=n.type in ("OBJECT", "OBJECT_NAMED_OBJECT"),
            )
            if frag is None:
                break
            parts.append(frag)
    body = ",".join(parts)
    return prefix + (
        "[" + body + "]" if n.arraylike else "{" + body + "}"
    )


_HASH = "0000000000000000"


def _meta_dict(n: FusedNode, meta: str) -> dict:
    if meta == "nodekey":
        return {"nodeKey": n.key}
    if meta == "nodekey-childcount":
        md: dict = {"nodeKey": n.key}
        if n.container:
            md["childCount"] = len(n.children)
        return md
    md = {"nodeKey": n.key, "hash": _HASH, "type": n.type}
    if n.container:
        md["descendantCount"] = n.desc
        md["childCount"] = len(n.children)
    return md


def _emit_meta(n: FusedNode, level: int, max_level: int | None,
               max_children: int | None, budget: _Budget, meta: str):
    """Metadata-mode node object ({"key"?, "metadata", "value"}), or
    None when the budget stopped before this node."""
    if not budget.take(n.cost):
        return None
    out: dict = {}
    if n.name is not None:
        out["key"] = n.name
    out["metadata"] = _meta_dict(n, meta)
    if not n.container:
        out["value"] = json.loads(n.text) if n.text is not None else None
        return out
    entries = []
    if max_level is None or level < max_level:
        kids = n.children
        if max_children is not None:
            kids = kids[:max_children]
        for c in kids:
            e = _emit_meta(c, level + 1, max_level, max_children, budget, meta)
            if e is None:
                break
            entries.append(e)
    if entries:
        out["value"] = entries
    else:
        # pruned/empty containers: {} for objects, [] for arrays
        out["value"] = [] if n.arraylike else {}
    return out


def serialize_resource(
    rows: list,
    *,
    max_level: int | None = None,
    max_nodes: int | None = None,
    max_children: int | None = None,
    start_node_key: int | None = None,
    meta: str | None = None,  # None | full | nodekey | nodekey-childcount
) -> str:
    """One revision's serialization (JsonSerializer.Builder options)."""
    root = build_fused(rows)
    start = root
    if start_node_key is not None:
        start = find_node(root, start_node_key)
        if start is None:
            raise ValueError(f"startNodeKey {start_node_key} not found")
    budget = _Budget(max_nodes)
    if meta is None:
        frag = _emit_value(
            start, 1, max_level, max_children, budget,
            named=start.name is not None,
        )
        if frag is None:
            frag = ""
        if start.name is not None and not frag.startswith("{"):
            # a named start node serializes as the bare record
            frag = "{" + frag + "}"
        return frag
    obj = _emit_meta(start, 1, max_level, max_children, budget, meta)
    return json.dumps(obj, separators=(",", ":")) if obj is not None else ""


def serialize_revisions(revision_rows: list[tuple[int, list]]) -> str:
    """Multi-revision envelope (JsonSerializer with startRevision/
    endRevision — multiple-revisions.json):
    {"sirix":[{"revisionNumber":N,"revision":<doc>}, ...]}"""
    parts = []
    for rev, rows in revision_rows:
        body = serialize_resource(rows)
        parts.append(
            '{"revisionNumber":%d,"revision":%s}' % (rev, body)
        )
    return '{"sirix":[' + ",".join(parts) + "]}"


def serialize_records(
    rows: list,
    number_of_records: int,
    *,
    start_node_key: int | None = None,
    max_level: int | None = None,
    meta: str | None = None,
) -> str:
    """JsonRecordSerializer: the first N top-level records (array
    members / object fields) of the root container. Records sit at
    level 1, so maxLevel=1 prunes their children (the reference's
    serializeObjectWithMaxLevel golden).

    With startNodeKey the serializer runs in PAGINATION mode: the
    records emitted are the right SIBLINGS of that top-level node
    (exclusive), wrapped in {"value":[...]} — object records each as
    their own {name: value} object (serializeObjectWithPagination);
    metadata modes wrap in the parent's metadata envelope instead."""
    root = build_fused(rows)
    kids = root.children
    paginate = start_node_key is not None
    if paginate:
        idx = next(
            (i for i, c in enumerate(kids) if c.key == start_node_key), None
        )
        if idx is None:
            raise ValueError(
                f"startNodeKey {start_node_key} is not a top-level record"
            )
        kids = kids[idx + 1:]
    kids = kids[:number_of_records]
    budget = _Budget(None)
    obj_root = root.type in ("OBJECT", "OBJECT_NAMED_OBJECT")
    if meta is None:
        frags = [
            _emit_value(c, 1, max_level, None, budget, named=obj_root)
            for c in kids
        ]
        if paginate:
            recs = ",".join(
                ("{" + f + "}") if obj_root else f for f in frags
            )
            return '{"value":[' + recs + "]}"
        body = ",".join(frags)
        return "{" + body + "}" if obj_root else "[" + body + "]"
    entries = [
        _emit_meta(c, 1, max_level, None, budget, meta) for c in kids
    ]
    out = {"metadata": _meta_dict(root, meta), "value": entries}
    return json.dumps(out, separators=(",", ":"))
