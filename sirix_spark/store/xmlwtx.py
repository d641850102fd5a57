"""Keyed write transactions over versioned XML resources — the
XmlNodeTrx analog (reference: bundles/sirix-core/src/main/java/io/
sirix/access/trx/node/xml/XmlNodeTrxImpl.java —
insertElementAsFirstChild/AsRightSibling, insertTextAsFirstChild/
AsRightSibling, insertAttribute, setValue, setName, remove, commit,
rollback; cursor moves moveTo/moveToDocumentRoot/moveToFirstChild/
moveToLastChild/moveToParent/moveToAttribute).

Mirrors store/docwtx.py's design for the JSON side: the document is
a keyed tree; unchanged nodes keep their nodeKeys across commits,
inserts draw fresh keys from the resource's monotonic counter
(XmlStore manifest ``next_key``) in pre-order — the reference's
key-allocation discipline, which is what makes temporal identity
(node history across revisions, sdb:nodekey stability) meaningful.

Key enumeration order matches the shredder (_shred_one): element
key, then its attribute keys in document order, then children
(elements/text/comments) recursively. The document node is always
key 0 (Fixed.DOCUMENT_NODE_KEY) and is not stored in the sidecar.

Driver-side by design: this is the transactional coordinator surface
(single-document mutations); reads of committed revisions stay Spark
DataFrame plans over the shredded node tables.

Tree shape:
- element: {"key", "kind": "ELEMENT", "name",
            "attrs": [[akey, name, value]...], "children": [node...]}
- text:    {"key", "kind": "TEXT", "value"}
- comment: {"key", "kind": "COMMENT", "value"}
"""

from __future__ import annotations

from sirix_spark.store.xmlstore import XmlStore, XmlStoreError

DOCUMENT_KEY = 0


def _esc(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        # canonical-XML attribute escapes: literal whitespace would be
        # normalized to spaces on re-parse (attribute-value
        # normalization), so the round trip needs character references
        s = (
            s.replace('"', "&quot;")
            .replace("\t", "&#9;")
            .replace("\n", "&#10;")
            .replace("\r", "&#13;")
        )
    return s


def tree_from_rows(rows: list[dict], keys: list[int] | None):
    """Build the keyed tree from shredder rows (enumeration order ==
    row order; row i>0 takes keys[i-1], or i itself in the legacy
    no-sidecar layout)."""
    key_of = (lambda i: keys[i - 1]) if keys is not None else (lambda i: i)
    nodes: dict[int, dict] = {}
    root = None
    for r in rows:
        i = r["node_key"]
        if r["kind"] == "XML_DOCUMENT":
            continue
        k = key_of(i)
        parent = nodes.get(r["parent_key"])
        if r["kind"] == "ELEMENT":
            n = {"key": k, "kind": "ELEMENT", "name": r["name"], "attrs": [], "children": []}
            nodes[i] = n
            if parent is None:
                root = n
            else:
                parent["children"].append(n)
        elif r["kind"] == "ATTRIBUTE":
            parent["attrs"].append([k, r["name"], r["value"]])
        else:  # TEXT / COMMENT / PI
            kind = "TEXT" if r["kind"] == "TEXT" else r["kind"]
            n = {"key": k, "kind": kind, "value": r["value"]}
            nodes[i] = n
            if parent is not None:
                parent["children"].append(n)
    return root


def tree_keys(node: dict) -> list[int]:
    """Pre-order enumeration (shredder order), document node excluded."""
    out = [node["key"]]
    if node["kind"] == "ELEMENT":
        for akey, _, _ in node["attrs"]:
            out.append(akey)
        for child in node["children"]:
            out.extend(tree_keys(child))
    return out


def serialize_tree(node: dict) -> str:
    if node["kind"] == "TEXT":
        return _esc(node["value"])
    if node["kind"] == "COMMENT":
        return f"<!--{node['value']}-->"
    if node["kind"] == "PROCESSING_INSTRUCTION":
        return f"<?{node['value']}?>"
    attrs = "".join(
        f' {name}="{_esc(value, attr=True)}"' for _, name, value in node["attrs"]
    )
    inner = "".join(serialize_tree(c) for c in node["children"])
    if not inner:
        return f"<{node['name']}{attrs}/>"
    return f"<{node['name']}{attrs}>{inner}</{node['name']}>"


def find_node(root: dict, key: int):
    """(node, parent, slot): slot ("child", i) for children,
    ("attr", i) for attributes (node = owning ELEMENT in that case).
    Root → (root, None, None). (None, None, None) if absent."""
    if root["key"] == key:
        return root, None, None
    stack = [root]
    while stack:
        n = stack.pop()
        if n["kind"] != "ELEMENT":
            continue
        for i, (akey, _, _) in enumerate(n["attrs"]):
            if akey == key:
                return n, n, ("attr", i)
        for i, child in enumerate(n["children"]):
            if child["key"] == key:
                return child, n, ("child", i)
            stack.append(child)
    return None, None, None


class XmlWtx:
    """One open write transaction on (db, res). Cursor semantics
    follow the reference trx: inserts position the cursor on the
    inserted node; insertAttribute positions on the ATTRIBUTE (the
    reference's tests chain .moveToParent() after it)."""

    def __init__(
        self,
        store: XmlStore | str,
        db: str,
        res: str,
        revision: int | None = None,
    ):
        """revision selects the BASE tree the transaction edits
        (default: latest); commit always appends as the next revision
        after head — the reference's bound-to-older-revision update
        semantics (xml:doc(db, res, r) + XQuery Update)."""
        self.store = store if isinstance(store, XmlStore) else XmlStore(store)
        self.db = db
        self.res = res
        if self.store.exists(db, res):
            rev = self.store.latest_revision(db, res)
            if revision is not None:
                if not 1 <= revision <= rev:
                    raise XmlStoreError(
                        f"{db}/{res} has no revision {revision} "
                        f"(latest is {rev})"
                    )
                rev = revision
            rows = self.store.nodes_rows(db, res, rev)
            keys = self.store.read_keys(db, res, rev)
            self.root: dict | None = tree_from_rows(rows, keys)
            self._next = self.store.next_key(db, res)
        else:
            self.root = None
            self._next = 1
        self.cursor: int = DOCUMENT_KEY

    # ------------------------------------------------------------- keys
    def _fresh(self) -> int:
        k = self._next
        self._next += 1
        return k

    # ------------------------------------------------------------ moves
    def move_to_document_root(self) -> "XmlWtx":
        self.cursor = DOCUMENT_KEY
        return self

    def move_to(self, key: int) -> "XmlWtx":
        if key == DOCUMENT_KEY:
            self.cursor = key
            return self
        node, _, _ = find_node(self.root, key) if self.root else (None, None, None)
        if node is None:
            raise XmlStoreError(f"no node {key} in {self.db}/{self.res}")
        self.cursor = key
        return self

    def _cursor_node(self):
        if self.cursor == DOCUMENT_KEY:
            return None, None, None  # document node
        node, parent, slot = find_node(self.root, self.cursor)
        if node is None:
            raise XmlStoreError(f"cursor {self.cursor} is gone")
        return node, parent, slot

    def _cursor_element(self) -> dict:
        if self.cursor == DOCUMENT_KEY:
            raise XmlStoreError("cursor is on the document node")
        node, _, slot = self._cursor_node()
        if slot is not None and slot[0] == "attr":
            raise XmlStoreError("cursor is on an attribute")
        if node["kind"] != "ELEMENT":
            raise XmlStoreError("cursor is not an element")
        return node

    def move_to_first_child(self) -> "XmlWtx":
        if self.cursor == DOCUMENT_KEY:
            if self.root is None:
                raise XmlStoreError("empty document")
            self.cursor = self.root["key"]
            return self
        el = self._cursor_element()
        if not el["children"]:
            raise XmlStoreError("no children")
        self.cursor = el["children"][0]["key"]
        return self

    def move_to_last_child(self) -> "XmlWtx":
        if self.cursor == DOCUMENT_KEY:
            if self.root is None:
                raise XmlStoreError("empty document")
            self.cursor = self.root["key"]
            return self
        el = self._cursor_element()
        if not el["children"]:
            raise XmlStoreError("no children")
        self.cursor = el["children"][-1]["key"]
        return self

    def move_to_parent(self) -> "XmlWtx":
        node, parent, slot = self._cursor_node()
        if slot is not None and slot[0] == "attr":
            self.cursor = node["key"]  # node IS the owning element
            return self
        self.cursor = parent["key"] if parent is not None else DOCUMENT_KEY
        return self

    def move_to_attribute(self, i: int) -> "XmlWtx":
        el = self._cursor_element()
        if i >= len(el["attrs"]):
            raise XmlStoreError(f"no attribute {i}")
        self.cursor = el["attrs"][i][0]
        return self

    # ---------------------------------------------------------- inserts
    def insert_element_as_first_child(self, name: str) -> "XmlWtx":
        n = {"key": self._fresh(), "kind": "ELEMENT", "name": name,
             "attrs": [], "children": []}
        if self.cursor == DOCUMENT_KEY:
            if self.root is not None:
                raise XmlStoreError("document already has a root element")
            self.root = n
        else:
            self._cursor_element()["children"].insert(0, n)
        self.cursor = n["key"]
        return self

    def insert_element_as_right_sibling(self, name: str) -> "XmlWtx":
        node, parent, slot = self._cursor_node()
        if parent is None or slot[0] != "child":
            raise XmlStoreError("right-sibling insert needs a child node")
        n = {"key": self._fresh(), "kind": "ELEMENT", "name": name,
             "attrs": [], "children": []}
        parent["children"].insert(slot[1] + 1, n)
        self.cursor = n["key"]
        return self

    def insert_text_as_first_child(self, value: str) -> "XmlWtx":
        el = self._cursor_element()
        n = {"key": self._fresh(), "kind": "TEXT", "value": value}
        el["children"].insert(0, n)
        self.cursor = n["key"]
        return self

    def insert_text_as_right_sibling(self, value: str) -> "XmlWtx":
        node, parent, slot = self._cursor_node()
        if parent is None or slot[0] != "child":
            raise XmlStoreError("right-sibling insert needs a child node")
        n = {"key": self._fresh(), "kind": "TEXT", "value": value}
        parent["children"].insert(slot[1] + 1, n)
        self.cursor = n["key"]
        return self

    def insert_attribute(self, name: str, value: str) -> "XmlWtx":
        el = self._cursor_element()
        if any(name == a[1] for a in el["attrs"]):
            raise XmlStoreError(f"duplicate attribute {name!r}")
        akey = self._fresh()
        el["attrs"].append([akey, name, value])
        self.cursor = akey
        return self

    # ------------------------------------------- fragment grafts
    # (the xml:diff apply path — store/xmldiff.py — inserts whole
    # serialized fragments; fresh keys are drawn in pre-order)
    def _fragment_tree(self, frag: str) -> dict:
        frag = frag.strip()
        if frag.startswith('"') and frag.endswith('"'):
            from sirix_spark.store.xmldiff import _unesc

            return {
                "key": self._fresh(),
                "kind": "TEXT",
                "value": _unesc(frag[1:-1]),
            }
        # bare COMMENT/PI fragments are not well-formed documents, so
        # the shredder can't parse them — build the node directly
        if frag.startswith("<!--") and frag.endswith("-->"):
            return {
                "key": self._fresh(),
                "kind": "COMMENT",
                "value": frag[4:-3],
            }
        if frag.startswith("<?") and frag.endswith("?>"):
            return {
                "key": self._fresh(),
                "kind": "PROCESSING_INSTRUCTION",
                "value": frag[2:-2],
            }
        from sirix_spark.sources.xml_source import _shred_one

        t = tree_from_rows(_shred_one("f", frag), None)
        self._renumber(t)
        return t

    def _renumber(self, node: dict) -> None:
        node["key"] = self._fresh()
        if node["kind"] == "ELEMENT":
            for a in node["attrs"]:
                a[0] = self._fresh()
            for c in node["children"]:
                self._renumber(c)

    def insert_fragment_as_first_child(self, frag: str) -> "XmlWtx":
        t = self._fragment_tree(frag)
        self._cursor_element()["children"].insert(0, t)
        self.cursor = t["key"]
        return self

    def insert_fragment_before(self, anchor: int, frag: str) -> "XmlWtx":
        node, parent, slot = find_node(self.root, anchor)
        if node is None or parent is None or slot[0] != "child":
            raise XmlStoreError(f"no child node {anchor} to anchor on")
        t = self._fragment_tree(frag)
        parent["children"].insert(slot[1], t)
        self.cursor = t["key"]
        return self

    def insert_fragment_as_last_child(self, parent_key: int, frag: str) -> "XmlWtx":
        self.move_to(parent_key)
        el = self._cursor_element()
        t = self._fragment_tree(frag)
        el["children"].append(t)
        self.cursor = t["key"]
        return self

    # --------------------------------------------------------- mutation
    def set_value(self, value: str) -> "XmlWtx":
        node, _, slot = self._cursor_node()
        if slot is not None and slot[0] == "attr":
            node["attrs"][slot[1]][2] = value
            return self
        if node is None or node["kind"] != "TEXT":
            raise XmlStoreError("setValue needs a text or attribute node")
        node["value"] = value
        return self

    def set_name(self, name: str) -> "XmlWtx":
        node, _, slot = self._cursor_node()
        if slot is not None and slot[0] == "attr":
            node["attrs"][slot[1]][1] = name
            return self
        if node is None or node["kind"] != "ELEMENT":
            raise XmlStoreError("setName needs an element or attribute")
        node["name"] = name
        return self

    def remove(self) -> "XmlWtx":
        node, parent, slot = self._cursor_node()
        if slot is not None and slot[0] == "attr":
            node["attrs"].pop(slot[1])
            self.cursor = node["key"]
            return self
        if parent is None:
            if node is None:
                raise XmlStoreError("cannot remove the document node")
            self.root = None
            self.cursor = DOCUMENT_KEY
            return self
        parent["children"].pop(slot[1])
        self.cursor = parent["key"]
        return self

    # ----------------------------------------------------------- commit
    def commit(self) -> int:
        if self.root is None:
            raise XmlStoreError("nothing to commit")
        xml = serialize_tree(self.root)
        keys = tree_keys(self.root)
        if not self.store.exists(self.db, self.res):
            return self.store.store(self.db, self.res, xml, keys=keys)
        return self.store.commit(self.db, self.res, xml, keys=keys)

    def rollback(self) -> "XmlWtx":
        self.__init__(self.store, self.db, self.res)
        return self
