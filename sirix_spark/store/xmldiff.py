"""xml:diff — emit an XQuery Update script that transforms revision
r1 into revision r2 (reference: bundles/sirix-query/src/main/java/io/
sirix/query/function/xml/diff/Diff.java; the invariant its DiffTest
checks is the round trip: run the emitted script against r1 and the
result equals r2).

The reference reconstructs node correspondence with its FMSE diff
walk; here the per-revision key sidecars (store/xmlwtx.py) make
correspondence EXACT — a node key present in both revisions is the
same node — so the diff is set arithmetic over keyed trees:

- keys only in r2 (top-most)            → insert statements
- keys only in r1 (top-most)            → delete statements
- same key, changed text/attr value    → replace value of node
- same key, changed element/attr name  → rename node

Statement wording matches Diff.java: ``insert nodes <subtree/>
before sdb:select-item($doc, K)`` anchored on the first FOLLOWING
sibling that exists in r1, ``as first into`` the parent for front
runs (emitted in reverse so sequential application lands in document
order), ``into`` (append) for trailing runs — plus the attribute
``insert node attribute n { "v" } into`` form.

``apply_xml_diff`` executes exactly this emitted statement grammar
through the keyed write transaction, which is what closes the
DiffTest round trip.
"""

from __future__ import annotations

import re

from sirix_spark.store.xmlstore import XmlStore, XmlStoreError
from sirix_spark.store.xmlwtx import (
    XmlWtx,
    find_node,
    serialize_tree,
    tree_from_rows,
)


def _index(node, parent_key, out):
    out[node["key"]] = (node, parent_key)
    if node["kind"] == "ELEMENT":
        for akey, name, value in node["attrs"]:
            out[akey] = ({"key": akey, "kind": "ATTRIBUTE", "name": name,
                          "value": value}, node["key"])
        for child in node["children"]:
            _index(child, node["key"], out)


def _esc_str(s: str) -> str:
    # \n/\r must not reach the script body raw: apply_xml_diff splits
    # statements on newlines (the expat shredder keeps whitespace text
    # nodes, so newline values are routine)
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _match_trees(old: dict, new: dict) -> tuple[dict, dict]:
    """FMSE-style structural correspondence (reference:
    diff/algorithm/fmse/FMSE.java): recursive LCS alignment over
    child signatures (kind + element name). Returns
    (id(new node) -> old key, id(new element) -> {attr name -> old
    attr key}) — the same matcher fmse_import uses."""
    from difflib import SequenceMatcher

    matches: dict[int, int] = {}
    attr_matches: dict[int, dict[str, int]] = {}

    def sig(n: dict):
        return (n["kind"], n.get("name"))

    def match(o: dict, n: dict):
        matches[id(n)] = o["key"]
        if n["kind"] != "ELEMENT":
            return
        attr_matches[id(n)] = {a[1]: a[0] for a in o["attrs"]}
        sm = SequenceMatcher(
            a=[sig(c) for c in o["children"]],
            b=[sig(c) for c in n["children"]],
            autojunk=False,
        )
        for blk in sm.get_matching_blocks():
            for k in range(blk.size):
                match(o["children"][blk.a + k], n["children"][blk.b + k])

    if old is not None and new is not None and sig(old) == sig(new):
        match(old, new)
    return matches, attr_matches


def _max_key(node: dict) -> int:
    high = node["key"]
    if node["kind"] == "ELEMENT":
        for a in node["attrs"]:
            high = max(high, a[0])
        for c in node["children"]:
            high = max(high, _max_key(c))
    return high


def _structural_rekey(t1: dict, t2: dict) -> None:
    """Sidecar-less fallback (round-4 verdict #7): without per-
    revision key sidecars both trees carry independent shredder
    numberings, so key set arithmetic is meaningless. Re-key t2 from
    the FMSE structural matcher — matched nodes take t1's keys,
    unmatched ones draw fresh keys above both trees — after which the
    keyed diff applies unchanged."""
    matches, attr_matches = _match_trees(t1, t2)
    counter = [max(_max_key(t1), _max_key(t2)) + 1]

    def assign(n: dict):
        if id(n) in matches:
            n["key"] = matches[id(n)]
        else:
            n["key"] = counter[0]
            counter[0] += 1
        if n["kind"] == "ELEMENT":
            known = attr_matches.get(id(n), {})
            for a in n["attrs"]:
                if a[1] in known:
                    a[0] = known[a[1]]
                else:
                    a[0] = counter[0]
                    counter[0] += 1
            for c in n["children"]:
                assign(c)

    assign(t2)


def xml_diff(xs: XmlStore, db: str, res: str, r1: int, r2: int) -> str | None:
    k1 = xs.read_keys(db, res, r1)
    k2 = xs.read_keys(db, res, r2)
    t1 = tree_from_rows(xs.nodes_rows(db, res, r1), k1)
    t2 = tree_from_rows(xs.nodes_rows(db, res, r2), k2)
    if k1 is None or k2 is None:
        # a revision pair predating key sidecars: fall back to
        # structural matching (the xml:import identity matcher)
        _structural_rekey(t1, t2)
    m1: dict[int, tuple] = {}
    m2: dict[int, tuple] = {}
    _index(t1, None, m1)
    _index(t2, None, m2)
    stmts: list[str] = []

    # ---- inserts + value/name updates, walking r2 in document order
    def sel(k: int) -> str:
        return f"sdb:select-item($doc, {k})"

    def walk2(node):
        if node["kind"] == "ELEMENT":
            run_groups: dict[str, list[str]] = {}
            kids = node["children"]
            for i, child in enumerate(kids):
                if child["key"] not in m1:
                    if node["key"] not in m1:
                        continue  # whole parent is inserted: subtree covers it
                    # TEXT inserts travel as quoted strings; COMMENT/PI
                    # keep serialize_tree's <!--...-->/<?...?> forms so
                    # the apply side re-creates the same node kind
                    frag = serialize_tree(child)
                    if child["kind"] == "TEXT":
                        frag = '"' + _esc_str(child["value"]) + '"'
                    # anchor: first following sibling that exists in r1
                    anchor = next(
                        (
                            s["key"]
                            for s in kids[i + 1:]
                            if s["key"] in m1
                        ),
                        None,
                    )
                    if anchor is not None:
                        stmts.append(
                            f"  insert nodes {frag} before {sel(anchor)}"
                        )
                    elif any(s["key"] in m1 for s in kids[:i]):
                        # trailing run: append (XQuery Update `into`)
                        stmts.append(
                            f"  insert nodes {frag} into {sel(node['key'])}"
                        )
                    else:
                        # front run with no old sibling at all: emit
                        # as-first in REVERSE so sequential application
                        # preserves document order
                        run_groups.setdefault("front", []).append(
                            f"  insert nodes {frag} as first into {sel(node['key'])}"
                        )
                    continue
                walk2(child)
            for st in reversed(run_groups.get("front", [])):
                stmts.append(st)
            # attributes: inserts + updates (skip when parent inserted)
            if node["key"] in m1:
                old_node = m1[node["key"]][0]
                old_attrs = {a[0]: (a[1], a[2]) for a in old_node["attrs"]}
                for akey, name, value in node["attrs"]:
                    if akey not in old_attrs:
                        stmts.append(
                            f'  insert node attribute {name} {{ "{_esc_str(value)}" }}'
                            f" into {sel(node['key'])}"
                        )
                    else:
                        oname, ovalue = old_attrs[akey]
                        if oname != name:
                            stmts.append(
                                f'  rename node {sel(akey)} as "{name}"'
                            )
                        if ovalue != value:
                            stmts.append(
                                f'  replace value of node {sel(akey)} with '
                                f'"{_esc_str(value)}"'
                            )
                if old_node["name"] != node["name"]:
                    stmts.append(
                        f'  rename node {sel(node["key"])} as "{node["name"]}"'
                    )
        else:
            if node["key"] in m1:
                old = m1[node["key"]][0]
                if old.get("value") != node.get("value"):
                    stmts.append(
                        f'  replace value of node {sel(node["key"])} with '
                        f'"{_esc_str(node["value"])}"'
                    )

    walk2(t2)

    # ---- deletes: top-most keys of r1 gone from r2 (document order)
    def walk1(node, parent_deleted):
        gone = node["key"] not in m2
        if gone and not parent_deleted:
            stmts.append(f"  delete nodes {sel(node['key'])}")
        if node["kind"] == "ELEMENT":
            if node["key"] in m2 and not gone:
                new_attrs = {a[0] for a in m2[node["key"]][0]["attrs"]}
                for akey, name, _ in node["attrs"]:
                    if akey not in new_attrs:
                        stmts.append(f"  delete nodes {sel(akey)}")
            for child in node["children"]:
                walk1(child, parent_deleted or gone)

    walk1(t1, False)

    if not stmts:
        return None
    body = ",\n".join(stmts)
    return (
        f"let $doc := xml:doc('{db}','{res}', {r1})\nreturn (\n{body}\n)\n"
    )


# ------------------------------------------------------------- apply
_HDR = re.compile(r"let \$doc := xml:doc\('([^']+)','([^']+)', (\d+)\)")
_SEL = r"sdb:select-item\(\$doc, (\d+)\)"
_PATTERNS = [
    ("ins_before", re.compile(rf"insert nodes (.+) before {_SEL}$", re.S)),
    ("ins_first", re.compile(rf"insert nodes (.+) as first into {_SEL}$", re.S)),
    ("ins_into", re.compile(rf"insert nodes (.+) into {_SEL}$", re.S)),
    ("ins_attr", re.compile(
        rf'insert node attribute ([^ ]+) \{{ "(.*)" \}} into {_SEL}$', re.S)),
    ("delete", re.compile(rf"delete nodes {_SEL}$")),
    ("replace_value", re.compile(
        rf'replace value of node {_SEL} with "(.*)"$', re.S)),
    ("rename", re.compile(rf'rename node {_SEL} as "(.*)"$', re.S)),
]


def _split_stmts(body: str) -> list[str]:
    """Split the return-body on top-level commas (commas inside XML
    fragments or quoted strings don't occur at line ends — the
    emitter writes one statement per line, comma-terminated)."""
    out = []
    for line in body.splitlines():
        line = line.strip().rstrip(",").strip()
        if line:
            out.append(line)
    return out


_UNESC = {"\\": "\\", '"': '"', "n": "\n", "r": "\r"}


def _unesc(s: str) -> str:
    # sequential (regex) unescape — chained .replace() would turn the
    # two-char sequence \\ followed by n into a newline
    return re.sub(r'\\([\\"nr])', lambda m: _UNESC[m.group(1)], s)


def apply_xml_diff(xs: XmlStore, script: str) -> int:
    """Execute an xml_diff script through the keyed write
    transaction; returns the committed revision."""
    m = _HDR.search(script)
    if not m:
        raise XmlStoreError("not an xml:diff script")
    db, res, r1 = m.group(1), m.group(2), int(m.group(3))
    body = script[script.index("return (") + len("return ("):]
    body = body.rsplit(")", 1)[0]
    # the script edits revision r1 (pinned in its xml:doc() header);
    # open the write trx on THAT base tree — XmlWtx raises when the
    # store has no such revision, so a mismatched store fails closed
    # instead of silently editing the wrong base
    w = XmlWtx(xs, db, res, revision=r1)
    for stmt in _split_stmts(body):
        kind = None
        match = None
        for k, pat in _PATTERNS:
            match = pat.match(stmt)
            if match:
                kind = k
                break
        if kind is None:
            raise XmlStoreError(f"unsupported diff statement {stmt!r}")
        if kind == "ins_before":
            frag, anchor = match.group(1), int(match.group(2))
            w.insert_fragment_before(anchor, frag)
        elif kind == "ins_first":
            frag, parent = match.group(1), int(match.group(2))
            w.move_to(parent)
            w.insert_fragment_as_first_child(frag)
        elif kind == "ins_into":
            frag, parent = match.group(1), int(match.group(2))
            w.insert_fragment_as_last_child(parent, frag)
        elif kind == "ins_attr":
            name, value, parent = match.group(1), match.group(2), int(match.group(3))
            w.move_to(parent)
            w.insert_attribute(name, _unesc(value))
        elif kind == "delete":
            w.move_to(int(match.group(1))).remove()
        elif kind == "replace_value":
            w.move_to(int(match.group(1))).set_value(_unesc(match.group(2)))
        elif kind == "rename":
            w.move_to(int(match.group(1))).set_name(_unesc(match.group(2)))
    return w.commit()


# ---------------------------------------------------------- import
def fmse_import(xs: XmlStore, db: str, res: str, new_xml: str) -> int:
    """xml:import — commit an externally-edited document as the next
    revision while UNCHANGED nodes keep their keys (reference:
    io/Import.java runs the FMSE tree-matching for this;
    diff/algorithm/fmse/FMSE.java). With keyed trees the matcher
    reduces to recursive longest-common-subsequence alignment over
    child signatures (kind + element name): matched elements recurse
    and keep their key, matched text/comment keep their key even
    when the value changed (the setValue identity rule), unmatched
    new nodes draw fresh keys in pre-order, unmatched old nodes
    retire their keys. Driver-side like every write transaction."""
    from sirix_spark.sources.xml_source import _shred_one

    rev = xs.latest_revision(db, res)
    old = tree_from_rows(xs.nodes_rows(db, res, rev), xs.read_keys(db, res, rev))
    neu = tree_from_rows(_shred_one("f", new_xml), None)
    matches, attr_matches = _match_trees(old, neu)
    counter = [xs.next_key(db, res)]

    def assign(n: dict):
        if id(n) in matches:
            n["key"] = matches[id(n)]
        else:
            n["key"] = counter[0]
            counter[0] += 1
        if n["kind"] == "ELEMENT":
            known = attr_matches.get(id(n), {})
            for a in n["attrs"]:
                if a[1] in known:
                    a[0] = known[a[1]]
                else:
                    a[0] = counter[0]
                    counter[0] += 1
            for c in n["children"]:
                assign(c)

    assign(neu)
    from sirix_spark.store.xmlwtx import serialize_tree as _ser
    from sirix_spark.store.xmlwtx import tree_keys as _tk

    return xs.commit(db, res, _ser(neu), keys=_tk(neu))
