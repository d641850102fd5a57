"""Serializer-limit corpus cases mined from the reference's
sirix-core service/json/serialize test classes:

- JsonSerializerTest.java (maxLevel / numberOfNodes / maxChildren /
  startNodeKey / metadata-mode tables and golden fixtures, plus the
  metadataSerializationAlwaysProducesValidJson sweep)
- JsonRecordSerializerTest.java (top-level record pagination)

Queries go through the string entry's sdb:serialize /
sdb:serialize-records (store/docserialize.py). Expected outputs are
the reference's OWN inline strings and resource fixtures; fixtures
load at case-build time from the reference tree (nothing derived
from it is committed). FUSE_NAMED_PRIMITIVES=true in both test
classes, so `*-fused.json` siblings take precedence exactly like
their expectedFor() helpers.

Metadata fixtures compare with "json-equal" (the tests use
JSONAssert.assertEquals(..., strict=true) — order-sensitive arrays,
order-insensitive whitespace) after normalizing hash values the way
the reference tests themselves do
(`replaceAll("[0-9a-fA-F]{16}", "0000000000000000")`,
JsonSerializerTest.java:283).
"""

from __future__ import annotations

import json
import os

_REF_JSON = (
    "/root/reference/bundles/sirix-core/src/test/resources/json"
)

# JsonDocumentCreator.JSON — the standard test document
TESTDOC = (
    '{"foo":["bar",null,2.33],'
    '"bar":{"hello":"world","helloo":true},'
    '"baz":"hello",'
    '"tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'
)


def _fixture(name: str) -> str:
    """expectedFor() analog: prefer the *-fused sibling."""
    stem, dot = name.rsplit(".", 1)
    fused = os.path.join(_REF_JSON, f"{stem}-fused.{dot}")
    path = fused if os.path.exists(fused) else os.path.join(_REF_JSON, name)
    with open(path) as f:
        return f.read().strip()


def _store(doc: str, db: str = "serdb", res: str = "r") -> str:
    return "jn:store('%s','%s','%s')" % (db, res, doc.replace("'", "''"))


def _c(name, source, query, expected=None, setup=(), **kw):
    case = {
        "name": name,
        "source": source,
        "setup": list(setup),
        "query": query,
        "expected": expected,
        "ignore_node_keys": False,
    }
    case.update(kw)
    return case


_DOC = "jn:doc('serdb','r')"
_SRC = "JsonSerializerTest.java"
_RSRC = "JsonRecordSerializerTest.java"


def _ser(opts: str = "") -> str:
    return (
        f"sdb:serialize({_DOC})"
        if not opts
        else f"sdb:serialize({_DOC}, {{{opts}}})"
    )


def _rec(n: int, opts: str = "") -> str:
    return (
        f"sdb:serialize-records({_DOC}, {n})"
        if not opts
        else f"sdb:serialize-records({_DOC}, {n}, {{{opts}}})"
    )


CASES: list = []

# ---------------------------------------- value-mode inline tables
_T = [_store(TESTDOC)]
CASES += [
    _c("JsonSer#basic", _SRC, _ser(), TESTDOC, setup=_T),
    _c("JsonSer#maxLevel1", _SRC, _ser('"maxLevel": 1'), "{}", setup=_T),
    _c("JsonSer#maxLevel2", _SRC, _ser('"maxLevel": 2'),
       '{"foo":[],"bar":{},"baz":"hello","tada":[]}', setup=_T),
    _c("JsonSer#maxLevel3", _SRC, _ser('"maxLevel": 3'),
       '{"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},'
       '"baz":"hello","tada":[{},{},"boo",{},[]]}', setup=_T),
    _c("JsonSer#maxLevel4", _SRC, _ser('"maxLevel": 4'), TESTDOC, setup=_T),
    _c("JsonSer#nodesExactLimit", _SRC,
       "sdb:serialize(jn:doc('serdb','arr'), {\"maxNodes\": 2})", "[1]",
       setup=["jn:store('serdb','arr','[1,2]')"]),
]
for n, exp in [(3, '{"foo":[]}'), (4, '{"foo":[]}'),
               (5, '{"foo":[],"bar":{}}'), (6, '{"foo":[],"bar":{}}')]:
    CASES.append(
        _c(f"JsonSer#maxLevel2Nodes{n}", _SRC,
           _ser(f'"maxLevel": 2, "maxNodes": {n}'), exp, setup=_T)
    )

# startNodeKey value tables (fused keys; the test's iter#32 comment
# documents the mapping)
for lvl, snk, exp in [
    (1, 2, '{"foo":[]}'),
    (1, 6, '{"bar":{}}'),
    (2, 6, '{"bar":{"hello":"world","helloo":true}}'),
    (2, 11, '{"foo":"bar"}'),
    (2, 10, '{"tada":[{},{},"boo",{},[]]}'),
    (3, 10, '{"tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'),
    (1, 3, '"bar"'),
    (1, 4, "null"),
    (1, 5, "2.33"),
]:
    CASES.append(
        _c(f"JsonSer#startKey{snk}Level{lvl}", _SRC,
           _ser(f'"maxLevel": {lvl}, "startNodeKey": {snk}'), exp, setup=_T)
    )
for n, exp in [(3, '{"foo":["bar"]}'), (4, '{"foo":["bar",null]}'),
               (5, '{"foo":["bar",null,2.33]}'),
               (6, '{"foo":["bar",null,2.33]}')]:
    CASES.append(
        _c(f"JsonSer#startKey2Nodes{n}", _SRC,
           _ser(f'"startNodeKey": 2, "maxLevel": 2, "maxNodes": {n}'),
           exp, setup=_T)
    )
for snk, lvl, n, mc, exp in [
    (2, 2, 3, 1, '{"foo":["bar"]}'),
    (2, 2, 4, 1, '{"foo":["bar"]}'),
    (2, 2, 5, 2, '{"foo":["bar",null]}'),
    (2, 2, 6, 3, '{"foo":["bar",null,2.33]}'),
    (1, 3, 7, 3, '{"foo":["bar",null,2.33]}'),
    (1, 3, 8, 3, '{"foo":["bar",null,2.33],"bar":{}}'),
]:
    CASES.append(
        _c(f"JsonSer#combo{snk}_{lvl}_{n}_{mc}", _SRC,
           _ser(f'"startNodeKey": {snk}, "maxLevel": {lvl}, '
                f'"maxNodes": {n}, "maxChildren": {mc}'), exp, setup=_T)
    )

# maxChildren golden files
for k in (1, 2, 3, 4):
    with open(
        os.path.join(
            _REF_JSON, "jsonSerializer", "testJsonDocumentWithMaxChildren1",
            f"document-with-{k}-maxChildren.json",
        )
    ) as f:
        exp = f.read().strip()
    CASES.append(
        _c(f"JsonSer#maxChildren{k}", _SRC, _ser(f'"maxChildren": {k}'),
           exp, setup=_T, compare="json-equal")
    )
with open(
    os.path.join(
        _REF_JSON, "jsonSerializer", "testJsonDocumentWithMaxChildren2",
        "document-with-1-maxChildren.json",
    )
) as f:
    _exp = f.read().strip()
with open(os.path.join(_REF_JSON, "complex3.json")) as f:
    _complex3 = f.read()
CASES.append(
    _c("JsonSer#maxChildren2Complex", _SRC, _ser('"maxChildren": 2'),
       _exp, setup=[_store(json.dumps(json.loads(_complex3),
                                      separators=(",", ":")))],
       compare="json-equal")
)

# ---------------------------------------- metadata golden fixtures
_META_FIXTURES = [
    ("JsonSer#metadata", "document-with-metadata.json",
     '"withMetaData": true', _T),
    ("JsonSer#metadataMaxLevelPretty", "testdoc-withmetadata-withmaxlevel.json",
     '"withMetaData": true, "maxLevel": 2', _T),
    ("JsonSer#metadataStartKeyLevel2",
     "test-withmetadata-withprettyprinting-withstartnodekey-withmaxlevel2.json",
     '"withMetaData": true, "startNodeKey": 10, "maxLevel": 2', _T),
    ("JsonSer#metadataStartKeyLevel3",
     "test-withmetadata-withprettyprinting-withstartnodekey-withmaxlevel3.json",
     '"withMetaData": true, "startNodeKey": 10, "maxLevel": 3', _T),
    ("JsonSer#nodeKeyMetadata",
     "test-withnodekeymetadata-withprettyprinting-withstartnodekey-withmaxlevel.json",
     '"nodeKeyMetaData": true, "startNodeKey": 10, "maxLevel": 3', _T),
    ("JsonSer#nodeKeyChildCountMetadata",
     "test-withnodekeyandchildcountmetadata-withprettyprinting-withstartnodekey-withmaxlevel.json",
     '"nodeKeyAndChildCountMetaData": true, "startNodeKey": 10, '
     '"maxLevel": 3', _T),
]
with open(os.path.join(_REF_JSON, "simple-testdoc.json")) as f:
    _SIMPLE = json.dumps(json.loads(f.read()), separators=(",", ":"))
_S = [_store(_SIMPLE)]
_META_FIXTURES += [
    ("JsonSer#metadataMaxLevelSimple",
     "simple-testdoc-withmetadata-withmaxlevel.json",
     '"withMetaData": true, "maxLevel": 2', _S),
    ("JsonSer#metadataMaxLevel3PrettySimple",
     "simple-testdoc-withmetadata-withmaxlevel-withprettyprint.json",
     '"withMetaData": true, "maxLevel": 3', _S),
    ("JsonSer#metadataStartObjectKey",
     "simple-testdoc-withmetadata-withstartnodekey-objectkey.json",
     '"withMetaData": true, "startNodeKey": 3', _S),
    ("JsonSer#metadataStartObject",
     "simple-testdoc-withmetadata-withstartnodekey-object.json",
     '"withMetaData": true, "startNodeKey": 3', _S),
    ("JsonSer#metadataStartArray",
     "simple-testdoc-withmetadata-withstartnodekey-array.json",
     '"withMetaData": true, "startNodeKey": 4', _S),
]
for name, fix, opts, setup in _META_FIXTURES:
    CASES.append(
        _c(name, _SRC, _ser(opts), _fixture(fix), setup=setup,
           compare="json-equal", normalize_hashes=True)
    )

# multi-revision envelope (testMultipleRevisionsJsonDocument):
# revision 2 inserts "tadaaa" as the root object's first record
CASES.append(
    _c("JsonSer#multipleRevisions", _SRC,
       _ser('"revisions": [1, 2]'),
       _fixture("multiple-revisions.json"),
       setup=_T + [
           # reference inserts AS FIRST CHILD; field position is
           # irrelevant under JSONAssert-strict (objects unordered)
           'insert json {"tadaaa": "todooo"} into ' + _DOC
       ],
       compare="json-equal")
)

# ---------------------------------------- validity sweep
# metadataSerializationAlwaysProducesValidJson: 7 docs x 2 metadata
# modes x 7 maxLevel settings must all yield VALID JSON
_SWEEP_DOCS = [
    '{"store":{"name":"Test Store","products":[{"id":1}],'
    '"metadata":{"version":"1.0"}}}',
    '{"a":{"b":{"c":{"d":1}}}}',
    '{"arr":[{"x":1},{"y":{"z":2}}]}',
    '{"empty":{},"emptyArr":[],"mixed":[1,"two",true,null,{"k":"v"}]}',
    '[{"obj":{"nested":{}}},[1,2],{}]',
    '{"o":{"p":{"q":[{"r":{"s":"t"}}]}}}',
    '{"users":[{"name":"a","roles":["x","y"],"meta":{"active":true}}]}',
]
for di, doc in enumerate(_SWEEP_DOCS, 1):
    for mode, mopt in (
        ("nkcc", '"nodeKeyAndChildCountMetaData": true'),
        ("meta", '"withMetaData": true'),
    ):
        for lvl in (1, 2, 3, 4, 5, 2147483647, None):
            opts = mopt if lvl is None else f'{mopt}, "maxLevel": {lvl}'
            CASES.append(
                _c(
                    f"JsonSerSweep#doc{di}_{mode}_lvl{lvl or 'none'}",
                    _SRC + ":metadataSerializationAlwaysProducesValidJson",
                    _ser(opts),
                    None,
                    setup=[_store(doc)],
                    **{"assert": "valid_json"},
                )
            )

# ---------------------------------------- JsonRecordSerializer
_A1 = [_store('[{},"bla",{"foo":"bar"},null,[]]')]
_A2 = [_store('[{},"bla",{"foo":{"bar": "baz"}},null,[]]')]
_A3 = [_store('[[],"foo",null,[],{}]')]
CASES += [
    _c("JsonRecSer#array", _RSRC, _rec(3), '[{},"bla",{"foo":"bar"}]',
       setup=_A1),
    _c("JsonRecSer#object", _RSRC, _rec(3),
       '{"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},'
       '"baz":"hello"}', setup=_T),
    _c("JsonRecSer#objectPagination", _RSRC,
       _rec(3, '"startNodeKey": 6'),
       '{"value":[{"baz":"hello"},'
       '{"tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}]}', setup=_T),
    _c("JsonRecSer#paginationNoRightSibling", _RSRC,
       _rec(3, '"startNodeKey": 10'), '{"value":[]}', setup=_T),
    _c("JsonRecSer#objectMaxLevel", _RSRC, _rec(3, '"maxLevel": 1'),
       '{"foo":[],"bar":{},"baz":"hello"}', setup=_T),
    _c("JsonRecSer#objectMaxLevelMetadata", _RSRC,
       _rec(3, '"maxLevel": 1, "withMetaData": true'),
       _fixture("jsonRecordSerializer/serializeObjectWithMaxLevelAndMetaData.json"),
       setup=_T, compare="json-equal", normalize_hashes=True),
    _c("JsonRecSer#arrayMaxLevelMetadata1", _RSRC,
       _rec(3, '"maxLevel": 1, "withMetaData": true'),
       _fixture("jsonRecordSerializer/serializeArrayWithMaxLevelAndMetaData1.json"),
       setup=_A2, compare="json-equal", normalize_hashes=True),
    _c("JsonRecSer#arrayMaxLevelMetadata2", _RSRC,
       _rec(3, '"maxLevel": 1, "withMetaData": true'),
       _fixture("jsonRecordSerializer/serializeArrayWithMaxLevelAndMetaData2.json"),
       setup=_A3, compare="json-equal", normalize_hashes=True),
    _c("JsonRecSer#arrayMaxLevelMetadata3", _RSRC,
       _rec(3, '"maxLevel": 2, "withMetaData": true'),
       _fixture("jsonRecordSerializer/serializeArrayWithMaxLevelAndMetaData3.json"),
       setup=_A2, compare="json-equal", normalize_hashes=True),
    _c("JsonRecSer#lastTopLevelNodeMetadata", _RSRC,
       _rec(3, '"startNodeKey": 4, "maxLevel": 1, "withMetaData": true'),
       _fixture("jsonRecordSerializer/serializeArrayWithMaxLevelAndMetaDataAndLastTopLevelNode.json"),
       setup=_A2, compare="json-equal", normalize_hashes=True),
    _c("JsonRecSer#paginationNoSiblingMetadata", _RSRC,
       _rec(3, '"startNodeKey": 10, "maxLevel": 2, '
               '"nodeKeyAndChildCountMetaData": true'),
       None, setup=_T,
       **{"assert": {"contains": ['"nodeKey":1', '"childCount":4',
                                  '"value":[]']}}),
]

# record-serializer validity sweep (recordMetadataSweepAlwaysProducesValidJson)
_RECDOC = (
    '{"store":{"name":"Test Store","products":[{"id":1}],'
    '"metadata":{"version":"1.0"}},'
    '"users":[{"name":"a","roles":["x","y"],"meta":{"active":true}}]}'
)
for mode, mopt in (
    ("nk", '"nodeKeyMetaData": true'),
    ("nkcc", '"nodeKeyAndChildCountMetaData": true'),
    ("full", '"withMetaData": true'),
):
    for lvl in (1, 2, None):
        opts = mopt if lvl is None else f'{mopt}, "maxLevel": {lvl}'
        CASES.append(
            _c(
                f"JsonRecSerSweep#{mode}_lvl{lvl or 'none'}",
                _RSRC + ":recordMetadataSweepAlwaysProducesValidJson",
                _rec(10, opts),
                None,
                setup=[_store(_RECDOC)],
                **{"assert": "valid_json"},
            )
        )
