"""Hand-authored replay cases for reference test classes whose setup
is JUnit-driven (wtx node transactions, per-test Java logic) rather
than extractable (query, expected) pairs.

Every case cites its reference test (file#method under
bundles/sirix-query/src/test/java/io/sirix/query/function/) and pins
the reference's own expected output. Setups that use the reference's
JsonNodeTrx API are replayed through the DocWtx analog
(sirix_spark/store/docwtx.py) with the LEGACY (non-fused) nodeKey
layout — the same layout the extractor corpus pins — translating each
test's `FUSED ? x : y` constants to their y branch.

Assertion modes:
- default              exact string equality with the reference output
- assert = "nonempty"  reference used assertNotNull/assertFalse(isEmpty)
- assert = "int_gt0"   reference parsed the output and asserted > 0
- assert = ["a","b"]   reference asserted contains() for each element
- assert = "error"     reference asserted the query throws
"""

from __future__ import annotations

import os

# JsonDocumentCreator.JSON (bundles/sirix-core/src/main/java/io/sirix/
# utils/JsonDocumentCreator.java) — the shared fixture document.
JSON = (
    '{"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},'
    '"baz":"hello","tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'
)

# SimpleQueryIntegrationTest.java fixture constants (verbatim).
SQ_JSON = (
    '{"sirix":[{"revisionNumber":1,"revision":{"foo":["bar",null,2.33],'
    '"bar":{"hello":"world","helloo":true},"baz":"hello","tada":[{"foo":"bar"},'
    '{"baz":false},"boo",{},[]]}},{"revisionNumber":2,"revision":{"tadaaa":"todooo",'
    '"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},"baz":"hello",'
    '"tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}}]}'
)
SQ_EXPECTED_SIRIX = (
    '[{"revisionNumber":1,"revision":{"foo":["bar",null,2.33],'
    '"bar":{"hello":"world","helloo":true},"baz":"hello","tada":[{"foo":"bar"},'
    '{"baz":false},"boo",{},[]]}},{"revisionNumber":2,"revision":{"tadaaa":"todooo",'
    '"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},"baz":"hello",'
    '"tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}}]'
)
_R1 = (
    '{"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},'
    '"baz":"hello","tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'
)
_R2 = (
    '{"foo":[{"foo":"bar"},"bar",null,2.33],"bar":{"hello":"world","helloo":true},'
    '"baz":"hello","tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'
)
_R3 = (
    '{"foo":[{"foo":"bar"},"bar",null,2.33],"bar":{"hello":"world"},'
    '"baz":"hello","tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}'
)
SQ_ALL_TIMES = f"{_R1} {_R2} {_R3}"
SQ_LAST = _R3
SQ_NEXT = _R2
SQ_FUTURE = f"{_R2} {_R3}"
SQ_PAST = f"{_R2} {_R1}"
SQ_PAST_OR_SELF = f"{_R3} {_R2} {_R1}"


# --------------------------------------------------------------- setups
def _setup_temporal5(spark, store):
    """jn/temporal/SetupRevisions.java (legacy constants: foo-array 3,
    helloo 11, tada last item 25): store → subtree-insert auto-commit
    → explicit (empty) commit → remove+commit → array-insert+commit =
    5 revisions."""
    from sirix_spark.store.docwtx import DocWtx

    store.store("json-path1", "mydoc.jn", JSON)
    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.move_to(3)
    w.insert_subtree_as_first_child('{"foo":"bar"}')  # auto-commit r2
    w.commit()  # r3 (the explicit wtx.commit after the subtree insert)
    w.move_to(11).remove().commit()  # r4
    w.move_to(25).insert_array_as_right_sibling()
    w.commit()  # r5


def _setup_simplequery3(spark, store):
    """SimpleQueryIntegrationTest#setupRevisions (legacy constants):
    store → subtree-insert auto-commit → remove+commit = 3 revisions."""
    from sirix_spark.store.docwtx import DocWtx

    store.store("json-path1", "mydoc.jn", JSON)
    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.move_to(3)
    w.insert_subtree_as_first_child('{"foo":"bar"}')  # auto-commit r2
    w.move_to(11).remove().commit()  # r3


def _setup_itemhistory1(spark, store):
    """sdb/trx/ItemHistoryTest#test: value history of "bla" (key 2)."""
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.insert_subtree_as_first_child('["bla", "blubb"]')  # r1
    w.move_to(2).set_string_value("blabla").commit()  # r2
    w.move_to(2).set_string_value("blablabla").commit()  # r3
    w.move_to(2).remove().commit()  # r4


def _setup_itemhistory2(spark, store):
    """sdb/trx/ItemHistoryTest#test2 (legacy key 12 = OBJECT_KEY
    "generic" of the second object): rename history."""
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc2.jn")
    w.insert_subtree_as_first_child("[]")  # r1
    w.insert_subtree_as_first_child(
        '{"generic": 1, "location": {"state": "NY", "city": "New York"}}'
    )  # r2
    w.insert_subtree_as_right_sibling(
        '{"generic": 1, "location": {"state": "CA", "city": "Los Angeles"}}'
    )  # r3
    w.move_to(12).set_object_key_name("generic1").commit()  # r4


def _setup_isdeleted_true(spark, store):
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.insert_subtree_as_first_child('["bla", "blubb"]')  # r1
    w.move_to(2).remove().commit()  # r2


def _setup_isdeleted_false(spark, store):
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.insert_subtree_as_first_child('["bla", "blubb"]', commit=False)
    w.move_to(2)
    w.commit()  # single revision


def _setup_getpath(spark, store):
    """sdb/trx/GetPathTest (legacy keys: 2.33 at 6; queried keys 17→25,
    8→11, 14→21, 19→28): createTestDocument + {"foo":[]} inserted as
    foo[3]."""
    from sirix_spark.store.docwtx import DocWtx

    store.store("json-path1", "shredded", JSON)
    w = DocWtx(store, "json-path1", "shredded")
    w.move_to(6)
    w.insert_subtree_as_right_sibling('{"foo":[]}')  # auto-commit r2


def _setup_rollback(spark, store):
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.insert_subtree_as_first_child('["original"]')  # r1
    w.move_to(2).set_string_value("modified")
    w.rollback()


def _setup_authors(spark, store):
    """sdb/trx/AuthorNameTest / AuthorUUIDTest: four committing users
    (first commit is the default "admin" user)."""
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "json-path1", "mydoc.jn")
    w.insert_subtree_as_first_child('["bla", "blubb"]')  # r1 admin
    DocWtx(
        store, "json-path1", "mydoc.jn",
        author="johannes", author_id="11111111-1111-1111-1111-111111111111",
    ).move_to(2).set_string_value("blabla").commit()  # r2
    DocWtx(
        store, "json-path1", "mydoc.jn",
        author="moshe", author_id="22222222-2222-2222-2222-222222222222",
    ).move_to(2).set_string_value("blablabla").commit()  # r3
    DocWtx(
        store, "json-path1", "mydoc.jn",
        author="carolin", author_id="33333333-3333-3333-3333-333333333333",
    ).move_to(2).remove().commit()  # r4


def _setup_bitemporal(spark, store):
    """jn/temporal/BitemporalQueryIntegrationTest: employees resource
    configured with validTimePaths(validFrom, validTo), BITEMPORAL_JSON
    inserted via wtx."""
    from sirix_spark.store.docwtx import DocWtx

    w = DocWtx(store, "bitemporal-db", "employees")
    w.insert_subtree_as_first_child(BITEMPORAL_JSON, commit=False)
    w.commit()
    store.set_valid_time_paths(
        "bitemporal-db", "employees", "validFrom", "validTo"
    )


BITEMPORAL_JSON = (
    '[{"id": 1, "name": "Alice", "salary": 50000,'
    ' "validFrom": "2020-01-01T00:00:00Z", "validTo": "2020-12-31T23:59:59Z"},'
    '{"id": 2, "name": "Bob", "salary": 60000,'
    ' "validFrom": "2020-06-01T00:00:00Z", "validTo": "2021-05-31T23:59:59Z"},'
    '{"id": 3, "name": "Charlie", "salary": 55000,'
    ' "validFrom": "2019-01-01T00:00:00Z", "validTo": "2019-12-31T23:59:59Z"}]'
)


def _setup_usecases_exposures(spark, store):
    """jn/docs/UseCasesDocQueryTest#testOpenBitemporalQuery."""
    from sirix_spark.store.docwtx import DocWtx

    data = (
        '[{"id": 1, "entity": "ACME Corp", "exposure": 5000000,'
        ' "validFrom": "2025-02-01T00:00:00Z", "validTo": "2025-02-28T23:59:59Z"},'
        '{"id": 2, "entity": "Globex Inc", "exposure": 3000000,'
        ' "validFrom": "2025-03-01T00:00:00Z", "validTo": "2025-03-31T23:59:59Z"},'
        '{"id": 3, "entity": "Initech LLC", "exposure": 8000000,'
        ' "validFrom": "2025-01-01T00:00:00Z", "validTo": "2025-12-31T23:59:59Z"}]'
    )
    w = DocWtx(store, "risk-db", "exposures")
    w.insert_subtree_as_first_child(data, commit=False)
    w.commit()
    store.set_valid_time_paths("risk-db", "exposures", "validFrom", "validTo")


def _setup_usecases_ledger(spark, store):
    """jn/docs/UseCasesDocQueryTest#testFraudDetectionQuery: TX-001/002
    backdated (validFrom far before the commit instant), TX-003 recent."""
    from datetime import datetime, timezone

    from sirix_spark.store.docwtx import DocWtx

    now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    data = (
        '[{"txId": "TX-001", "amount": 50000, "account": "ACC-123",'
        ' "validFrom": "2024-01-15T00:00:00Z", "validTo": "2099-12-31T23:59:59Z"},'
        '{"txId": "TX-002", "amount": 75000, "account": "ACC-456",'
        ' "validFrom": "2024-06-01T00:00:00Z", "validTo": "2099-12-31T23:59:59Z"},'
        '{"txId": "TX-003", "amount": 10000, "account": "ACC-789",'
        f' "validFrom": "{now}", "validTo": "2099-12-31T23:59:59Z"}}]'
    )
    w = DocWtx(store, "ledger", "transactions")
    w.insert_subtree_as_first_child(data, commit=False)
    w.commit()
    store.set_valid_time_paths("ledger", "transactions", "validFrom", "validTo")


def _setup_xml_versioned(spark, store):
    """XmlDocumentCreator.createVersionedWithUpdatesAndDeletes: the
    standard XML fixture then 4 committed mutations = 5 revisions
    (r2/r3 insert <a att="attval">OOPS4!</a> as first child, r4
    removes the trailing text, r5 setValue on node 4 — the first
    text node, stable across the inserts)."""
    from sirix_spark.store.xmlstore import XmlStore
    from sirix_spark.store.xmlwtx import XmlWtx

    xs = XmlStore(store.root)
    base = (
        '<p:a xmlns:p="ns" i="j">oops1<b>foo<c/></b>oops2'
        '<b p:x="y"><c/>bar</b>oops3</p:a>'
    )
    xs.store("xml-db", "resource", base)
    # the reference's exact cursor-op sequence
    # (XmlDocumentCreator.createVersionedWithUpdatesAndDeletes):
    # r2/r3 insert <a att="attval">OOPS4!</a> as first child (fresh
    # keys 14-16 / 17-19), r4 removes the last child (text key 13),
    # r5 setValue on key 4 (key SURVIVES) — all through the keyed
    # write transaction, so nodeKeys are stable across revisions.
    w = XmlWtx(xs, "xml-db", "resource")
    for _ in range(2):
        w.move_to_document_root().move_to_first_child()
        w.insert_element_as_first_child("a")
        w.insert_attribute("att", "attval").move_to_parent()
        w.insert_text_as_first_child("OOPS4!")
        w.commit()
    w.move_to_document_root().move_to_first_child().move_to_last_child()
    w.remove()
    w.commit()
    w.move_to(4).set_value("fooooooo")
    w.commit()


def _setup_path_summary_off(spark, store):
    """PathSummaryOffTest#aStoreWithoutAPathSummaryStillCreatesResources:
    a store built with buildPathSummary(false) must still create
    resources and answer queries (the defaulted statistics turn off
    with the summary instead of making creation throw)."""
    store.path_summary = False
    store.path_stats = False
    store.store("json-path1", "a.jn", '[{"age":10},{"age":20}]')


def _setup_decimal_bound(spark, store):
    """scan/DecimalBoundSaturationTest fixture: 2000 records with
    scale-8 exact decimals 10.00000001 .. 10.00002000."""
    recs = ",".join(
        '{"id":%d,"price":10.%08d}' % (i, 1 + i) for i in range(2000)
    )
    store.store("decimal-bound-db", "records.jn", "[" + recs + "]")


def _setup_decimal_disjunction(spark, store):
    """scan/DecimalDisjunctionSoundnessTest fixture: even records a
    genuine double 2.55e1, odd records the exact decimal 19.75."""
    n = 2000
    recs = ",".join(
        '{"id":%d,"price":%s}' % (i, "2.55e1" if i % 2 == 0 else "19.75")
        for i in range(n)
    )
    store.store("decimal-disjunction-db", "records.jn", "[" + recs + "]")


def _setup_decimal_collision(spark, store):
    """scan/DecimalDoubleCollisionTest fixtures: a homogeneous corpus
    of 1000.25000000000001 (a decimal that double-rounds onto
    1000.25) and a mixed corpus alternating the two spellings."""
    n = 2000
    homog = ",".join('{"id":%d,"price":1000.25000000000001}' % i for i in range(n))
    mixed = ",".join(
        '{"id":%d,"price":%s}' % (i, "1000.25" if i % 2 == 0 else "1000.25000000000001")
        for i in range(n)
    )
    store.store("decimal-collision-db", "records.jn", "[" + homog + "]")
    store.store("decimal-collision-db", "mixed.jn", "[" + mixed + "]")


class _JavaRandom:
    """java.util.Random's documented 48-bit LCG (the JDK javadoc
    specifies the exact algorithm) — needed to reproduce the
    reference fixtures that seed java.util.Random."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) >= 0 and bits - val + (bound - 1) < (1 << 31):
                return val

    def next_boolean(self) -> bool:
        return self._next(1) != 0


def _nested_same_name_rows(n=20_000):
    depts = ("Eng", "Sales", "Mkt", "Ops", "HR")
    rng = _JavaRandom(0xABCDEF)
    rows = []
    for i in range(n):
        top_age = 20 + rng.next_int(50)
        nested_age = 1 + rng.next_int(15)
        active = rng.next_boolean()
        dept = depts[rng.next_int(len(depts))]
        pet_dept = depts[rng.next_int(len(depts))]
        rows.append((top_age, nested_age, active, dept, pet_dept))
    return rows


def _setup_nested_same_name(spark, store):
    """scan/NestedSameNamePathScopingTest fixture, byte-faithful via
    the java.util.Random replica: 20k records whose nested pet.age /
    pet.dept share names with the top-level columns."""
    parts = []
    for i, (ta, na, act, d, pd) in enumerate(_nested_same_name_rows()):
        parts.append(
            '{"id":%d,"age":%d,"active":%s,"dept":"%s",'
            '"pet":{"age":%d,"dept":"%s"}}'
            % (i, ta, "true" if act else "false", d, na, pd)
        )
    store.store("nested-db", "records.jn", "[" + ",".join(parts) + "]")


_NSN = _nested_same_name_rows()
_NSN_AGE40 = str(sum(1 for r in _NSN if r[0] > 40))
_NSN_AGE40_ACTIVE = str(sum(1 for r in _NSN if r[0] > 40 and r[2]))
_NSN_ENG = str(sum(1 for r in _NSN if r[3] == "Eng"))


def _setup_versioned_years(spark, store):
    """scan/VersioningColumnScanTest shape, compacted: 500 records,
    then a second revision replacing year with the NON-dyadic decimal
    2100.55 on every fifth record (title t0) through the update
    syntax."""
    from sirix_spark.jsoniq.docmodel import DocEvaluator

    recs = ",".join(
        '{"id":%d,"year":%d,"title":"t%d"}' % (i, 1990 + i % 30, i % 5)
        for i in range(500)
    )
    store.store("versioned-scan-db", "records.jn", "[" + recs + "]")
    DocEvaluator(spark, store).execute(
        "for $r in jn:doc('versioned-scan-db','records.jn')[] "
        'where $r.title eq "t0" '
        "return replace json value of $r.year with 2100.55"
    )


SETUPS = {
    "bitemporal": _setup_bitemporal,
    "versioned_years": _setup_versioned_years,
    "nested_same_name": _setup_nested_same_name,
    "decimal_bound": _setup_decimal_bound,
    "decimal_disjunction": _setup_decimal_disjunction,
    "decimal_collision": _setup_decimal_collision,
    "xml_versioned": _setup_xml_versioned,
    "path_summary_off": _setup_path_summary_off,
    "usecases_exposures": _setup_usecases_exposures,
    "usecases_ledger": _setup_usecases_ledger,
    "temporal5": _setup_temporal5,
    "simplequery3": _setup_simplequery3,
    "itemhistory1": _setup_itemhistory1,
    "itemhistory2": _setup_itemhistory2,
    "isdeleted_true": _setup_isdeleted_true,
    "isdeleted_false": _setup_isdeleted_false,
    "getpath": _setup_getpath,
    "rollback": _setup_rollback,
    "authors": _setup_authors,
}


def _c(name, source, query, expected=None, setup=(), setup_py=None, **kw):
    case = {
        "name": name,
        "source": source,
        "setup": list(setup),
        "query": query,
        "expected": expected,
        "ignore_node_keys": False,
    }
    if setup_py:
        case["setup_py"] = setup_py
    case.update(kw)
    return case


_STORE2 = "jn:store('json-path1','mydoc.jn','[\"bla\", \"blubb\"]')"
_DOC = "jn:doc('json-path1','mydoc.jn')"

CASES = [
    # ---------------------------------------- jn/temporal/FirstExisting
    _c("FirstExisting#revisionsAndNodeExists", "FirstExistingTest.java",
       "sdb:revision(jn:first-existing(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 26)))",
       "2", setup_py="temporal5"),
    _c("FirstExisting#nodeDoesNotExist", "FirstExistingTest.java",
       "sdb:revision(jn:first-existing(sdb:select-item(jn:doc('json-path1','mydoc.jn',2), 11)))",
       "1", setup_py="temporal5"),
    _c("FirstExisting#existsInMostRecentRevision", "FirstExistingTest.java",
       "sdb:revision(jn:first-existing(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 29)))",
       "5", setup_py="temporal5"),
    # ----------------------------------------- jn/temporal/LastExisting
    _c("LastExisting#revisionsAndNodeExists", "LastExistingTest.java",
       "sdb:revision(jn:last-existing(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 26)))",
       "5", setup_py="temporal5"),
    _c("LastExisting#nodeGoneInLastRevision", "LastExistingTest.java",
       "sdb:revision(jn:last-existing(sdb:select-item(jn:doc('json-path1','mydoc.jn',2), 11)))",
       "3", setup_py="temporal5"),
    # ------------------------------------ jn/temporal/DocByPointInTime
    _c("DocByPointInTime#beforeFirstRevision", "DocByPointInTimeJsonTest.java",
       "jn:open('json-path1','mydoc.jn', xs:dateTime('2000-01-01T00:00:00Z'))",
       "", setup_py="temporal5"),
    _c("DocByPointInTime#afterFirstRevision", "DocByPointInTimeJsonTest.java",
       "jn:open('json-path1','mydoc.jn', xs:dateTime('2100-01-01T00:00:00Z'))",
       None, setup_py="temporal5", **{"assert": "nonempty"}),
    # ------------------------------------------ sdb/trx/ItemHistory
    _c("ItemHistory#test", "ItemHistoryTest.java",
       "sdb:item-history(sdb:select-item(jn:doc('json-path1','mydoc.jn', 1), 2))",
       '"bla" "blabla" "blablabla"', setup_py="itemhistory1"),
    _c("ItemHistory#test2", "ItemHistoryTest.java",
       "sdb:item-history(sdb:select-item(jn:doc('json-path1','mydoc2.jn'), 12))",
       '"generic" "generic1"', setup_py="itemhistory2"),
    # -------------------------------------------- sdb/trx/IsDeleted
    _c("IsDeleted#true", "IsDeletedTest.java",
       "sdb:is-deleted(sdb:select-item(jn:doc('json-path1','mydoc.jn', 1), 2))",
       "true", setup_py="isdeleted_true"),
    _c("IsDeleted#false", "IsDeletedTest.java",
       "sdb:is-deleted(sdb:select-item(jn:doc('json-path1','mydoc.jn', 1), 2))",
       "false", setup_py="isdeleted_false"),
    # --------------------------------------- jn/trx/SelectJsonItem
    _c("SelectJsonItem#root", "SelectJsonItemTest.java",
       "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 1)",
       '["bla","blubb"]', setup=[_STORE2]),
    _c("SelectJsonItem#string", "SelectJsonItemTest.java",
       "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 2)",
       '"bla"', setup=[_STORE2]),
    _c("SelectJsonItem#nestedObject", "SelectJsonItemTest.java",
       "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 2)",
       '{"name":"Alice"}',
       setup=["jn:store('json-path1','mydoc.jn','[{\"name\":\"Alice\"}, {\"name\":\"Bob\"}]')"]),
    _c("SelectJsonItem#invalidKeyThrows", "SelectJsonItemTest.java",
       "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 999)",
       None, setup=["jn:store('json-path1','mydoc.jn','[\"bla\"]')"],
       **{"assert": "error"}),
    # -------------------------------------------- sdb/trx counts
    _c("GetChildCount#array", "GetChildCountTest.java",
       f"sdb:child-count({_DOC})", "3",
       setup=["jn:store('json-path1','mydoc.jn','[\"a\", \"b\", \"c\"]')"]),
    _c("GetChildCount#object", "GetChildCountTest.java",
       f"sdb:child-count({_DOC})", "2",
       setup=["jn:store('json-path1','mydoc.jn','{\"a\":1, \"b\":2}')"]),
    _c("GetChildCount#leaf", "GetChildCountTest.java",
       f"sdb:child-count(sdb:select-item({_DOC}, 2))", "0", setup=[_STORE2]),
    _c("GetDescendantCount#array", "GetDescendantCountTest.java",
       f"sdb:descendant-count({_DOC})", "3",
       setup=["jn:store('json-path1','mydoc.jn','[\"a\", \"b\", \"c\"]')"]),
    _c("GetDescendantCount#nested", "GetDescendantCountTest.java",
       f"sdb:descendant-count({_DOC})", "2",
       setup=["jn:store('json-path1','mydoc.jn','{\"a\": {\"b\": 1}}')"]),
    _c("GetDescendantCount#leaf", "GetDescendantCountTest.java",
       f"sdb:descendant-count(sdb:select-item({_DOC}, 2))", "0",
       setup=[_STORE2]),
    # -------------------------------------------- sdb/trx/LevelOrder
    _c("LevelOrder#traverseAll", "LevelOrderTest.java",
       f"for $node in sdb:level-order({_DOC}) return $node",
       None, setup=["jn:store('json-path1','mydoc.jn','[\"a\", \"b\", \"c\"]')"],
       **{"assert": ["a", "b", "c"]}),
    _c("LevelOrder#depth1", "LevelOrderTest.java",
       f"count(sdb:level-order({_DOC}, 1))", None,
       setup=["jn:store('json-path1','mydoc.jn','[{\"a\": {\"deep\": 1}}, {\"b\": 2}]')"],
       **{"assert": "int_gt0"}),
    _c("LevelOrder#all", "LevelOrderTest.java",
       f"count(sdb:level-order({_DOC}))", None,
       setup=["jn:store('json-path1','mydoc.jn','[{\"a\": {\"deep\": 1}}, {\"b\": 2}]')"],
       **{"assert": "int_gt0"}),
    # ------------------------------------------ sdb/trx/SelectParent
    _c("SelectParent#memberParent", "SelectParentTest.java",
       f"sdb:select-parent({_DOC}[1])", '["bla","blubb"]', setup=[_STORE2]),
    # ------------------------------------------ sdb/trx/GetNodeKey
    _c("JsonGetNodeKey#member", "JsonGetNodeKeyTest.java",
       f"sdb:nodekey({_DOC}[1])", "3", setup=[_STORE2]),
    # --------------------------------------------- sdb/trx/GetPath
    _c("GetPath#arrayMember", "GetPathTest.java",
       "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 25))",
       "/tada/[]/[4]", setup_py="getpath"),
    _c("GetPath#objectField", "GetPathTest.java",
       "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 11))",
       "/bar/helloo", setup_py="getpath"),
    _c("GetPath#nestedField", "GetPathTest.java",
       "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 21))",
       "/tada/[1]/baz", setup_py="getpath"),
    _c("GetPath#insertedArray", "GetPathTest.java",
       "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 28))",
       "/foo/[3]/foo/[]", setup_py="getpath"),
    # ---------------------------------------------- sdb/trx/GetHash
    _c("GetHash#root", "GetHashTest.java",
       f"sdb:hash({_DOC})", None, setup=[_STORE2], **{"assert": "nonempty"}),
    _c("GetHash#child", "GetHashTest.java",
       f"sdb:hash(sdb:select-item({_DOC}, 2))", None, setup=[_STORE2],
       **{"assert": "nonempty"}),
    # --------------------------------------------- sdb/trx/Rollback
    _c("Rollback#lowLevelApi", "RollbackTest.java",
       _DOC, '["original"]', setup_py="rollback"),
    _c("Rollback#preservesOriginalData", "RollbackTest.java",
       _DOC, '["original"]', setup_py="rollback"),
    # ------------------------------------------- sdb/trx author fns
    _c("AuthorName#rev1", "AuthorNameTest.java",
       "sdb:author-name(jn:doc('json-path1','mydoc.jn', 1))", "admin",
       setup_py="authors"),
    _c("AuthorName#rev2", "AuthorNameTest.java",
       "sdb:author-name(jn:doc('json-path1','mydoc.jn', 2))", "johannes",
       setup_py="authors"),
    _c("AuthorName#rev3", "AuthorNameTest.java",
       "sdb:author-name(jn:doc('json-path1','mydoc.jn', 3))", "moshe",
       setup_py="authors"),
    _c("AuthorName#rev4", "AuthorNameTest.java",
       "sdb:author-name(jn:doc('json-path1','mydoc.jn', 4))", "carolin",
       setup_py="authors"),
    _c("AuthorUUID#rev2", "AuthorUUIDTest.java",
       "sdb:author-id(jn:doc('json-path1','mydoc.jn', 2))",
       "11111111-1111-1111-1111-111111111111", setup_py="authors"),
    _c("AuthorUUID#rev3", "AuthorUUIDTest.java",
       "sdb:author-id(jn:doc('json-path1','mydoc.jn', 3))",
       "22222222-2222-2222-2222-222222222222", setup_py="authors"),
    _c("AuthorUUID#rev4", "AuthorUUIDTest.java",
       "sdb:author-id(jn:doc('json-path1','mydoc.jn', 4))",
       "33333333-3333-3333-3333-333333333333", setup_py="authors"),
    # --------------------------- jn/temporal/BitemporalQueryIntegration
    _c("BitemporalQuery#validAtQueryFunction",
       "BitemporalQueryIntegrationTest.java",
       "jn:valid-at('bitemporal-db', 'employees', xs:dateTime('2020-07-01T12:00:00Z'))",
       None, setup_py="bitemporal", **{"assert": "nonempty"}),
    # -------------------------------------- jn/io/SimpleQueryIntegration
    _c("SimpleQuery#testSimple", "SimpleQueryIntegrationTest.java",
       f"{_DOC}[0]", '"bla"', setup=[_STORE2]),
    _c("SimpleQuery#testSimpleSecond", "SimpleQueryIntegrationTest.java",
       f"{_DOC}.sirix", SQ_EXPECTED_SIRIX,
       setup=[f"jn:store('json-path1','mydoc.jn','{SQ_JSON}')"]),
    _c("SimpleQuery#testSimpleDeref", "SimpleQueryIntegrationTest.java",
       f"{_DOC}.sirix.revisionNumber", "1",
       setup=["jn:store('json-path1','mydoc.jn','{\"sirix\":{\"revisionNumber\":1}}')"]),
    _c("SimpleQuery#testComplexSecond", "SimpleQueryIntegrationTest.java",
       f"{_DOC}.sirix[0].revisionNumber", "1",
       setup=[f"jn:store('json-path1','mydoc.jn','{SQ_JSON}')"]),
    _c("SimpleQuery#testArrays", "SimpleQueryIntegrationTest.java",
       f"{_DOC}[1][0][0]", '"bar"',
       setup=["jn:store('json-path1','mydoc.jn','[\"foo\",[[\"bar\"]]]')"]),
    _c("SimpleQuery#allTimes", "SimpleQueryIntegrationTest.java",
       f"jn:all-times({_DOC})", SQ_ALL_TIMES, setup_py="simplequery3"),
    _c("SimpleQuery#first", "SimpleQueryIntegrationTest.java",
       f"jn:first({_DOC})", JSON, setup_py="simplequery3"),
    _c("SimpleQuery#last", "SimpleQueryIntegrationTest.java",
       f"jn:last({_DOC})", SQ_LAST, setup_py="simplequery3"),
    _c("SimpleQuery#next", "SimpleQueryIntegrationTest.java",
       "jn:next(jn:doc('json-path1','mydoc.jn',1))", SQ_NEXT,
       setup_py="simplequery3"),
    _c("SimpleQuery#previous", "SimpleQueryIntegrationTest.java",
       "jn:previous(jn:doc('json-path1','mydoc.jn',2))", JSON,
       setup_py="simplequery3"),
    _c("SimpleQuery#future", "SimpleQueryIntegrationTest.java",
       "jn:future(jn:doc('json-path1','mydoc.jn',1))", SQ_FUTURE,
       setup_py="simplequery3"),
    _c("SimpleQuery#futureOrSelf", "SimpleQueryIntegrationTest.java",
       "jn:future(jn:doc('json-path1','mydoc.jn',1),true())", SQ_ALL_TIMES,
       setup_py="simplequery3"),
    _c("SimpleQuery#past", "SimpleQueryIntegrationTest.java",
       "jn:past(jn:doc('json-path1','mydoc.jn',3))", SQ_PAST,
       setup_py="simplequery3"),
    _c("SimpleQuery#pastOrSelf", "SimpleQueryIntegrationTest.java",
       "jn:past(jn:doc('json-path1','mydoc.jn',3),true())", SQ_PAST_OR_SELF,
       setup_py="simplequery3"),
    # ----------------------------------------------- jn/io lifecycle
    _c("StoreIntegration#single", "StoreIntegrationTest.java",
       "jn:doc('json-path1','mydoc.jn')", '["bla","blubb"]',
       setup=[_STORE2]),
    _c("StoreIntegration#collection", "StoreIntegrationTest.java",
       "jn:exists-database('json-path1')", "true",
       setup=["jn:store('json-path1',(),('[\"bla\", \"blubb\"]','{\"foo\": true}'))"]),
    _c("DocIntegration#openRoot", "DocIntegrationTest.java",
       _DOC, '["bla","blubb"]', setup=[_STORE2]),
    _c("DropDatabaseIntegration#dropThenExistsFalse",
       "DropDatabaseIntegrationTest.java",
       "jn:exists-database('json-path1')", "false",
       setup=[_STORE2, "jn:drop-database('json-path1')"]),
    _c("DropResourceIntegration#dropThenExistsFalse",
       "DropResourceIntegrationTest.java",
       "jn:exists-resource('json-path1','mydoc')", "false",
       setup=["jn:store('json-path1','mydoc', '{\"foo\":\"bar\"}')",
              "jn:drop-resource('json-path1','mydoc')"]),
    _c("DropResourceIntegration#databaseStillExists",
       "DropResourceIntegrationTest.java",
       "jn:exists-database('json-path1')", "true",
       setup=["jn:store('json-path1','mydoc', '{\"foo\":\"bar\"}')",
              "jn:drop-resource('json-path1','mydoc')"]),
]

# ------------------------------- jn/docs/ArchitectureDocQueryTest
_SHOP_STORE = (
    "jn:store('shop', 'products', '{\"products\":[{\"sku\":\"SKU-12345\","
    "\"price\":99.99},{\"sku\":\"SKU-67890\",\"price\":49.99}]}')"
)
_SHOP_UPDATE = (
    "let $doc := jn:doc('shop', 'products') "
    "return replace json value of $doc.products[0].price with 129.99"
)
CASES += [
    _c("ArchitectureDoc#pointInTimeRev1", "ArchitectureDocQueryTest.java",
       "let $catalog := jn:doc('shop', 'products', 1) "
       "for $p in $catalog.products[] where $p.sku eq \"SKU-12345\" return $p.price",
       None, setup=[_SHOP_STORE, _SHOP_UPDATE], **{"assert": ["99.99"]}),
    _c("ArchitectureDoc#pointInTimeRev2", "ArchitectureDocQueryTest.java",
       "let $catalog := jn:doc('shop', 'products', 2) "
       "for $p in $catalog.products[] where $p.sku eq \"SKU-12345\" return $p.price",
       None, setup=[_SHOP_STORE, _SHOP_UPDATE], **{"assert": ["129.99"]}),
    _c("ArchitectureDoc#diffBetweenRevisions", "ArchitectureDocQueryTest.java",
       "let $rev1 := jn:doc('configs', 'production', 1) "
       "let $rev2 := jn:doc('configs', 'production', 2) "
       "return jn:diff('configs', 'production', sdb:revision($rev1), sdb:revision($rev2))",
       None,
       setup=["jn:store('configs', 'production', '{\"database\": {\"host\": "
              "\"localhost\", \"port\": 5432}, \"cache\": {\"enabled\": true}}')",
              "insert json {\"newSetting\": \"addedValue\"} into "
              "jn:doc('configs', 'production')"],
       **{"assert": "nonempty"}),
    _c("ArchitectureDoc#allTimesEvolution", "ArchitectureDocQueryTest.java",
       "let $allergy := jn:doc('hospital', 'patient').allergies[0] "
       "for $version in jn:all-times($allergy) "
       "return {\"revision\": sdb:revision($version), \"severity\": $version.severity}",
       None,
       setup=["jn:store('hospital', 'patient', '{\"name\": \"John Doe\", "
              "\"allergies\": [{\"name\": \"Penicillin\", \"severity\": \"high\"}]}')",
              "replace json value of jn:doc('hospital', 'patient')"
              ".allergies[0].severity with \"critical\""],
       **{"assert": ["high", "critical"]}),
    _c("ArchitectureDoc#hashFunction", "ArchitectureDocQueryTest.java",
       "sdb:hash(jn:doc('testdb', 'testres').data)", None,
       setup=["jn:store('testdb', 'testres', '{\"data\": {\"value\": 100}}')"],
       **{"assert": "nonempty"}),
    _c("ArchitectureDoc#detectNewRecords", "ArchitectureDocQueryTest.java",
       "let $current := jn:doc('bank', 'accounts') "
       "for $account in $current.accounts[] "
       "where not(exists(jn:previous($account))) return $account.owner",
       None,
       setup=["jn:store('bank', 'accounts', '{\"accounts\": [{\"id\": 1, "
              "\"owner\": \"Alice\"}, {\"id\": 2, \"owner\": \"Bob\"}]}')",
              "insert json {\"id\": 3, \"owner\": \"Charlie\"} into "
              "jn:doc('bank', 'accounts').accounts"],
       **{"assert": {"contains": ["Charlie"], "not_contains": ["Alice", "Bob"]}}),
    _c("ArchitectureDoc#getNodeKey", "ArchitectureDocQueryTest.java",
       "sdb:nodekey(jn:doc('mydb', 'myresource').field)", None,
       setup=["jn:store('mydb', 'myresource', '{\"field\": \"value\"}')"],
       **{"assert": "nonempty"}),
    _c("ArchitectureDoc#selectItemByNodeKey", "ArchitectureDocQueryTest.java",
       # legacy layout: the 'field' value node is key 3 (FUSED ? 2 : 3)
       "let $oldDoc := jn:doc('mydb', 'myresource', 1) "
       "return sdb:select-item($oldDoc, 3)",
       None,
       setup=["jn:store('mydb', 'myresource', '{\"field\": \"original\"}')",
              "replace json value of jn:doc('mydb', 'myresource').field "
              "with \"modified\""],
       **{"assert": ["original"]}),
    _c("ArchitectureDoc#crossRevisionComparison", "ArchitectureDocQueryTest.java",
       "for $p in jn:doc('shop', 'products', 1).products[] return $p.price",
       None,
       setup=["jn:store('shop', 'products', '{\"products\": [{\"id\": 1, "
              "\"name\": \"Widget\", \"price\": 100}, {\"id\": 2, \"name\": "
              "\"Gadget\", \"price\": 200}]}')",
              "replace json value of jn:doc('shop', 'products')"
              ".products[0].price with 120"],
       **{"assert": ["100"]}),
    _c("ArchitectureDoc#crossRevisionComparisonRev2",
       "ArchitectureDocQueryTest.java",
       "for $p in jn:doc('shop', 'products').products[] return $p.price",
       None,
       setup=["jn:store('shop', 'products', '{\"products\": [{\"id\": 1, "
              "\"name\": \"Widget\", \"price\": 100}, {\"id\": 2, \"name\": "
              "\"Gadget\", \"price\": 200}]}')",
              "replace json value of jn:doc('shop', 'products')"
              ".products[0].price with 120"],
       **{"assert": ["120"]}),
    _c("ArchitectureDoc#getRevision", "ArchitectureDocQueryTest.java",
       "sdb:revision(jn:doc('testdb', 'testres'))", None,
       setup=["jn:store('testdb', 'testres', '{\"data\": 1}')",
              "replace json value of jn:doc('testdb', 'testres').data with 2"],
       **{"assert": ["2"]}),
    _c("ArchitectureDoc#getTimestamp", "ArchitectureDocQueryTest.java",
       "sdb:timestamp(jn:doc('testdb', 'testres'))", None,
       setup=["jn:store('testdb', 'testres', '{\"data\": 1}')"],
       **{"assert": "nonempty"}),
    _c("ArchitectureDoc#jnPrevious", "ArchitectureDocQueryTest.java",
       "let $current := jn:doc('testdb', 'testres') "
       "let $prev := jn:previous($current) "
       "return {\"currentRev\": sdb:revision($current), \"prevRev\": sdb:revision($prev)}",
       None,
       setup=["jn:store('testdb', 'testres', '{\"value\": \"v1\"}')",
              "replace json value of jn:doc('testdb', 'testres').value "
              "with \"v2\""],
       **{"assert": ['"currentRev":2', '"prevRev":1']}),
    _c("ArchitectureDoc#jnNext", "ArchitectureDocQueryTest.java",
       "let $old := jn:doc('testdb', 'testres', 1) "
       "let $next := jn:next($old) "
       "return {\"oldRev\": sdb:revision($old), \"nextRev\": sdb:revision($next)}",
       None,
       setup=["jn:store('testdb', 'testres', '{\"value\": \"v1\"}')",
              "replace json value of jn:doc('testdb', 'testres').value "
              "with \"v2\""],
       **{"assert": ['"oldRev":1', '"nextRev":2']}),
    _c("ArchitectureDoc#firstExisting", "ArchitectureDocQueryTest.java",
       "sdb:revision(jn:first-existing(jn:doc('testdb', 'testres').items[1]))",
       None,
       setup=["jn:store('testdb', 'testres', '{\"items\": [1]}')",
              "insert json 2 into jn:doc('testdb', 'testres').items"],
       **{"assert": ["2"]}),
    _c("ArchitectureDoc#lastExisting", "ArchitectureDocQueryTest.java",
       "sdb:revision(jn:last-existing(jn:doc('testdb', 'testres', 1).items[1]))",
       None,
       setup=["jn:store('testdb', 'testres', '{\"items\": [1, 2]}')",
              "delete json jn:doc('testdb', 'testres').items[1]"],
       **{"assert": ["1"]}),
]

# ---------------------------------- jn/docs/UseCasesDocQueryTest
CASES += [
    _c("UseCasesDoc#openBitemporal", "UseCasesDocQueryTest.java",
       "jn:open-bitemporal('risk-db', 'exposures', "
       "xs:dateTime('2099-12-31T23:59:59Z'), xs:dateTime('2025-03-15T00:00:00Z'))",
       None, setup_py="usecases_exposures",
       **{"assert": {"contains": ["Globex", "Initech"], "not_contains": ["ACME"]}}),
    _c("UseCasesDoc#fraudDetection", "UseCasesDocQueryTest.java",
       "for $rev in jn:all-times(jn:doc('ledger', 'transactions')) "
       "for $r in $rev[] "
       "where sdb:timestamp($rev) gt sdb:valid-from($r) "
       "and sdb:timestamp($rev) - sdb:valid-from($r) gt xs:dayTimeDuration('P7D') "
       "return $r",
       None, setup_py="usecases_ledger",
       **{"assert": {"contains": ["TX-001", "TX-002"], "not_contains": ["TX-003"]}}),
    _c("UseCasesDoc#dateTimeArithGt", "UseCasesDocQueryTest.java",
       "xs:dateTime('2025-03-15T00:00:00Z') - xs:dateTime('2025-03-01T00:00:00Z') "
       "gt xs:dayTimeDuration('P7D')", "true"),
    _c("UseCasesDoc#dateTimeArithLt", "UseCasesDocQueryTest.java",
       "xs:dateTime('2025-03-04T00:00:00Z') - xs:dateTime('2025-03-01T00:00:00Z') "
       "gt xs:dayTimeDuration('P7D')", "false"),
    _c("UseCasesDoc#dateTimeArithExact", "UseCasesDocQueryTest.java",
       "xs:dateTime('2025-03-08T00:00:00Z') - xs:dateTime('2025-03-01T00:00:00Z') "
       "gt xs:dayTimeDuration('P7D')", "false"),
]

# ------------------------------------ jn/docs/ShellDemoQueryTest
_SHELL_STORE = (
    "jn:store('json-path1','products','[{\"name\":\"Laptop\",\"price\":999},"
    "{\"name\":\"Phone\",\"price\":699}]')"
)
_SHELL_UPDATE = (
    "let $doc := jn:doc('json-path1','products') "
    "return replace json value of $doc[0].price with 899"
)
_SHELL_APPEND = (
    "let $doc := jn:doc('json-path1','products') "
    "return append json {\"name\":\"Tablet\",\"price\":449} into $doc"
)
_SHELL_DELETE = (
    "let $doc := jn:doc('json-path1','products') return delete json $doc[1]"
)
_SHELL_DOC = "jn:doc('json-path1','products')"
CASES += [
    _c("ShellDemo#rev1", "ShellDemoQueryTest.java", _SHELL_DOC, None,
       setup=[_SHELL_STORE],
       **{"assert": ["Laptop", "999", "Phone", "699"]}),
    _c("ShellDemo#rev2", "ShellDemoQueryTest.java", _SHELL_DOC, None,
       setup=[_SHELL_STORE, _SHELL_UPDATE],
       **{"assert": ["899", "Laptop", "Phone"]}),
    _c("ShellDemo#rev3", "ShellDemoQueryTest.java", _SHELL_DOC, None,
       setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND],
       **{"assert": ["Tablet", "449"]}),
    _c("ShellDemo#rev4", "ShellDemoQueryTest.java", _SHELL_DOC, None,
       setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": {"contains": ["Laptop", "Tablet"], "not_contains": ["Phone"]}}),
    _c("ShellDemo#timeTravel", "ShellDemoQueryTest.java",
       "jn:doc('json-path1','products', 1)", None,
       setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": ["Laptop", "999", "Phone", "699"]}),
    # legacy keys: Laptop object = 2, its price VALUE node = 6 (the
    # primitive-replace keeps the key — setValue semantics)
    _c("ShellDemo#itemHistory", "ShellDemoQueryTest.java",
       "let $item := sdb:select-item(jn:doc('json-path1','products'), 6) "
       "for $v in sdb:item-history($item) "
       "return {\"rev\": sdb:revision($v), \"price\": $v}",
       None, setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": ["999", "899"]}),
    _c("ShellDemo#objectHistory", "ShellDemoQueryTest.java",
       "let $item := sdb:select-item(jn:doc('json-path1','products'), 2) "
       "for $v in sdb:item-history($item) "
       "return {\"rev\": sdb:revision($v), \"price\": $v.price}",
       None, setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": ["999", "899"]}),
    _c("ShellDemo#allTimes", "ShellDemoQueryTest.java",
       "for $v in jn:all-times(jn:doc('json-path1','products')) "
       "return {\"rev\": sdb:revision($v), \"products\": count($v[])}",
       None, setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": ['"rev":1', '"rev":4']}),
    _c("ShellDemo#diff", "ShellDemoQueryTest.java",
       "jn:diff('json-path1','products', 1, 4)", None,
       setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": "nonempty"}),
    _c("ShellDemo#smallDiff", "ShellDemoQueryTest.java",
       "jn:diff('json-path1','products', 1, 2)", None,
       setup=[_SHELL_STORE, _SHELL_UPDATE, _SHELL_APPEND, _SHELL_DELETE],
       **{"assert": "nonempty"}),
]

def _setup_diff_insert_record(spark, store):
    """jn/diff/DiffTest fallback+serializer tests: the standard
    fixture at 'shredded' plus insertObjectRecordAsFirstChild
    ("newKey": "newValue") committed as revision 2."""
    from sirix_spark.store.docwtx import DocWtx

    store.store("json-path1", "shredded", JSON)
    w = DocWtx(store, "json-path1", "shredded")
    w.move_to(1)
    w.insert_object_record_as_first_child("newKey", "newValue")
    w.commit()


SETUPS["diff_insert_record"] = _setup_diff_insert_record

# ------------------------------------------- jn/diff/DiffTest
CASES += [
    # the reference asserts the parsed diff: database/resource/
    # revision metadata plus EXACTLY one operation, an insert
    _c("DiffTest#computedDiffSingleInsert", "DiffTest.java",
       "jn:diff('json-path1','shredded',1,2)", None,
       setup_py="diff_insert_record",
       **{"assert": {
           "contains": ['"database":"json-path1"', '"resource":"shredded"',
                        '"old-revision":1', '"new-revision":2',
                        '"insert"', "newKey", "newValue"],
           "not_contains": ['"update"', '"delete"', '"replace"'],
       }}),
    _c("DiffTest#diffIsJsonNotQuotedString", "DiffTest.java",
       "jn:diff('json-path1','shredded',1,2)", None,
       setup_py="diff_insert_record",
       **{"assert": {"contains": ['{"database"'], "not_contains": ['\\"database\\"']}}),
]

# -------------------------------- function/xml/io temporal tests
CASES += [
    # reference starts the range at revision 1's own commit instant;
    # a far-past start bounds the same 5-revision count
    _c("XmlOpenRevisions#fiveRevisionsInRange", "OpenRevisionsTest.java",
       "count(xml:open-revisions('xml-db','resource', "
       "xs:dateTime('1900-01-01T00:00:00Z'), xs:dateTime('2200-05-01T00:00:00Z')))",
       "5", setup_py="xml_versioned"),
    _c("XmlDocByPointInTime#farFutureOpensLatest", "DocByPointInTimeTest.java",
       "sdb:revision(xml:open('xml-db','resource', xs:dateTime('2219-05-01T00:00:00')))",
       "5", setup_py="xml_versioned"),
    _c("XmlDoc#latestSerializes", "OpenRevisionsTest.java",
       "xml:doc('xml-db','resource')", None, setup_py="xml_versioned",
       **{"assert": ["fooooooo", "OOPS4!", "att=\"attval\""]}),
    _c("XmlDoc#revisionOneIsOriginal", "OpenRevisionsTest.java",
       "xml:doc('xml-db','resource', 1)", None, setup_py="xml_versioned",
       **{"assert": {"contains": ["oops1", "oops3"], "not_contains": ["OOPS4!"]}}),
]

# ----------------------- XPath path expressions over the XML store
# The reference compiles XQuery/XPath path syntax through Brackit over
# its node store (SirixCompileChain.java); the axis semantics and the
# expected nodeKey sets below are the reference's own cursor-level
# axis tests (bundles/sirix-core/src/test/java/io/sirix/axis/
# {Child,Descendant,Following,Preceding,FollowingSibling,
# PrecedingSibling,Ancestor,Parent,Self,Attribute}AxisTest.java) over
# XmlDocumentCreator's standard document, whose nodeKeys this repo's
# shredder reproduces (1=p:a 3=@i 4=oops1 5=b 6=foo 7=c 8=oops2 9=b
# 10=@p:x 11=c 12=bar 13=oops3). Path-expression results are in
# document order per the XQuery spec (the reference's reverse-axis
# cursors iterate reverse-document-order at the API level; Brackit
# path results re-sort to document order).
_XD1 = "xml:doc('xml-db','resource',1)"


def _xkeys(name, source, path, expected):
    return _c(
        f"XPath{name}", source,
        f"for $n in {_XD1}{path} return sdb:nodekey($n)",
        expected, setup_py="xml_versioned",
    )


CASES += [
    _xkeys("ChildAxis#atRootElement", "axis/ChildAxisTest.java",
           "/p:a/child::node()", "4 5 8 9 13"),
    _xkeys("ChildAxis#atFirstB", "axis/ChildAxisTest.java",
           "/p:a/b[1]/child::node()", "6 7"),
    _xkeys("ChildAxis#atTextIsEmpty", "axis/ChildAxisTest.java",
           "/p:a/text()[3]/child::node()", ""),
    _xkeys("DescendantAxis#fromDocRoot", "axis/DescendantAxisTest.java",
           "/descendant::node()", "1 4 5 6 7 8 9 11 12 13"),
    _xkeys("DescendantAxis#fromRootElement", "axis/DescendantAxisTest.java",
           "/p:a/descendant::node()", "4 5 6 7 8 9 11 12 13"),
    _xkeys("DescendantAxis#fromSecondB", "axis/DescendantAxisTest.java",
           "/p:a/b[2]/descendant::node()", "11 12"),
    _xkeys("DescendantOrSelf#includeSelf", "axis/DescendantAxisTest.java",
           "/p:a/descendant-or-self::node()", "1 4 5 6 7 8 9 11 12 13"),
    _xkeys("FollowingAxis#fromSecondC", "axis/FollowingAxisTest.java",
           "/p:a/b[2]/c/following::node()", "12 13"),
    _xkeys("FollowingAxis#fromFirstB", "axis/FollowingAxisTest.java",
           "/p:a/b[1]/following::node()", "8 9 11 12 13"),
    _xkeys("FollowingAxis#fromLastTextIsEmpty", "axis/FollowingAxisTest.java",
           "/p:a/text()[3]/following::node()", ""),
    _xkeys("PrecedingAxis#fromBarText", "axis/PrecedingAxisTest.java",
           "/p:a/b[2]/text()/preceding::node()", "4 5 6 7 8 11"),
    _xkeys("PrecedingAxis#fromFirstB", "axis/PrecedingAxisTest.java",
           "/p:a/b[1]/preceding::node()", "4"),
    _xkeys("PrecedingAxis#fromLastText", "axis/PrecedingAxisTest.java",
           "/p:a/text()[3]/preceding::node()", "4 5 6 7 8 9 11 12"),
    _xkeys("FollowingSibling#fromSecondB", "axis/FollowingSiblingAxisTest.java",
           "/p:a/b[2]/following-sibling::node()", "13"),
    _xkeys("FollowingSibling#fromFirstB", "axis/FollowingSiblingAxisTest.java",
           "/p:a/b[1]/following-sibling::node()", "8 9 13"),
    _xkeys("FollowingSibling#fromFirstText", "axis/FollowingSiblingAxisTest.java",
           "/p:a/text()[1]/following-sibling::node()", "5 8 9 13"),
    _xkeys("PrecedingSibling#fromBarText", "axis/PrecedingSiblingAxisTest.java",
           "/p:a/b[2]/text()/preceding-sibling::node()", "11"),
    _xkeys("PrecedingSibling#fromLastText", "axis/PrecedingSiblingAxisTest.java",
           "/p:a/text()[3]/preceding-sibling::node()", "4 5 8 9"),
    _xkeys("AncestorAxis#fromBarText", "axis/AncestorAxisTest.java",
           "/p:a/b[2]/text()/ancestor::*", "1 9"),
    _xkeys("AncestorAxis#fromFirstText", "axis/AncestorAxisTest.java",
           "/p:a/text()[1]/ancestor::*", "1"),
    _xkeys("AncestorOrSelf#fromSecondC", "axis/AncestorAxisTest.java",
           "/p:a/b[2]/c/ancestor-or-self::*", "1 9 11"),
    _xkeys("ParentAxis#fromFirstB", "axis/ParentAxisTest.java",
           "/p:a/b[1]/parent::node()", "1"),
    _xkeys("ParentAxis#fromAttribute", "axis/ParentAxisTest.java",
           "/p:a/b[2]/@p:x/parent::node()", "9"),
    # namespace declarations are NamespaceNodes in the reference,
    # excluded from AttributeAxis (AttributeAxisTest.java:57-69) —
    # the xmlns:p declaration on p:a therefore does NOT appear
    _xkeys("AttributeAxis#atRootElement", "axis/AttributeAxisTest.java",
           "/p:a/attribute::node()", "3"),
    _xkeys("AttributeAxis#atSecondB", "axis/AttributeAxisTest.java",
           "/p:a/b[2]/attribute::node()", "10"),
    _xkeys("SelfAxis#text", "axis/SelfAxisTest.java",
           "/p:a/text()[1]/self::node()", "4"),
    # ---- path predicates + serialization over the same document
    _c("XPathSerialize#subtreeWithNamespace", "node/SirixXMarkTest.java",
       f"{_XD1}/p:a/b[2]", '<b p:x="y"><c/>bar</b>',
       setup_py="xml_versioned"),
    _c("XPathPredicate#attributeEquals", "node/NodeAxisTest.java",
       f"{_XD1}//b[@p:x='y']/c", "<c/>", setup_py="xml_versioned"),
    _c("XPathPredicate#textEquals", "node/NodeAxisTest.java",
       f"{_XD1}//b[text()='foo']", "<b>foo<c/></b>", setup_py="xml_versioned"),
    _c("XPathPredicate#childElementExists", "node/NodeAxisTest.java",
       f"count({_XD1}//b[c])", "2", setup_py="xml_versioned"),
    _c("XPathPositional#lastB", "node/NodeAxisTest.java",
       f"{_XD1}/p:a/b[last()]/text()", "bar", setup_py="xml_versioned"),
    _c("XPathPositional#doubleSlashKeepsPerParentCounts", "node/NodeAxisTest.java",
       f"count({_XD1}//c[1])", "2", setup_py="xml_versioned"),
    _c("XPathAttribute#valueSerializes", "node/NodeAxisTest.java",
       f"{_XD1}/p:a/@i", "j", setup_py="xml_versioned"),
    # ---- path syntax over the versioned store (r5 has the two
    # inserted <a> children, oops1 renamed, oops3 removed — see
    # XmlDocumentCreator.createVersionedWithUpdatesAndDeletes)
    _c("XPathVersioned#oldRevisionKeepsOops3", "io/OpenRevisionsTest.java",
       f"{_XD1}/p:a/text()[3]", "oops3", setup_py="xml_versioned"),
    _c("XPathVersioned#latestTextRenamed", "io/OpenRevisionsTest.java",
       "xml:doc('xml-db','resource')/p:a/text()[1]", "fooooooo",
       setup_py="xml_versioned"),
    _c("XPathVersioned#insertedFirstChild", "io/OpenRevisionsTest.java",
       "xml:doc('xml-db','resource')/p:a/a[1]",
       '<a att="attval">OOPS4!</a>', setup_py="xml_versioned"),
    _c("XPathVersioned#countAcrossAllRevisions", "io/OpenRevisionsTest.java",
       "count(xml:open-revisions('xml-db','resource', "
       "xs:dateTime('1900-01-01T00:00:00Z'), "
       "xs:dateTime('2200-05-01T00:00:00Z'))//b)",
       "10", setup_py="xml_versioned"),
    # ---- XPath at EVERY explicit mid-revision (round-4 verdict #7:
    # the versioned-scan sweep covered xml: functions, not path
    # syntax; these pin path steps composed with revision selection)
    _c("XPathAtRevision#r2SingleInsertedA", "io/DocByPointInTime.java",
       "xml:doc('xml-db','resource',2)/p:a/a",
       '<a att="attval">OOPS4!</a>', setup_py="xml_versioned"),
    _c("XPathAtRevision#r3TwoInsertedAs", "io/DocByPointInTime.java",
       "count(xml:doc('xml-db','resource',3)/p:a/a)", "2",
       setup_py="xml_versioned"),
    _c("XPathAtRevision#r4TrailingTextRemoved", "io/DocByPointInTime.java",
       "count(xml:doc('xml-db','resource',4)/p:a/text())", "2",
       setup_py="xml_versioned"),
    _c("XPathAtRevision#r4StillOops1", "io/DocByPointInTime.java",
       "xml:doc('xml-db','resource',4)/p:a/text()[1]", "oops1",
       setup_py="xml_versioned"),
    _c("XPathAtRevision#r5Renamed", "io/DocByPointInTime.java",
       "xml:doc('xml-db','resource',5)/p:a/text()[1]", "fooooooo",
       setup_py="xml_versioned"),
    # 12 = p:a + inserted a + OOPS4! + oops1 + b + foo + c + oops2 +
    # b + c + bar + oops3 (descendant axis: elements + texts only —
    # attributes/namespaces are not descendants)
    _c("XPathAtRevision#descendantsAtR2", "io/DocByPointInTime.java",
       "count(xml:doc('xml-db','resource',2)//node())", "12",
       setup_py="xml_versioned"),
    # stable node identity through path syntax across revisions: the
    # r2-inserted <a> is keys 14-16; the r3 insert (17-19) lands
    # BEFORE it in document order (XmlDocumentCreator key constants)
    _c("XPathAtRevision#nodekeyOfInsertR2", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource',2)/p:a/a "
       "return sdb:nodekey($n)", "14", setup_py="xml_versioned"),
    _c("XPathAtRevision#nodekeysDocOrderR3", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource',3)/p:a/a "
       "return sdb:nodekey($n)", "17 14", setup_py="xml_versioned"),
    _c("XPathAtRevision#setValueKeepsKeyAcrossR4R5",
       "XmlDocumentCreator.java",
       "(for $n in xml:doc('xml-db','resource',4)/p:a/text()[1] "
       "return sdb:nodekey($n), "
       "for $n in xml:doc('xml-db','resource',5)/p:a/text()[1] "
       "return sdb:nodekey($n))", "4 4", setup_py="xml_versioned"),
    _c("XPathAtRevision#predicateAtRevision", "io/DocByPointInTime.java",
       "xml:doc('xml-db','resource',3)/p:a/b[@p:x='y']/text()", "bar",
       setup_py="xml_versioned"),
]

# ----------------- sirix-core XPath-engine tests (round-4 verdict #4
# mining: bundles/sirix-core/src/test/java/io/sirix/service/xml/
# xpath/XPathAxisTest.java — the reference's own XPath-expression
# engine over XmlDocumentCreator's standard document, keys 1..13).
# Context-node moves (holder.moveTo(K)) are expressed as the absolute
# path of node K; reverse-axis expectation arrays are re-sorted into
# document order (the test's cursor-level arrays iterate reverse
# document order; path results are document-ordered per spec).
_XPA = "xpath/XPathAxisTest.java"
_PA = _XD1 + "/p:a"
CASES += [
    # testSteps
    _xkeys("Expr#rootBChildren", _XPA, "/p:a/b", "5 9"),
    _xkeys("Expr#rootBCChildren", _XPA, "/p:a/b/c", "7 11"),
    _xkeys("Expr#rootOnly", _XPA, "/p:a", "1"),
    _xkeys("Expr#childAxisTwoSteps", _XPA, "/child::p:a/child::b", "5 9"),
    _xkeys("Expr#childAxisThreeSteps", _XPA,
           "/child::p:a/child::b/child::c", "7 11"),
    # testAttributes
    _xkeys("Expr#predAttrExists", _XPA, "/p:a[@i]", "1"),
    _xkeys("Expr#attrStep", _XPA, "/p:a/@i", "3"),
    _xkeys("Expr#attrOfAttrEmpty", _XPA, "/p:a/@i/@*", ""),
    _xkeys("Expr#bWithPxAttr", _XPA, "/p:a/b[@p:x]", "9"),
    _xkeys("Expr#predText", _XPA, "/p:a[text()]", "1"),
    _xkeys("Expr#predElement", _XPA, "/p:a[element()]", "1"),
    _xkeys("Expr#predNodeText", _XPA, "/p:a[node()/text()]", "1"),
    _xkeys("Expr#predSelfNode", _XPA, "/p:a[./node()]", "1"),
    _xkeys("Expr#predThreeDeepEmpty", _XPA,
            "/p:a[./node()/node()/node()]", ""),
    _xkeys("Expr#predAbsDescElement", _XPA, "/p:a[//element()]", "1"),
    _xkeys("Expr#predAbsTextEmpty", _XPA, "/p:a[/text()]", ""),
    _xkeys("Expr#constLt", _XPA, "/p:a[16<65]", "1"),
    _xkeys("Expr#constGe", _XPA, "/p:a[13>=4]", "1"),
    _xkeys("Expr#constGeDecimal", _XPA, "/p:a[13.0>=4]", "1"),
    _xkeys("Expr#constEq", _XPA, "/p:a[4 = 4]", "1"),
    _xkeys("Expr#constEqFalse", _XPA, "/p:a[3=4]", ""),
    _xkeys("Expr#constDecimalNe", _XPA, "/p:a[3.2 = 3.22]", ""),
    # 3.2 + 0.02 = 3.22 holds in xs:decimal arithmetic (XPath 2.0
    # number-with-dot literals are decimals), not binary doubles
    _xkeys("Expr#constDecimalAddExact", _XPA,
           "/p:a[(3.2 + 0.02) = 3.22]", "1"),
    _xkeys("Expr#attrValueEq", _XPA, '/p:a[@i = "j"]', "1"),
    _xkeys("Expr#dosNodeAttrEq", _XPA,
           '/descendant-or-self::node()[@p:x = "y"]', "9"),
    _xkeys("Expr#attrValueMiss", _XPA, '/p:a[@i="k"]', ""),
    _xkeys("Expr#bAttrValueEq", _XPA, '/p:a/b[@p:x="y"]', "9"),
    # testNodeTests
    _xkeys("Expr#paNodeChildren", _XPA, "/p:a/node()", "4 5 8 9 13"),
    _xkeys("Expr#paTextChildren", _XPA, "/p:a/text()", "4 8 13"),
    _xkeys("Expr#paBTextChildren", _XPA, "/p:a/b/text()", "6 12"),
    _xkeys("Expr#paBNodeChildren", _XPA, "/p:a/b/node()", "6 7 11 12"),
    # testDescendant
    _xkeys("Expr#paDescB", _XPA, "/p:a//b", "5 9"),
    _xkeys("Expr#descPa", _XPA, "//p:a", "1"),
    _xkeys("Expr#dosPa", _XPA, "/descendant-or-self::p:a", "1"),
    _xkeys("Expr#paDosB", _XPA, "/p:a/descendant-or-self::b", "5 9"),
    _xkeys("Expr#paDescAxisB", _XPA, "/p:a/descendant::b", "5 9"),
    _xkeys("Expr#paDescPaEmpty", _XPA, "/p:a/descendant::p:a", ""),
    # testAncestor (context 11 = /p:a/b[2]/c, context 13 = 3rd text)
    _xkeys("Expr#ancestorPaFromC2", _XPA, "/p:a/b[2]/c/ancestor::p:a", "1"),
    _xkeys("Expr#ancestorPaFromText3", _XPA,
           "/p:a/text()[3]/ancestor::p:a", "1"),
    _xkeys("Expr#ancestorNodeFromC2", _XPA,
           "/p:a/b[2]/c/ancestor::node()", "1 9"),
    _xkeys("Expr#ancestorOrSelfFromC2", _XPA,
           "/p:a/b[2]/c/ancestor-or-self::node()", "1 9 11"),
    # testParent
    _xkeys("Expr#parentPaFromB2", _XPA, "/p:a/b[2]/parent::p:a", "1"),
    _xkeys("Expr#parentBFromC2", _XPA, "/p:a/b[2]/c/parent::b", "9"),
    _xkeys("Expr#parentNodeFromC2", _XPA,
           "/p:a/b[2]/c/parent::node()", "9"),
    _xkeys("Expr#parentNodeFromText3", _XPA,
           "/p:a/text()[3]/parent::node()", "1"),
    # testPreceding
    _xkeys("Expr#precedingSiblingFromText3", _XPA,
           "/p:a/text()[3]/preceding-sibling::node()", "4 5 8 9"),
    # testSelf
    _xkeys("Expr#selfPa", _XPA, "/p:a/self::p:a", "1"),
    _xkeys("Expr#selfBFromB2", _XPA, "/p:a/b[2]/self::b", "9"),
    _xkeys("Expr#dotNodeFromC2Empty", _XPA, "/p:a/b[2]/c/./node()", ""),
    _xkeys("Expr#selfNodeFromC2", _XPA, "/p:a/b[2]/c/self::node()", "11"),
    _xkeys("Expr#dotBNode", _XPA, "/p:a/./b/node()", "6 7 11 12"),
    # testDupElemination
    _xkeys("Expr#childParentDedup", _XPA,
           "/p:a/child::node()/parent::node()", "1"),
    # testUnabbreviate (context node 1 = /p:a)
    _xkeys("Expr#childStar", _XPA, "/p:a/child::*", "5 9"),
    _xkeys("Expr#childTextUnabbr", _XPA, "/p:a/child::text()", "4 8 13"),
    _xkeys("Expr#attributeAxisI", _XPA, "/p:a/attribute::i", "3"),
    _xkeys("Expr#attributeAxisStar", _XPA, "/p:a/attribute::*", "3"),
    _xkeys("Expr#selfBlauEmpty", _XPA, "/p:a/self::blau", ""),
    _xkeys("Expr#bAttrAxisPred", _XPA,
           '/p:a/child::b[attribute::p:x = "y"]', "9"),
    _xkeys("Expr#bChildCPred", _XPA, "/p:a/child::b[child::c]", "5 9"),
    _xkeys("Expr#starTextOrC", _XPA, "/p:a/child::*[text() or c]", "5 9"),
    # testMultiExpr: comma sequences concatenate WITHOUT dedup across
    # branches (XQuery sequence semantics; only per-path steps dedup)
    _c("XPathExpr#multiBBB", _XPA,
       f"for $n in ({_PA}/b, {_PA}/b, {_PA}/b) return sdb:nodekey($n)",
       "5 9 5 9 5 9", setup_py="xml_versioned"),
    _c("XPathExpr#multiMixed", _XPA,
       f"for $n in ({_PA}/b/c, {_PA}, {_XD1}//c) return sdb:nodekey($n)",
       "7 11 1 7 11", setup_py="xml_versioned"),
    # the test's middle expectation (4 8 13 6 12) is the legacy
    # cursor's step-nesting order for //text(); XPath 2.0 path
    # results are document order (4 6 8 12 13) — re-sorted like the
    # reverse-axis arrays above
    _c("XPathExpr#multiTextsAndElements", _XPA,
       f"for $n in ({_PA}/b/text(), {_XD1}//text(), "
       f"{_XD1}/descendant-or-self::element()) return sdb:nodekey($n)",
       "6 12 4 6 8 12 13 1 5 7 9 11", setup_py="xml_versioned"),
    # original context = node 5 (first b): '/p:a/b/c, ., .., .//text()'
    _c("XPathExpr#multiFromFirstB", _XPA,
       f"for $n in ({_XD1}/p:a/b/c, {_PA}/b[1], "
       f"{_PA}/b[1]/parent::node(), {_PA}/b[1]//text()) "
       "return sdb:nodekey($n)",
       "7 11 5 1 6", setup_py="xml_versioned"),
    _c("XPathExpr#multiUnabbrAbs", _XPA,
       f"for $n in ({_PA}/child::*[text() or c], {_XD1}/node(), "
       f"{_XD1}//c) return sdb:nodekey($n)",
       "5 9 1 7 11", setup_py="xml_versioned"),
    # testCount
    _c("XPathExpr#countAllNodes", _XPA,
       f"fn:count({_XD1}//node())", "10", setup_py="xml_versioned"),
    # testAttributes' value-comparison checker ("descendant-or-self::
    # node()/@p:x = 'y'" is true): pinned as the count of matching
    # nodes (existential semantics made explicit)
    _c("XPathExpr#attrGeneralCompare", _XPA,
       f"fn:count({_XD1}/descendant-or-self::node()[@p:x = 'y'])",
       "1", setup_py="xml_versioned"),
]

# ----- xpath/expr/{Union,Intersect,Except}AxisTest.java: the node-set
# operators. The tests' expectation arrays are cursor evaluation
# order; XPath 2.0 set-op results are document order with duplicates
# eliminated (spec 3.3.3) — arrays re-sorted accordingly. Context
# node 1 is expressed as the absolute path /p:a.
_XSU = "xpath/expr/UnionAxisTest.java"
_XSI = "xpath/expr/IntersectAxisTest.java"
_XSE = "xpath/expr/ExceptAxisTest.java"


def _xset(name, source, expr, expected):
    return _c(
        f"XPathSetOp{name}", source,
        f"for $n in ({expr}) return sdb:nodekey($n)",
        expected, setup_py="xml_versioned",
    )


CASES += [
    _xset("#unionKeyword", _XSU,
          f"{_PA}/child::node()/parent::node() union {_PA}/child::node()",
          "1 4 5 8 9 13"),
    _xset("#unionBar", _XSU,
          f"{_PA}/child::node()/parent::node() | {_PA}/child::node()",
          "1 4 5 8 9 13"),
    _xset("#unionThreeWay", _XSU,
          f"{_PA}/child::node()/parent::node() | {_PA}/child::node() "
          f"| {_PA}/self::node()",
          "1 4 5 8 9 13"),
    # parent::node() of the root element is the document node (key 0)
    _xset("#unionWithDocumentNode", _XSU,
          f"{_PA}/child::node()/parent::node() | {_PA}/child::node() "
          f"| {_PA}/self::node() union {_PA}/parent::node()",
          "0 1 4 5 8 9 13"),
    _xset("#unionMixedAxes", _XSU,
          f"{_PA}/b/preceding::node() union {_PA}/text() "
          f"| {_PA}/descendant::node()",
          "4 5 6 7 8 9 11 12 13"),
    _xset("#unionAncestorsAllNodes", _XSU,
          f"{_XD1}//c/ancestor::node() | {_XD1}//node()",
          "1 4 5 6 7 8 9 11 12 13"),
    _xset("#intersectChildB", _XSI,
          f"{_PA}/child::node() intersect {_PA}/b", "5 9"),
    _xset("#intersectThreeWay", _XSI,
          f"{_PA}/child::node() intersect {_PA}/b intersect "
          f"{_PA}/child::node()[@p:x]", "9"),
    _xset("#intersectAttrAxisPred", _XSI,
          f"{_PA}/child::node() intersect "
          f"{_PA}/child::node()[attribute::p:x]", "9"),
    _xset("#intersectParentSelf", _XSI,
          f"{_PA}/child::node()/parent::node() intersect "
          f"{_PA}/self::node()", "1"),
    _xset("#intersectAllTexts", _XSI,
          f"{_XD1}//node() intersect {_XD1}//text()", "4 6 8 12 13"),
    _xset("#intersectPrecedingTexts", _XSI,
          f"{_PA}/b/preceding::node() intersect {_PA}/text()", "4 8"),
    _xset("#exceptChildB", _XSE,
          f"{_PA}/child::node() except {_PA}/b", "4 8 13"),
    _xset("#exceptAttrPred", _XSE,
          f"{_PA}/child::node() except "
          f"{_PA}/child::node()[attribute::p:x]", "4 5 8 13"),
    _xset("#exceptSelfEmpty", _XSE,
          f"{_PA}/child::node()/parent::node() except {_PA}/self::node()",
          ""),
    _xset("#exceptTexts", _XSE,
          f"{_XD1}//node() except {_XD1}//text()", "1 5 7 9 11"),
    _xset("#exceptPrecedingTexts", _XSE,
          f"{_PA}/b/preceding::node() except {_PA}/text()", "5 6 7"),
]

# ----- xpath/expr boolean / conditional / quantified tests. The
# idiv-by-zero pair (AndExprTest axis5/axis6) is omitted: the
# reference short-circuits `false and (3 idiv 0 = 1)` while Spark's
# ANSI mode raises eagerly on both — XQuery 1.0 §3.8.1 allows either
# evaluation strategy, so only the error-or-false split differs.


def _xb(name, source, expr, expected):
    return _c(f"XPathBool{name}", source, expr, expected,
              setup_py="xml_versioned")


CASES += [
    _xb("#andNodesTrue", "xpath/expr/AndExprTest.java",
        f"{_PA}/text() and {_PA}/node()", "true"),
    _xb("#andNodesFalse", "xpath/expr/AndExprTest.java",
        f"{_PA}/comment() and {_PA}/node()", "false"),
    _xb("#andValuesTrue", "xpath/expr/AndExprTest.java",
        "1 eq 1 and 2 eq 2", "true"),
    _xb("#andValuesFalse", "xpath/expr/AndExprTest.java",
        "1 eq 1 and 2 eq 3", "false"),
    _xb("#orNodesTrue", "xpath/expr/OrExprTest.java",
        f"{_PA}/text() or {_PA}/node()", "true"),
    _xb("#orNodesMixed", "xpath/expr/OrExprTest.java",
        f"{_PA}/comment() or {_PA}/node()", "true"),
    _xb("#orValuesTrue", "xpath/expr/OrExprTest.java",
        "1 eq 1 or 2 eq 2", "true"),
    _xb("#orValuesMixed", "xpath/expr/OrExprTest.java",
        "1 eq 1 or 2 eq 3", "true"),
    _xb("#generalEqDecimal", "xpath/expr/CompAxisTest.java",
        "1.0 = 1.0", "true"),
    _xb("#generalLtSequences", "xpath/expr/CompAxisTest.java",
        "(1, 2, 3) < (2, 3)", "true"),
    _xb("#generalGtSequencesFalse", "xpath/expr/CompAxisTest.java",
        "(1, 2, 3) > (3, 4)", "false"),
    # IfAxisTest (context node 1): branches are node sequences
    _xb("#ifTextThenSelf", "xpath/expr/IfAxisTest.java",
        f"for $n in (if ({_PA}/text()) then {_PA}/self::node() "
        f"else {_PA}/child::node()) return sdb:nodekey($n)", "1"),
    _xb("#ifNodeThenSelf", "xpath/expr/IfAxisTest.java",
        f"for $n in (if ({_PA}/node()) then {_PA}/self::node() "
        f"else {_PA}/child::node()) return sdb:nodekey($n)", "1"),
    _xb("#ifNoPiElseChildren", "xpath/expr/IfAxisTest.java",
        f"for $n in (if ({_PA}/processing-instruction()) "
        f"then {_PA}/self::node() "
        f"else {_PA}/child::node()) return sdb:nodekey($n)",
        "4 5 8 9 13"),
    # Some/EveryExprTest ('attribute::attribute()' = any attribute,
    # expressed as @*)
    _xb("#someChildHasI", "xpath/expr/SomeExprTest.java",
        f"some $c in {_XD1}/node() satisfies $c/@i", "true"),
    _xb("#someChildHasAbc", "xpath/expr/SomeExprTest.java",
        f"some $c in {_XD1}/node() satisfies $c/@abc", "false"),
    _xb("#someGrandchildHasAttr", "xpath/expr/SomeExprTest.java",
        f"some $c in {_PA}/node() satisfies $c/@*", "true"),
    _xb("#everyChildHasI", "xpath/expr/EveryExprTest.java",
        f"every $c in {_XD1}/node() satisfies $c/@i", "true"),
    _xb("#everyChildHasAbc", "xpath/expr/EveryExprTest.java",
        f"every $c in {_XD1}/node() satisfies $c/@abc", "false"),
    _xb("#everyElementHasAttr", "xpath/expr/EveryExprTest.java",
        f"every $c in {_PA}/child::element() satisfies $c/@*", "false"),
    _xb("#everyElementHasC", "xpath/expr/EveryExprTest.java",
        f"every $c in {_PA}/child::element() satisfies $c/child::c",
        "true"),
    # FunctionAxisTest
    _xb("#fnCountTexts", "xpath/FunctionsTest.java",
        f"fn:count({_PA}/text())", "3"),
    # the value is the attribute's string-value "j"; string ATOMICS
    # now print RAW (round-7 Brackit StringSerializer parity —
    # NativeImageSmoke goldens; XML node items printed raw already)
    _xb("#fnStringAttr", "xpath/expr/FunctionAxisTest.java",
        f"fn:string({_PA}/attribute::*)", "j"),
]

# ----- xpath/expr/InstanceOfExprTest + CastableExprTest (the XQuery
# sequence-type / castable surface — round-4 verdict "what's missing"
# #1). The '10.0 castable as xs:anyAtomicType' case is XPST0080 in
# the reference and fail-closed (raises) here — not pinnable as a
# string output.
CASES += [
    _c("XPathType#intInstanceOfInteger",
       "xpath/expr/InstanceOfExprTest.java",
       "1 instance of xs:integer", "true"),
    _c("XPathType#stringNotInteger", "xpath/expr/InstanceOfExprTest.java",
       '"hallo" instance of xs:integer', "false"),
    _c("XPathType#stringOptional", "xpath/expr/InstanceOfExprTest.java",
       '"hallo" instance of xs:string ?', "true"),
    _c("XPathType#stringOneOrMore", "xpath/expr/InstanceOfExprTest.java",
       '"hallo" instance of xs:string +', "true"),
    _c("XPathType#stringZeroOrMore", "xpath/expr/InstanceOfExprTest.java",
       '"hallo" instance of xs:string *', "true"),
    _c("XPathType#pairNotSingleInteger",
       "xpath/expr/InstanceOfExprTest.java",
       "(1, 2) instance of xs:integer", "false"),
    _c("XPathType#pairOneOrMoreIntegers",
       "xpath/expr/InstanceOfExprTest.java",
       "(1, 2) instance of xs:integer +", "true"),
    _c("XPathType#intCastableDecimal", "xpath/expr/CastableExprTest.java",
       "1 castable as xs:decimal", "true"),
    _c("XPathType#stringCastableString",
       "xpath/expr/CastableExprTest.java",
       '"hello" castable as xs:string', "true"),
    _c("XPathType#helloNotCastableDecimal",
       "xpath/expr/CastableExprTest.java",
       '"hello" castable as xs:decimal', "false"),
]

# ----- xpath/FunctionsTest.java (query-surface fn: calls over the
# standard document; string ATOMICS serialize JSON-quoted, element
# items serialize as subtree XML without inherited xmlns
# declarations — both conventions documented above. Omitted legacy
# quirks: fn:sum(5)="1", fn:empty(/p:a)="true", fn:string over a
# two-node sequence — XPath 2.0 contradicts the legacy engine there.)
_XFT = "xpath/FunctionsTest.java"
CASES += [
    _c("XPathFn#booleanZero", _XFT, "fn:boolean(0)", "false"),
    _c("XPathFn#booleanOne", _XFT, "boolean(1)", "true"),
    _c("XPathFn#countDescendantPaB", _XFT,
       f"fn:count({_XD1}//p:a/b)", "2", setup_py="xml_versioned"),
    _c("XPathFn#commentSyntax", _XFT, "2 (: this is a comment :)", "2"),
    _xkeys("Fn#predNodeNode", _XFT, "/p:a[./node()/node()]", "1"),
    _xkeys("Fn#predSelfText", _XFT, "/p:a[./text()]", "1"),
    _c("XPathFn#notDescendantB", _XFT,
       f"fn:not({_XD1}//b)", "false", setup_py="xml_versioned"),
    _c("XPathFn#maxLiterals", _XFT, "fn:max((2, 1, 5, 4, 3))", "5"),
    _c("XPathFn#minLiterals", _XFT, "fn:min((2, 1, 5, 4, 3))", "1"),
    _c("XPathFn#existsLiterals", _XFT,
       "fn:exists(('a', 'b', 'c'))", "true"),
    _c("XPathFn#substringAfter", _XFT,
       'fn:substring-after("query", "u")', 'ery'),
    _c("XPathFn#substringBefore", _XFT,
       'fn:substring-before("query", "r")', 'que'),
    _c("XPathFn#numberFromString", _XFT, "fn:number('29.99')", "29.99"),
    _c("XPathFn#distinctValues", _XFT,
       "fn:distinct-values(('a', 'a'))", "a"),
    _c("XPathFn#lastB", _XFT, f"{_XD1}//b[last()]",
       '<b p:x="y"><c/>bar</b>', setup_py="xml_versioned"),
    _c("XPathFn#oneOrMoreNodes", _XFT,
       f"fn:one-or-more({_XD1}//b/c)", "<c/><c/>",
       setup_py="xml_versioned"),
    _c("XPathFn#exactlyOneString", _XFT,
       'fn:exactly-one("a")', 'a'),
    _c("XPathFn#zeroOrOneString", _XFT,
       'fn:zero-or-one("a")', 'a'),
]

# ----- xpath/filter/DubFilterTest.java (duplicate elimination across
# multi-step paths; reverse-axis arrays re-sorted to document order)
CASES += [
    _xkeys("Dub#followingSiblingsOfBs", "xpath/filter/DubFilterTest.java",
           "/p:a/b/following-sibling::node()", "8 9 13"),
    _xkeys("Dub#precedingOfBs", "xpath/filter/DubFilterTest.java",
           "/p:a/b/preceding::node()", "4 5 6 7 8"),
    _xkeys("Dub#ancestorsOfCs", "xpath/filter/DubFilterTest.java",
           "//c/ancestor::node()", "1 5 9"),
]

# ------------------- XmlWtx keyed write transactions (XmlNodeTrx)
# The versioned fixture above is now BUILT through the keyed write
# transaction (store/xmlwtx.py), replicating XmlNodeTrxImpl's key
# allocation: inserted <a att>OOPS4!</a> subtrees draw 14-16 and
# 17-19 in pre-order, removals never free keys, setValue keeps the
# node's key. These cases assert the reference's key constants
# through the query surface.
CASES += [
    _c("XmlWtx#insertedElementsDrawFreshKeys", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource')/p:a/a return sdb:nodekey($n)",
       "17 14", setup_py="xml_versioned"),
    _c("XmlWtx#attributeKeysFollowElement", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource')/p:a/a/@att return sdb:nodekey($n)",
       "18 15", setup_py="xml_versioned"),
    _c("XmlWtx#setValueKeepsNodeKey", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource')/p:a/text()[1] "
       "return sdb:nodekey($n)",
       "4", setup_py="xml_versioned"),
    _c("XmlWtx#untouchedSubtreeKeysStable", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource')//b/descendant-or-self::node() "
       "return sdb:nodekey($n)",
       "5 6 7 9 11 12", setup_py="xml_versioned"),
    _c("XmlWtx#removedTextGoneFromLatest", "XmlDocumentCreator.java",
       "count(xml:doc('xml-db','resource')/p:a/text()[3])",
       "0", setup_py="xml_versioned"),
    _c("XmlWtx#revisionOneKeysAreOriginal", "XmlDocumentCreator.java",
       "for $n in xml:doc('xml-db','resource',1)/p:a/child::node() "
       "return sdb:nodekey($n)",
       "4 5 8 9 13", setup_py="xml_versioned"),
    _c("XmlWtx#insertedTextSerializes", "XmlDocumentCreator.java",
       "xml:doc('xml-db','resource')/p:a/a[1]/text()",
       "OOPS4!", setup_py="xml_versioned"),
]

# -------------------- xml: io/trx function surface (XMLFun.java)
# xml:store / xml:load (io/Store.java, io/Load.java) create versioned
# resources through the keyed write trx; attribute-count /
# namespace-count (trx/Get{Attribute,Namespace}Count.java) lower to
# the attribute axis; xml:sort (index/SortByDocOrder.java) is the
# identity on path results (always document-ordered here). The
# reference ships no query-level tests for these — assertions mirror
# the function javadocs over the standard document.
CASES += [
    _c("XmlStore#roundTrips", "io/Store.java",
       "xml:doc('xml-db2','stored')", '<r a="1">t<s/></r>',
       setup=["xml:store('xml-db2','stored','<r a=\"1\">t<s/></r>')"]),
    _c("XmlStore#replacesExisting", "io/Store.java",
       "xml:doc('xml-db2','stored')", "<q/>",
       setup=["xml:store('xml-db2','stored','<r a=\"1\">t<s/></r>')",
              "xml:store('xml-db2','stored','<q/>')"]),
    _c("XmlAttributeCount#onRootElement", "trx/GetAttributeCount.java",
       "xml:attribute-count(xml:doc('xml-db','resource',1)/p:a)", "1",
       setup_py="xml_versioned"),
    _c("XmlNamespaceCount#onRootElement", "trx/GetNamespaceCount.java",
       "xml:namespace-count(xml:doc('xml-db','resource',1)/p:a)", "1",
       setup_py="xml_versioned"),
    _c("XmlAttributeCount#zeroOnPlainElement", "trx/GetAttributeCount.java",
       "xml:attribute-count(xml:doc('xml-db','resource',1)//b[1])", "0",
       setup_py="xml_versioned"),
    # adjacent element items serialize with NO separator — the XQuery
    # serialization rule the reference's own XMark goldens pin
    # (src/test/resources/xmark/results/q02.out: <increase>…</increase>
    # elements abut; a space separates only adjacent atomics)
    _c("XmlSort#identityOnDocOrder", "index/SortByDocOrder.java",
       "xml:sort(xml:doc('xml-db','resource',1)//c)", "<c/><c/>",
       setup_py="xml_versioned"),
]

# ------------------- scan/ numeric-edge semantics (vectorized-path
# differential tests — the reference asserts its column path agrees
# with its record path; here both reduce to the one Spark plan, and
# the extracted invariant is the record-path COUNT)
_DBQ = ("count(for $u in jn:doc('decimal-bound-db','records.jn')[] "
        "where {} return $u)")
_DCQ = ("count(for $u in jn:doc('decimal-collision-db','{}')[] "
        "where {} return $u)")
CASES += [
    _c("DecimalBoundSaturation#highUpperBoundLe", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price le 100000000000.5"), "2000", setup_py="decimal_bound"),
    _c("DecimalBoundSaturation#highUpperBoundLt", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price lt 100000000000.5"), "2000", setup_py="decimal_bound"),
    _c("DecimalBoundSaturation#lowLowerBoundGe", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price ge -100000000000.5"), "2000", setup_py="decimal_bound"),
    _c("DecimalBoundSaturation#lowLowerBoundGt", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price gt -100000000000.5"), "2000", setup_py="decimal_bound"),
    _c("DecimalBoundSaturation#unsatisfiableGe", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price ge 100000000000.5"), "0", setup_py="decimal_bound"),
    _c("DecimalBoundSaturation#unsatisfiableLe", "scan/DecimalBoundSaturationTest.java",
       _DBQ.format("$u.price le -100000000000.5"), "0", setup_py="decimal_bound"),
    _c("DecimalDoubleCollision#collidingNotMiscounted",
       "scan/DecimalDoubleCollisionTest.java",
       _DCQ.format("records.jn", "$u.price gt 1000.25"), "2000",
       setup_py="decimal_collision"),
    _c("DecimalDoubleCollision#mixedExactInexactAgree",
       "scan/DecimalDoubleCollisionTest.java",
       _DCQ.format("mixed.jn", "$u.price gt 1000.25"), "1000",
       setup_py="decimal_collision"),
    _c("DecimalDoubleCollision#mixedTagEquality",
       "scan/DecimalDoubleCollisionTest.java",
       _DCQ.format("mixed.jn", "$u.price eq 1000.25000000000001"), "1000",
       setup_py="decimal_collision"),
]

_VQ = ("count(for $u in jn:doc('versioned-scan-db','records.jn'{}) "
       "[] where {} return $u)")
CASES += [
    # scan/VersioningColumnScanTest, compacted: after an update
    # revision writes the non-dyadic decimal 2100.55 onto every fifth
    # record, inexact thresholds must count exactly at BOTH revisions
    _c("VersioningScan#updatedRowsAboveInexactThreshold",
       "scan/VersioningColumnScanTest.java",
       _VQ.format("", "$u.year gt 2100.54"), "100",
       setup_py="versioned_years"),
    _c("VersioningScan#geExactUpdatedValue",
       "scan/VersioningColumnScanTest.java",
       _VQ.format("", "$u.year ge 2100.55"), "100",
       setup_py="versioned_years"),
    _c("VersioningScan#untouchedRowsBelow",
       "scan/VersioningColumnScanTest.java",
       _VQ.format("", "$u.year lt 2100.55"), "400",
       setup_py="versioned_years"),
    _c("VersioningScan#revisionOneUnchanged",
       "scan/VersioningColumnScanTest.java",
       _VQ.format(",1", "$u.year gt 2100.54"), "0",
       setup_py="versioned_years"),
    _c("VersioningScan#revisionOneFullCount",
       "scan/VersioningColumnScanTest.java",
       _VQ.format(",1", "$u.year gt 1990.55"), "483",
       setup_py="versioned_years"),
]

_DDQ = ("count(for $u in jn:doc('decimal-disjunction-db','records.jn')[] "
        "where {} return $u)")
CASES += [
    # scan/DecimalDisjunctionSoundnessTest: an inexact decimal
    # threshold (19.750000000000000001 — above 19.75 in decimal
    # space, EQUAL to it as a double) must compare in decimal space
    _c("DecimalDisjunction#inexactBranchNotDoubleImage",
       "scan/DecimalDisjunctionSoundnessTest.java",
       _DDQ.format("$u.price lt 19.750000000000000001 or $u.price gt 500.05"),
       "1000", setup_py="decimal_disjunction"),
    _c("DecimalDisjunction#singleIntervalAgrees",
       "scan/DecimalDisjunctionSoundnessTest.java",
       _DDQ.format("$u.price lt 19.750000000000000001"),
       "1000", setup_py="decimal_disjunction"),
    _c("DecimalDisjunction#exactThresholdStillAnswered",
       "scan/DecimalDisjunctionSoundnessTest.java",
       _DDQ.format("$u.price lt 19.875 or $u.price gt 500.5"),
       "1000", setup_py="decimal_disjunction"),
]

CASES += [
    # scan/FpCmpIntegralRewriteTest invariants at the query level:
    # integral columns against fractional / huge / exact thresholds
    _c("FpCmpIntegral#fractionalEqualityUnsatisfiable",
       "scan/FpCmpIntegralRewriteTest.java",
       _DBQ.format("$u.id eq 10.5"), "0", setup_py="decimal_bound"),
    _c("FpCmpIntegral#fractionalLtSplitsBelow",
       "scan/FpCmpIntegralRewriteTest.java",
       _DBQ.format("$u.id lt 10.5"), "11", setup_py="decimal_bound"),
    _c("FpCmpIntegral#exactBoundaryGe",
       "scan/FpCmpIntegralRewriteTest.java",
       _DBQ.format("$u.id ge 1999"), "1", setup_py="decimal_bound"),
    _c("FpCmpIntegral#hugeThresholdAdmitsAll",
       "scan/FpCmpIntegralRewriteTest.java",
       _DBQ.format("$u.id le 1.0e18"), "2000", setup_py="decimal_bound"),
]

_NQ = "count(for $u in jn:doc('nested-db','records.jn')[] where {} return $u)"
CASES += [
    # scan/NestedSameNamePathScopingTest: nested pet.age / pet.dept
    # share names with the top-level columns and must not leak into
    # top-level predicates; expected counts derive from the exact
    # fixture (java.util.Random(0xABCDEF) replica)
    _c("NestedSameNameScoping#topAgeGt40", "scan/NestedSameNamePathScopingTest.java",
       _NQ.format("$u.age gt 40"), _NSN_AGE40, setup_py="nested_same_name"),
    _c("NestedSameNameScoping#topAgeGt40AndActive",
       "scan/NestedSameNamePathScopingTest.java",
       _NQ.format("$u.age gt 40 and $u.active"), _NSN_AGE40_ACTIVE,
       setup_py="nested_same_name"),
    _c("NestedSameNameScoping#topDeptEqEng",
       "scan/NestedSameNamePathScopingTest.java",
       _NQ.format('$u.dept eq "Eng"'), _NSN_ENG,
       setup_py="nested_same_name"),
    # scan/TypedGroupByDifferentialTest "mix": numerically equal
    # spellings 18 / 18.0e0 / 18.00 are ONE group under XQuery eq
    _c("TypedGroupBy#mixedSpellingsMergeGroups",
       "scan/TypedGroupByDifferentialTest.java",
       "for $i in jn:doc('json-path1','mix.jn')[] let $k := $i.m "
       "group by $k order by $k return count($i)",
       "3 1",
       setup=["jn:store('json-path1','mix.jn',"
              "'[{\"m\":18},{\"m\":18.0e0},{\"m\":18.00},{\"m\":19}]')"]),
    _c("TypedGroupBy#mergedKeyIsCanonical",
       "scan/TypedGroupByDifferentialTest.java",
       "for $i in jn:doc('json-path1','mix.jn')[] let $k := $i.m "
       "group by $k order by $k return $k",
       "18 19",
       setup=["jn:store('json-path1','mix.jn',"
              "'[{\"m\":18},{\"m\":18.0e0},{\"m\":18.00},{\"m\":19}]')"]),
]

# -------------------- xml: index DDL + scans (function/xml/index/*)
_XIDX_SETUP = [
    "xml:store('xml-db3','res','<p:a xmlns:p=\"ns\" i=\"j\">oops1"
    "<b>foo<c/></b>oops2<b p:x=\"y\"><c/>bar</b>oops3</p:a>')",
    "let $doc := xml:doc('xml-db3','res') "
    "return xml:create-name-index($doc, ('b','c'))",
    "let $doc := xml:doc('xml-db3','res') "
    "return xml:create-path-index($doc, ('//b/c'))",
    "let $doc := xml:doc('xml-db3','res') "
    "return xml:create-cas-index($doc, 'xs:string', ('//b'))",
]
CASES += [
    _c("XmlIndex#findNameIndex", "index/find/FindNameIndex.java",
       "xml:find-name-index(xml:doc('xml-db3','res'), ('b','c'))", "0",
       setup=_XIDX_SETUP),
    _c("XmlIndex#findNameIndexMiss", "index/find/FindNameIndex.java",
       "xml:find-name-index(xml:doc('xml-db3','res'), ('zzz'))", "",
       setup=_XIDX_SETUP),
    _c("XmlIndex#scanNameIndexKeys", "index/scan/ScanNameIndex.java",
       "for $n in xml:scan-name-index(xml:doc('xml-db3','res'), 0, 'c') "
       "return sdb:nodekey($n)", "7 11", setup=_XIDX_SETUP),
    _c("XmlIndex#scanPathIndex", "index/scan/ScanPathIndex.java",
       "xml:scan-path-index(xml:doc('xml-db3','res'), 1)", "<c/><c/>",
       setup=_XIDX_SETUP),
    _c("XmlIndex#scanCasIndexEquals", "index/scan/ScanCASIndex.java",
       "xml:scan-cas-index(xml:doc('xml-db3','res'), 2, 'foo', '==')",
       "foo", setup=_XIDX_SETUP),
    _c("XmlIndex#scanMissingIndexFailsClosed", "index/scan/ScanNameIndex.java",
       "xml:scan-name-index(xml:doc('xml-db3','res'), 9, 'c')", None,
       setup=_XIDX_SETUP, **{"assert": "error"}),
]

# ------------------------------------ function/xml/diff (DiffTest)
# xml:diff emits an XQuery Update script transforming r1 into r2;
# tests/test_xmldiff.py closes the reference's round-trip invariant
# (apply script at r1 == r2) for every revision pair of this fixture.
CASES += [
    _c("XmlDiff#insertedSubtreeStatement", "diff/DiffTest.java",
       "xml:diff('xml-db','resource', 1, 2)", None,
       setup_py="xml_versioned",
       **{"assert": ["let $doc := xml:doc('xml-db','resource', 1)",
                     "insert nodes <a att=\"attval\">OOPS4!</a> "
                     "before sdb:select-item($doc, 4)"]}),
    _c("XmlDiff#deleteStatement", "diff/DiffTest.java",
       "xml:diff('xml-db','resource', 3, 4)", None,
       setup_py="xml_versioned",
       **{"assert": ["delete nodes sdb:select-item($doc, 13)"]}),
    _c("XmlDiff#replaceValueStatement", "diff/DiffTest.java",
       "xml:diff('xml-db','resource', 4, 5)", None,
       setup_py="xml_versioned",
       **{"assert": ["replace value of node sdb:select-item($doc, 4) "
                     "with \"fooooooo\""]}),
    _c("XmlDiff#sameRevisionIsEmpty", "diff/DiffTest.java",
       "xml:diff('xml-db','resource', 3, 3)", "",
       setup_py="xml_versioned"),
]

# ----------------- json/JsonDBObjectFieldLookupTest (round-4 verdict
# #4 mining: the hand-written field-lookup cursor's semantics pinned
# at the query surface — match leaves whole value, miss resets, a
# never-stored name is a clean miss)
_FL_DOC = (
    '{"title":"Saleslady","year":1938,"active":true,"score":1.5,'
    '"href":null,"nested":{"a":1,"b":2},'
    '"cast":["Anne Nagel","Weldon Heyburn"]}'
)
_FL_STORE = "jn:store('json-path1','mydoc.jn','" + _FL_DOC + "')"
_FL = "let $d := jn:doc('json-path1','mydoc.jn') return "


def _fl(name, expr, expected, doc=None, store_q=None):
    setup = [store_q or (_FL_STORE if doc is None else
                         "jn:store('json-path1','mydoc.jn','" + doc + "')")]
    return _c("JsonDBObjectFieldLookup#" + name,
              "json/JsonDBObjectFieldLookupTest.java",
              _FL + expr, expected, setup=setup)


CASES += [
    _fl("emptyObjectHasNoFields", "$d.anything", "", doc="{}"),
    _fl("emptyObjectRepeatedMisses", "($d.a, $d.b)", "", doc="{}"),
    _fl("singleFieldResolves", "$d.a", '"only"', doc='{"a":"only"}'),
    _fl("singleFieldMiss", "$d.b", "", doc='{"a":"only"}'),
    _fl("missThenHit", "($d.b, $d.a)", '"only"', doc='{"a":"only"}'),
    _fl("stringField", "$d.title", '"Saleslady"'),
    _fl("integerField", "$d.year", "1938"),
    _fl("booleanField", "$d.active", "true"),
    _fl("doubleField", "$d.score", "1.5"),
    _fl("explicitNullIsValueNotMiss", "$d.href", "null"),
    _fl("nestedObjectNotUnwrapped", "$d.nested", '{"a":1,"b":2}'),
    _fl("nestedFieldThroughPair", "$d.nested.a", "1"),
    _fl("nestedArrayNotUnwrapped", "$d.cast",
        '["Anne Nagel","Weldon Heyburn"]'),
    _fl("missDoesNotPoison1", "($d.title, $d.nosuchfield)", '"Saleslady"'),
    _fl("missDoesNotPoison2", "($d.title, $d.nosuchfield, $d.year)",
        '"Saleslady" 1938'),
    _fl("missDoesNotPoison3", "($d.nosuchfield, $d.title)", '"Saleslady"'),
    _fl("missBetweenRepeats", "($d.year, $d.nosuchfield, $d.year)",
        "1938 1938"),
    _fl("neverStoredNameIsMiss", "$d.zzzNeverStoredAnywhere", ""),
    _fl("hashCollisionBothResolve", "($d.Aa, $d.BB)", "1 2",
        doc='{"Aa":1,"BB":2}'),
    _fl("hashCollisionEitherOrder", "($d.BB, $d.Aa)", "2 1",
        doc='{"Aa":1,"BB":2}'),
    _fl("hashCollisionThirdMisses", "$d.CC", "", doc='{"Aa":1,"BB":2}'),
    _fl("repeatedAccessIsStable", "($d.year, $d.year, $d.year)",
        "1938 1938 1938"),
    _fl("nonAsciiOneCharTwoBytes", '$d."\u00e9"', "1",
        doc='{"\u00e9":1,"ab":2,"\u65e5\u672c\u8a9e":3}'),
    _fl("nonAsciiSameByteLenAscii", '$d."ab"', "2",
        doc='{"\u00e9":1,"ab":2,"\u65e5\u672c\u8a9e":3}'),
    _fl("nonAsciiThreeCharNineBytes", '$d."\u65e5\u672c\u8a9e"', "3",
        doc='{"\u00e9":1,"ab":2,"\u65e5\u672c\u8a9e":3}'),
    _fl("nonAsciiPrefixNoMatch", '$d."\u65e5\u672c"', "",
        doc='{"\u00e9":1,"ab":2,"\u65e5\u672c\u8a9e":3}'),
    _fl("longerAsciiNoMatch", '$d."abc"', "",
        doc='{"\u00e9":1,"ab":2,"\u65e5\u672c\u8a9e":3}'),
]

# ------------------- json/JsonDBArraySliceTest (query-surface pins of
# the slice cursor semantics: from-inclusive / to-exclusive bounds,
# slice-local indexing — the regression the reference fixed — and
# length. The Java-API quirk where slice.range() re-reads indices as
# ABSOLUTE (rangeOnSlice_yieldsSubSlice_withCorrectAbsoluteIndices)
# is a pinned-down implementation artifact of JsonDBArraySlice, not
# query semantics, and is deliberately NOT replicated: the query
# surface composes slices slice-locally.)
_SL = "jn:store('sliceColl','sliceRes','[10,20,30,40,50,60,70]')"
_SLD = "jn:doc('sliceColl','sliceRes')"
CASES += [
    _c("JsonDBArraySlice#range3to7", "json/JsonDBArraySliceTest.java",
       f"{_SLD}[3:7]", "[40,50,60,70]", setup=[_SL]),
    _c("JsonDBArraySlice#sliceLocalIndexing",
       "json/JsonDBArraySliceTest.java",
       f"(({_SLD}[3:7])[0], ({_SLD}[3:7])[1], ({_SLD}[3:7])[2], "
       f"({_SLD}[3:7])[3])",
       "40 50 60 70", setup=[_SL]),
    _c("JsonDBArraySlice#stringsSequential",
       "json/JsonDBArraySliceTest.java",
       "jn:doc('sliceColl','s.jn')[1:6]",
       '["b","c","d","e","f"]',
       setup=["jn:store('sliceColl','s.jn',"
              "'[\"a\",\"b\",\"c\",\"d\",\"e\",\"f\",\"g\"]')"]),
    _c("JsonDBArraySlice#randomThenSequential",
       "json/JsonDBArraySliceTest.java",
       "((jn:doc('sliceColl','n.jn')[3:8])[3], "
       "(jn:doc('sliceColl','n.jn')[3:8])[4], "
       "(jn:doc('sliceColl','n.jn')[3:8])[0])",
       "6 7 3",
       setup=["jn:store('sliceColl','n.jn','[0,1,2,3,4,5,6,7,8,9]')"]),
    _c("JsonDBArraySlice#lengthOfSlice", "json/JsonDBArraySliceTest.java",
       "jn:size(jn:doc('sliceColl','t.jn')[2:8])", "6",
       setup=["jn:store('sliceColl','t.jn','[1,2,3,4,5,6,7,8,9,10]')"]),
    _c("JsonDBArraySlice#fullWidthSlice", "json/JsonDBArraySliceTest.java",
       "jn:doc('sliceColl','u.jn')[0:3]", "[1,2,3]",
       setup=["jn:store('sliceColl','u.jn','[1,2,3]')"]),
]

# --------------- Brackit jn: object/array builtins (libraries.gradle
# ships them to every reference user; JSONiq spec semantics)
CASES += [
    _c("JnBuiltins#sizeStored", "io.brackit.query jn:size",
       "jn:size(jn:doc('sliceColl','sliceRes'))", "7", setup=[_SL]),
    _c("JnBuiltins#sizeEmpty", "io.brackit.query jn:size",
       "jn:size([])", "0"),
    _c("JnBuiltins#membersIterate", "io.brackit.query jn:members",
       "for $m in jn:members([4,5,6]) return $m + 1", "5 6 7"),
    _c("JnBuiltins#membersOfStoredSlice", "io.brackit.query jn:members",
       f"jn:members({_SLD}[2:5])", "30 40 50", setup=[_SL]),
    _c("JnBuiltins#keysOfStored", "io.brackit.query jn:keys",
       "jn:keys(jn:doc('kdb','o.jn'))", '"a" "b" "c"',
       setup=["jn:store('kdb','o.jn',"
              "'{\"a\":1,\"b\":{\"x\":true},\"c\":null}')"]),
    _c("JnBuiltins#keysConstructed", "io.brackit.query jn:keys",
       'jn:keys({"x":1,"y":2})', '"x" "y"'),
]

# ------------------------------------ PathSummaryOffTest
CASES += [
    _c("PathSummaryOff#storeStillCreatesAndQueries",
       "PathSummaryOffTest.java",
       "sum(for $r in jn:doc('json-path1','a.jn')[] return $r.age)",
       "30", setup_py="path_summary_off"),
]

# ------------------------- json/JsonDBObjectFieldLookupTest
# Field-lookup semantics over one stored object: misses are the empty
# sequence, never errors; a miss must not poison later lookups on the
# same object (the reference's path-summary-guard cache bug class);
# nested containers come back whole, not collapsed (the record-fusion
# collapse bug class). DOC and every expected string are verbatim
# from the reference test.
_FL_DOC = ('{"title":"Saleslady","year":1938,"active":true,"score":1.5,'
           '"href":null,"nested":{"a":1,"b":2},'
           '"cast":["Anne Nagel","Weldon Heyburn"]}')


def _flcase(name, expr, expected, doc=None):
    d = doc if doc is not None else _FL_DOC
    return _c(
        f"JsonDBObjectFieldLookup#{name}", "json/JsonDBObjectFieldLookupTest.java",
        f"let $d := jn:doc('json-path1','mydoc.jn') return {expr}", expected,
        setup=[f"jn:store('json-path1','mydoc.jn','{d}')"],
    )


CASES += [
    _flcase("emptyObjectHasNoFields", "$d.anything", "", doc="{}"),
    _flcase("emptyObjectRepeatedMisses", "($d.a, $d.b)", "", doc="{}"),
    _flcase("singleFieldResolves", "$d.a", '"only"', doc='{"a":"only"}'),
    _flcase("singleFieldOtherNameMisses", "$d.b", "", doc='{"a":"only"}'),
    _flcase("missBeforeSoleFieldDoesNotHideIt", "($d.b, $d.a)", '"only"',
            doc='{"a":"only"}'),
    _flcase("stringField", "$d.title", '"Saleslady"'),
    _flcase("integerField", "$d.year", "1938"),
    _flcase("booleanField", "$d.active", "true"),
    _flcase("doubleField", "$d.score", "1.5"),
    _flcase("nullFieldIsValueNotMiss", "$d.href", "null"),
    _flcase("nestedObjectNotUnwrapped", "$d.nested", '{"a":1,"b":2}'),
    _flcase("nestedFieldThroughPair", "$d.nested.a", "1"),
    _flcase("nestedArrayNotUnwrapped", "$d.cast",
            '["Anne Nagel","Weldon Heyburn"]'),
    _flcase("missingFieldIsEmpty", "$d.nosuchfield", ""),
    _flcase("leadingMissDoesNotHideHit", "($d.nosuchfield, $d.title)",
            '"Saleslady"'),
    _flcase("leadingMissDoesNotHideAnyLaterField",
            "($d.nosuchfield, $d.title, $d.year)", '"Saleslady" 1938'),
    _flcase("twoLeadingMisses", "($d.nope1, $d.nope2, $d.title)",
            '"Saleslady"'),
    _flcase("hitAfterMissStillResolves",
            "($d.title, $d.nosuchfield, $d.year)", '"Saleslady" 1938'),
    _flcase("hitsEitherSideOfMissAgree",
            "($d.year, $d.mmmissing, $d.year)", "1938 1938"),
    _flcase("hitMissSameHitAgree",
            "($d.title, $d.nosuchfield, $d.title)", '"Saleslady" "Saleslady"'),
    _flcase("neverStoredNameIsAMiss", "$d.zzzNeverStoredAnywhere", ""),
    _flcase("missLeavesCursorUsable",
            "($d.title, $d.zzzNeverStoredAnywhere, $d.year)",
            '"Saleslady" 1938'),
]

# ---------------------------- json/NumericComparisonRegressionTest
_NUM_STORE = "jn:store('json-path1','mydoc.jn','{}')"


def _numcase(name, data, query, expected):
    return _c(
        f"NumericComparison#{name}", "NumericComparisonRegressionTest.java",
        query, expected,
        setup=[f"jn:store('json-path1','mydoc.jn','{data}')"],
    )


_ND = "jn:doc('json-path1','mydoc.jn')"
CASES += [
    _numcase("orderByInt64AndDouble", '{"vals":[5000000000, 3.7e0]}',
             f"for $v in {_ND}.vals[] order by $v return $v",
             "3.7 5000000000"),
    _numcase("minInt64AndDouble", '{"vals":[5000000000, 3.7e0]}',
             f"min({_ND}.vals[])", "3.7"),
    _numcase("maxInt64AndDouble", '{"vals":[5000000000, 3.7e0]}',
             f"max({_ND}.vals[])", "5000000000"),
    _numcase("compareInt64VsDoubleLt", '{"a":5000000000,"b":3.7e0}',
             f"{_ND}.a lt {_ND}.b", "false"),
    _numcase("compareInt64VsDoubleGt", '{"a":5000000000,"b":3.7e0}',
             f"{_ND}.a gt {_ND}.b", "true"),
    _numcase("compareInt64VsDecimal", '{"a":5000000000,"b":3.7}',
             f"{_ND}.a gt {_ND}.b", "true"),
    _numcase("arithmeticInt64AndDouble", '{"a":5000000000,"b":1.5e0}',
             f"({_ND}.a + {_ND}.b) gt 4.9e9", "true"),
]

# GetPath#arrayMember: the reference emits /tada/[]/[4] — position on
# the MEMBER step, [] on the array — via GetPath.java's kind-special-
# cased ancestor walk (the same walk whose array-node attribution is
# already a documented delta, see run_ref_corpus.KNOWN_DELTAS). Our
# instance path instantiates ancestor member positions and leaves the
# node's own array step positionless: /tada/[4]/[].
MANUAL_DELTAS = {
    "GetPath#arrayMember": {
        "why": "GetPath.java array-member step ordering ([]/[4] vs [4]/[])",
        "expected": "/tada/[4]/[]",
    },
}


# ------------------------------ XMark (node/SirixXMarkTest.java)
# The reference runs Brackit's XMarkTest over its node store: the 20
# XMark XQuery queries against the SHIPPED auction.xml with golden
# outputs (bundles/sirix-query/src/test/resources/xmark/{queries/
# fndoc,results}). Queries replay VERBATIM — fn:doc("auction.xml")
# resolves against the stored XML resource the setup creates, exactly
# like XMarkTest's collection store — and outputs compare
# byte-for-byte with results/qNN.out.
_XMARK_DIR = (
    "/root/reference/bundles/sirix-query/src/test/resources/xmark"
)


def _setup_xmark(spark, store):
    from sirix_spark.store.xmlstore import XmlStore

    with open(f"{_XMARK_DIR}/auction.xml") as f:
        XmlStore(store.root).store("xmark", "auction.xml", f.read())


SETUPS["xmark"] = _setup_xmark

# All 20 XMark queries replay byte-for-byte in the DEFAULT run —
# the round-7 runtime gate (_XMARK_SLOW) is GONE. Measured idle on
# this box, 1.2 MB auction.xml: q09 ≈ 30 s and q10 ≈ 33 s (round 6:
# 156 s / 186 s; rounds 3-5: 4.6 / 4.8 min). What fixed them, in
# order of impact: (1) unit-level XML path lets ($ca/$ei) cut their
# lineage after packing — pre-cut, every downstream reference
# re-inlined the axis-join + subtree-serialize subplan (q09's first
# checkpoint plan was 14k lines / 1.8k joins and took ~90 s to
# materialize); (2) text()-final constructor templates compile to
# JVM-side Hive xpath() over the item's serialized subtree
# (docmodel._enclosed_text_fast) — q10's 11 templates each paid an
# ~14 s axis-join + localCheckpoint pipeline; (3) the remaining
# packings are cut every third (docmodel._maybe_cut_packed), which
# bounds the plan-doubling growth that otherwise melts the driver's
# per-DataFrame analysis walks.
if os.path.isdir(_XMARK_DIR):
    for _n in range(1, 21):
        with open(f"{_XMARK_DIR}/queries/fndoc/q{_n:02d}.xq") as _f:
            _q = _f.read()
        with open(f"{_XMARK_DIR}/results/q{_n:02d}.out") as _f:
            _exp = _f.read().rstrip("\n")
        CASES.append(
            _c(
                f"XMark#q{_n:02d}",
                "node/SirixXMarkTest.java",
                _q,
                _exp,
                setup_py="xmark",
            )
        )
