"""switch / typeswitch / ordered / unordered (XQuery 3.1 §3.12,
§3.15, §3.16) — the last Brackit constructs the parser kept
fail-closed (PARITY.md: they appear in NO reference test query, but
Brackit ships them — libraries.gradle:16 — so a reference USER can
write them; round-10 closes the gap).

Implementation is a parse-time desugaring onto existing machinery:
the operand binds once via an internal let, switch case matching is
fn:deep-equal (the spec's own §3.12 definition), typeswitch case
sequence-types compile to the round-5 instance-of / instance-of-xs
calls, and ordered{}/unordered{} are the identity (results are
always produced in document order). Case-variable bindings ride a
let-only FLWOR now supported in scalar position (each let binds ONCE
as a lambda variable — the _let1 CSE discipline).

Documented simplification: an empty-sequence switch operand falls to
default (fn:deep-equal's engine contract gives no match), where spec
§3.12 would match an empty case operand — the corner requires
writing `case ()`, which Brackit's own parser also rejects.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ev(spark, tmp_path_factory):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    store = DocumentStore(spark, str(tmp_path_factory.mktemp("ts")))
    return DocEvaluator(spark, store)


CASES = [
    # switch: deep-equal matching, multi-operand cases, computed
    # operands and case values
    ("switch (2) case 1 return 'one' case 2 return 'two' "
     "default return 'many'", "two"),
    ("switch (9) case 1 case 9 return 'hit' default return 'miss'", "hit"),
    ("switch ('x') case 'y' return 1 default return 0", "0"),
    ("switch (1+1) case 3-1 return 'calc' default return 'no'", "calc"),
    ("switch (sum((1,2,3))) case 6 return 'six' default return 'no'", "six"),
    # typeswitch: xs types with occurrence, kind tests, unions
    ("typeswitch (3) case xs:string return 'str' "
     "case xs:integer return 'int' default return 'other'", "int"),
    ("typeswitch ((1,2)) case xs:integer return 'one' "
     "case xs:integer+ return 'many' default return 'no'", "many"),
    ("typeswitch (1) case xs:string | xs:integer return 'either' "
     "default return 'no'", "either"),
    ("typeswitch ([1,2]) case object() return 'obj' "
     "case array() return 'arr' default return 'x'", "arr"),
    ("typeswitch ({'a':1}) case object() return 'obj' "
     "default return 'x'", "obj"),
    ("typeswitch (null) case null() return 'nil' default return 'x'", "nil"),
    ("typeswitch (3.5) case number() return 'num' default return 'x'", "num"),
    ("typeswitch (true) case boolean() return 'b' default return 'x'", "b"),
    ("typeswitch (1) case item() return 'single' default return 'no'",
     "single"),
    ("typeswitch (()) case empty-sequence() return 'empty' "
     "default return 'no'", "empty"),
    # case/default variable bindings (scalar-position let-only FLWOR)
    ("typeswitch ('a') case $s as xs:string return $s "
     "default return 'no'", "a"),
    ("typeswitch (7) case $n as xs:integer return $n + 1 "
     "default return 0", "8"),
    ("typeswitch (7) default $d return $d * 2", "14"),
    ("typeswitch ([1,2]) case $a as array() return jn:size($a) "
     "default return 0", "2"),
    # scoping: the case var shadows only inside its branch
    ("let $s := 'outer' return typeswitch (1) "
     "case $n as xs:integer return $n default return $s", "1"),
    ("let $s := 'outer' return typeswitch ('zz') "
     "case $n as xs:integer return $n default return $s", "outer"),
    # per-item dispatch inside FLWOR
    ("for $x in (1,'a') return typeswitch ($x) "
     "case $n as xs:integer return $n * 10 "
     "case $t as xs:string return $t default return 'd'", "10 a"),
    ("for $x in (1, 'a', [1], {'k':1}, null, true) return "
     "typeswitch ($x) case xs:integer return 'i' "
     "case xs:string return 's' case array() return 'a' "
     "case object() return 'o' case null() return 'n' "
     "default return 'd'", "i s a o n d"),
    # nesting
    ("switch (typeswitch (2) case xs:integer return 'i' "
     "default return 'o') case 'i' return 'yes' default return 'no'",
     "yes"),
    # ordered / unordered are the identity
    ("ordered { 1 + 1 }", "2"),
    ("unordered { for $x in (1,2,3) return $x }", "1 2 3"),
]


@pytest.mark.parametrize("q,want", CASES, ids=[c[0][:48] for c in CASES])
def test_switch_typeswitch(ev, q, want):
    assert ev.execute(q) == want


def test_plain_names_still_parse(ev):
    # 'switch'/'ordered' as object keys / deref fields must not be
    # captured by the new expression dispatch
    assert ev.execute("{'switch': 1}.switch") == "1"
    assert ev.execute("{'ordered': 2}.ordered") == "2"
    assert ev.execute("{'typeswitch': 3}.typeswitch") == "3"
