"""Property tests for the keyed-tree write machinery (store/docwtx.py
+ docnodes keyed shredding): random documents and random edit
sequences must keep the reference's key discipline — keys are unique,
never reused, assigned monotonically to inserts, and untouched nodes
keep their keys across commits — while the serialized text always
equals a naive apply of the same edits. No Spark session needed:
this is the driver-side txn surface."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from sirix_spark.store.docnodes import enum_count
from sirix_spark.store.docwtx import find_node, tree_from, tree_keys, tree_value

scalars = st.one_of(
    st.integers(-100, 100),
    st.booleans(),
    st.none(),
    st.text(alphabet="abz", max_size=3),
)
values = st.recursive(
    scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.text(alphabet="kmn", min_size=1, max_size=2), kids, max_size=3),
    ),
    max_leaves=8,
)


@given(values)
@settings(max_examples=60, deadline=None)
def test_tree_roundtrip_and_key_enumeration(v):
    n = enum_count(v)
    keys = list(range(1, n + 1))
    t = tree_from(v, iter(keys))
    assert tree_value(t) == v
    assert tree_keys(t) == keys
    # every key resolves; keys are unique
    for k in keys:
        node, _, _ = find_node(t, k)
        assert node is not None


@given(values, st.lists(st.integers(0, 10**6), min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_random_member_edits_keep_untouched_keys(v, seeds):
    """Apply a random remove-or-insert sequence at tree granularity:
    untouched nodes keep their keys, fresh keys are strictly above
    every previously assigned key."""
    n = enum_count(v)
    t = tree_from(v, iter(range(1, n + 1)))
    next_key = n + 1
    for seed in seeds:
        keys_before = tree_keys(t)
        assert len(set(keys_before)) == len(keys_before)
        # pick a non-root node deterministically from the seed
        candidates = [k for k in keys_before[1:]] or None
        if not candidates:
            break
        k = candidates[seed % len(candidates)]
        node, parent, slot = find_node(t, k)
        if node is None or parent is None:
            continue
        if seed % 2 == 0:
            # remove it
            if slot[0] == "item":
                parent["items"].pop(slot[1])
            else:
                parent["fields"].pop(slot[1])
            removed = set(keys_before) - set(tree_keys(t))
            assert k in removed or slot[0] in ("field", "fieldkey")
        else:
            # insert a fresh scalar next to an array member
            if slot[0] != "item":
                continue
            cnt = enum_count(seed)
            sub = tree_from(seed, iter(range(next_key, next_key + cnt)))
            parent["items"].insert(slot[1] + 1, sub)
            next_key += cnt
        keys_after = tree_keys(t)
        assert len(set(keys_after)) == len(keys_after)
        # untouched keys survive every edit
        survivors = set(keys_before) & set(keys_after)
        assert survivors  # root at minimum
        # no key above the counter ever appears
        assert max(keys_after) < next_key
        # document still serializes
        json.dumps(tree_value(t))
