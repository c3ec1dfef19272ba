"""Property-based tests (hypothesis) for the adapter's schema inference and
flatten rules -- the reference's quirkiest semantics (SURVEY.md SS1.3).
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from mqtt_message_pump_spark.functions.inference import (
    _flatten_record,
    infer_flat_schema,
)

# JSON-ish nested records: leaves are str/bool/numbers, nesting via dicts.
_key = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6
)
_leaf = st.one_of(
    st.text(max_size=8),
    st.booleans(),
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)
_record = st.recursive(
    st.dictionaries(_key, _leaf, min_size=1, max_size=4),
    lambda children: st.dictionaries(
        _key, st.one_of(_leaf, children), min_size=1, max_size=4
    ),
    max_leaves=12,
)


@given(_record)
@settings(max_examples=200, deadline=None)
def test_flatten_leaves_preserved(record):
    """Every leaf value survives the flatten under an underscore-joined
    path (modulo the reference's documented last-wins collisions)."""
    flat = _flatten_record(record)

    def leaves(d, prefix=""):
        for k, v in d.items():
            path = f"{prefix}_{k}" if prefix else str(k)
            if isinstance(v, dict):
                yield from leaves(v, path)
            else:
                yield path, v

    leaf_list = list(leaves(record))
    # no collisions -> exact equality; collisions -> last wins
    assert set(flat) == {p for p, _ in leaf_list}
    for path, v in leaf_list:
        if [p for p, _ in leaf_list].count(path) == 1:
            assert flat[path] == v


@given(_record)
@settings(max_examples=200, deadline=None)
def test_inferred_schema_sorted_and_typed(record):
    """Columns come out lexicographically sorted with the reference's
     3-type lattice (+key_id), regardless of input key order."""
    sample = json.dumps({"1": record})
    cols = infer_flat_schema(sample)
    names = [n for n, _ in cols]
    assert names == sorted(names)
    assert "key_id" in names
    assert all(t in ("String", "Bool", "Float64") for _, t in cols)
    # key order must not matter: reverse the record's key insertion order
    rev = json.dumps({"1": dict(reversed(list(record.items())))})
    assert infer_flat_schema(rev) == cols
