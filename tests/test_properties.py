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


# ---------------------------------------------------------------- codecs

import numpy as np

from mqtt_message_pump_spark.operators.audiocodec import decode_wav, encode_wav
from mqtt_message_pump_spark.operators.imagecodec import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    nearest_resize,
)

_dims = st.tuples(
    st.integers(min_value=1, max_value=12),  # height
    st.integers(min_value=1, max_value=12),  # width
    st.sampled_from([1, 3, 4]),              # channels
)


@given(_dims, st.integers(min_value=0, max_value=4), st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(dims, ftype, seed):
    """decode(encode(img, any filter)) == img for every shape/channel
    combination -- all five scanline filter branches, ragged strides."""
    h, w, c = dims
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ftype)), img)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    """24-bit BMP round-trips for every shape, including widths whose
    3-byte rows need 4-byte padding."""
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=500
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    got, got_rate = decode_wav(encode_wav(arr, rate=rate))
    assert got_rate == rate
    assert np.array_equal(got, arr)


@given(_dims, st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_nearest_resize_properties(dims, out_w, out_h, seed):
    """Output shape contract + every output pixel is SOME input pixel
    (nearest-neighbor never invents values), and identity resize is
    exact."""
    h, w, c = dims
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    out = nearest_resize(img, out_w, out_h)
    assert out.shape == (out_h, out_w, c)
    src_pixels = {tuple(p) for p in img.reshape(-1, c)}
    assert all(tuple(p) in src_pixels for p in out.reshape(-1, c))
    assert np.array_equal(nearest_resize(img, w, h), img)


from mqtt_message_pump_spark.operators.videocodec import (
    decode_gif_frames,
    encode_gif,
)


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(n_frames, h, w, seed):
    """decode(encode(frames)) reproduces every frame's gray values for
    any frame count and geometry (LZW bit-packing, sub-block splits,
    clear-code resets)."""
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), np.uint8) for _ in range(n_frames)]
    dec = decode_gif_frames(encode_gif(frames))
    assert len(dec) == n_frames
    assert all(np.array_equal(d[:, :, 0], f) for d, f in zip(dec, frames))
