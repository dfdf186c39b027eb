"""Property-based checks (hypothesis) for the scalar kernels rewritten in
round 2 — all pure Python, no SparkSession.

* guarded normalize ≡ the unguarded reference formulation on arbitrary
  text (the O(1) pre-guards must be *necessary conditions* only);
* batch sketch ≡ scalar twin on arbitrary unicode docs and arbitrary
  batch splits (factorize/word-cache and segmented reductions must not
  leak state across docs).
"""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_data_matching_spark.extract import (
    _BUSINESS_SUFFIXES,
    _LOCATION_PATTERNS,
    normalize_name_py,
)
from ai_data_matching_spark.functions.sketches import simhash_minhash_py, sketch_batch

# words skewed toward the normalizer's trigger vocabulary
_WORDS = st.sampled_from(
    "acme us usa uk europe emea asia apac americas international global "
    "worldwide north america inc inc. corp ltd llc co. gmbh ag sa nv bv "
    "srl spa plc the and & group services ( ) - widget alpha beta".split()
)
_texts = st.one_of(
    st.text(max_size=80),
    st.lists(_WORDS, max_size=8).map(" ".join),
)


def _normalize_unguarded(value):
    """The reference formulation with no pre-guards (matching_engine.py
    :21-58 loop semantics) — the property oracle."""
    if value is None or not isinstance(value, str):
        return ""
    c = value.strip().lower()
    for pat in _LOCATION_PATTERNS:
        c = re.sub(pat, "", c)
    for suffix in _BUSINESS_SUFFIXES:
        if c.endswith(f" {suffix}") or c.endswith(f".{suffix}"):
            c = c[: -len(suffix) - 1].strip()
    return re.sub(r"\s+", " ", c).strip()


@settings(max_examples=400, deadline=None)
@given(_texts)
def test_normalize_guards_are_pure_optimization(s):
    assert normalize_name_py(s) == _normalize_unguarded(s)


_docs = st.lists(
    st.one_of(st.text(max_size=60), st.lists(_WORDS, max_size=12).map(" ".join)),
    max_size=8,
)


@settings(max_examples=150, deadline=None)
@given(_docs)
def test_sketch_batch_equals_scalar_twin(docs):
    sims, sigs = sketch_batch(docs, 3)
    for i, t in enumerate(docs):
        s, m = simhash_minhash_py(t, 3)
        assert sims[i] == s and list(sigs[i]) == m


@settings(max_examples=100, deadline=None)
@given(_docs, st.integers(min_value=0, max_value=8))
def test_sketch_batch_split_invariant(docs, cut):
    cut = min(cut, len(docs))
    full_s, full_g = sketch_batch(docs, 3)
    s1, g1 = sketch_batch(docs[:cut], 3)
    s2, g2 = sketch_batch(docs[cut:], 3)
    assert np.array_equal(np.concatenate([s1, s2]), full_s)
    assert np.array_equal(np.vstack([g1, g2]), full_g)


# ---------------------------------------------------------------------------
# PNG codec: encode→decode is the identity for any pixels/dims/filters
# ---------------------------------------------------------------------------

from ai_data_matching_spark.functions.png import decode_png, encode_png  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),           # width
    st.integers(min_value=1, max_value=12),           # height
    st.sampled_from([1, 2, 3, 4]),                    # channels
    st.integers(min_value=0, max_value=2**32 - 1),    # pixel seed
    st.lists(st.integers(min_value=0, max_value=4), min_size=12, max_size=12),
)
def test_png_roundtrip_property(w, h, nch, seed, filters):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * nch, dtype=np.uint8).tobytes()
    data = encode_png(w, h, px, nch, filter_per_row=lambda y: filters[y % 12])
    gw, gh, gn, got = decode_png(data)
    assert (gw, gh, gn) == (w, h, nch)
    assert got == px


# ---------------------------------------------------------------------------
# sketch_batch minhash_k: prefix-consistency of the seeded family
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=32))
def test_sketch_batch_minhash_k_prefix_consistent(docs, k):
    _, gk = sketch_batch(docs, 3, minhash_k=k)
    _, g16 = sketch_batch(docs, 3)
    assert gk.shape[1] == k
    common = min(k, 16)
    assert np.array_equal(gk[:, :common], g16[:, :common])
