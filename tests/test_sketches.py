"""Batch sketch kernel: batch ≡ scalar twin, batch-split invariance,
empty/short-doc edges, and the >255-shingle reduceat-overflow guard."""

import numpy as np

from ai_data_matching_spark.functions.sketches import (
    MINHASH_K,
    simhash_minhash_py,
    sketch_batch,
)

DOCS = [
    "",
    "one",
    "one two",
    "one two three",
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon QQQ eta theta",
    "the quick brown fox jumps over the lazy dog " * 3,
    "   ",  # whitespace only → no words
]


def test_batch_matches_scalar_twin():
    sims, sigs = sketch_batch(DOCS, k=3)
    for i, t in enumerate(DOCS):
        s, m = simhash_minhash_py(t, 3)
        assert sims[i] == s, f"simhash mismatch doc {i}"
        assert list(sigs[i]) == m, f"minhash mismatch doc {i}"


def test_batch_split_invariance():
    """Splitting the batch (different Arrow batch boundaries / word-hash
    cache contents) must not change any sketch."""
    sims_all, sigs_all = sketch_batch(DOCS, k=3)
    for cut in (1, 3, 5):
        s1, g1 = sketch_batch(DOCS[:cut], k=3)
        s2, g2 = sketch_batch(DOCS[cut:], k=3)
        assert np.array_equal(np.concatenate([s1, s2]), sims_all)
        assert np.array_equal(np.vstack([g1, g2]), sigs_all)


def test_empty_docs_zero_sketch():
    sims, sigs = sketch_batch(["", "   "], k=3)
    assert list(sims) == [0, 0]
    assert sigs.shape == (2, MINHASH_K) and not sigs.any()


def test_order_sensitivity():
    """Shingle hashing is position-rotated — word order must matter."""
    (s1, _), (s2, _) = (simhash_minhash_py(t) for t in ("a b c", "c b a"))
    assert s1 != s2


def test_long_doc_parity():
    """A doc with hundreds of shingles (vote counts far above small-int
    ranges) keeps twin parity."""
    long_doc = " ".join(f"w{i % 97}" for i in range(600))  # 598 shingles
    sims, sigs = sketch_batch([long_doc, "one two three"], k=3)
    s, m = simhash_minhash_py(long_doc, 3)
    assert sims[0] == s and list(sigs[0]) == m


def test_many_docs_parity():
    """Segmented-reduction boundaries across many variable-length docs."""
    import ai_data_matching_spark.functions.sketches as sk

    docs = [" ".join(f"t{j}w{i}" for i in range(3 + j % 29)) for j in range(40)]
    base_s, base_g = sk.sketch_batch(docs, k=3)
    for i, t in enumerate(docs):
        s, m = sk.simhash_minhash_py(t, 3)
        assert base_s[i] == s and list(base_g[i]) == m
