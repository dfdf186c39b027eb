"""Sketch functions (SimHash, MinHash, shingles) as *native* Spark column
expressions.

Everything here runs JVM-side via higher-order array functions +
``xxhash64`` — no Python UDFs, no explode/shuffle. A 64-bit SimHash over a
doc with S shingles costs O(64·S) JVM ops inside the row, which beats an
explode → groupBy(64 sums) formulation by removing a full shuffle of
S×rows intermediate rows (the thing that would dominate at 100 TB).

Graft analog of the reference's blocking-variant generation
(/root/reference/src/matching_engine.py:60-79): per-record keys that equal
⇒ near-certain match (simhash equality) or candidate (band equality).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hof import let_bound

SIMHASH_BITS = 64


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of a (pre-normalized) text column."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingles as strings; falls back to the whole token array
    joined when the doc has fewer than k tokens (so short docs still get
    one shingle instead of none).

    The token array is let-bound (functions/hof.py) — with an inline
    ``tokens`` expression, the per-index slice lambda would re-tokenize
    the whole document once per shingle position."""

    def body(t: Column) -> Column:
        n = F.size(t)
        shingled = F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        )
        whole = F.array(F.array_join(t, " "))
        return F.when(n >= k, shingled).otherwise(
            F.when(n > 0, whole).otherwise(F.array().cast("array<string>"))
        )

    return let_bound(tokens, body)


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash of a shingle array, fully native.

    For each shingle h=xxhash64(s): bit i contributes +1 if set else -1;
    final bit i = 1 iff the sum is > 0. Returns LongType (bit 63 lands in
    the sign bit — equality/banding still work).
    """
    masks = [F.shiftleft(F.lit(1).cast("long"), i) for i in range(SIMHASH_BITS)]

    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
                for m in masks
            ]
        )

    init = F.array(*[F.lit(0).cast("long")] * SIMHASH_BITS)
    counts = F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(acc, bit_votes(F.xxhash64(s)), lambda a, b: a + b),
    )
    bits = F.zip_with(
        counts,
        F.array(*masks),
        lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))


def simhash_bands(simhash: Column, n_bands: int = 4) -> Column:
    """Split a 64-bit simhash into ``n_bands`` equal-width band keys.

    Returns array<string> like ``["sh0:1a2b", "sh1:ffff", ...]``; two docs
    whose simhashes agree on any band share a blocking key (LSH banding —
    same trick as MinHash-LSH but over simhash bits).
    """
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    parts = []
    for b in range(n_bands):
        band_val = F.shiftrightunsigned(simhash, b * width).bitwiseAND(F.lit(mask))
        parts.append(F.concat(F.lit(f"sh{b}:"), F.conv(band_val.cast("string"), 10, 16)))
    return F.array(*parts)


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k-perm MinHash signature: sig[i] = min over shingles of
    xxhash64(shingle, i). Native (transform + array_min per seed).

    NB: the per-seed lambda must be 1-arg — PySpark passes the array
    index to 2-arg lambdas, which would silently replace the seed.
    """

    def seeded(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    # bind the shingle array once: the k per-seed transforms otherwise
    # each re-evaluate an inline shingle construction (k× the work)
    return let_bound(
        shingles,
        lambda sh: F.array(*[F.array_min(F.transform(sh, seeded(i))) for i in range(k)]),
    )


def minhash_band_keys(sig: Column, n_bands: int = 4, k: int = 16) -> Column:
    """LSH band keys over a MinHash signature: hash each contiguous band of
    rows to one key string.

    ``k`` is the signature length (array length per row is not readable in
    a Python loop over native Columns, so the caller must pass it). Bands
    must tile the signature exactly — otherwise slices past the end return
    [] and every row would share a constant band key, collapsing the LSH
    into one corpus-sized block.
    """
    if n_bands <= 0 or k % n_bands != 0:
        raise ValueError(f"k={k} not divisible into n_bands={n_bands} equal bands")
    keys = []
    rows_per_band = k // n_bands
    for b in range(n_bands):
        band = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        keys.append(
            F.concat(F.lit(f"mh{b}:"), F.xxhash64(F.array_join(F.transform(band, lambda x: x.cast("string")), "_")).cast("string"))
        )
    return F.array(*keys)


def minhash_jaccard_est(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard similarity from two equal-length signatures."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x))
    return agree.cast("double") / F.size(sig_a).cast("double")
