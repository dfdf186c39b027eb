"""Cross-engine (Spark ⟷ DuckDB) portable sketches.

The pipeline's hot-path sketches (functions/sketches.py) use blake2b/
xxhash64 — fast, but with no DuckDB twin, so the driver's correctness
harness could only do rows-only checks on the sketch queries (the 5
``no_oracle`` rows in CORRECTNESS_r01). This module defines the SAME
sketch family over a base hash both engines compute bit-identically:

    hash60(s)   = int(md5(s)[:15 hex chars], 16)          ∈ [0, 2^60)
    minhash_i   = min over shingles of (a_i·(h mod p) + b_i) mod p,
                  p = 2^31-1 (Mersenne)
    simhash60   = 60-bit majority-vote sketch over the hash60 values

* md5 is byte-stable over UTF-8 in both engines; the 15-hex-digit prefix
  parses exactly into a non-negative BIGINT.
* the universal hash stays entirely in 64-bit integers: a_i, b_i,
  (h mod p) < 2^31 so a_i·(h mod p) + b_i < 2^62 — native BIGINT in both
  engines, no DECIMAL/HUGEINT needed (the DECIMAL(38,0) mod-2^61-1
  variant was measured ~4× slower on the Spark side).
* every Spark Column builder here has a paired ``sql_*`` generator that
  emits the DuckDB expression FROM THE SAME PYTHON CONSTANTS — the two
  sides cannot drift.

The a_i/b_i constants are derived from splitmix64 (public PRNG finalizer,
Steele et al. 2014) of the index — deterministic, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import tokens_col, word_shingles

P31 = (1 << 31) - 1  # Mersenne prime modulus for the universal hash
MINHASH_K = 16
SIMHASH_BITS = 60  # 15 hex digits of md5 → 60 usable bits

_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * _M1) & _MASK
    x = ((x ^ (x >> 27)) * _M2) & _MASK
    return x ^ (x >> 31)


# (a_i, b_i) for the k-perm universal hash family: a odd in [1, P31);
# b in [0, P31). Module-level so Spark exprs and SQL strings share them.
MINHASH_AB: list[tuple[int, int]] = [
    ((_splitmix64(2 * i + 1) % P31) | 1, _splitmix64(2 * i + 2) % P31)
    for i in range(MINHASH_K)
]


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------


def hash60(col: Column) -> Column:
    """Portable 60-bit base hash: first 15 hex digits of md5 as a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_shingles(text: Column, k: int = 3) -> Column:
    """DISTINCT k-word shingles (the portable sketches are defined over the
    shingle *set*, so both engines agree without order semantics)."""
    return F.array_distinct(word_shingles(tokens_col(text), k=k))


def base_hashes(shingles: Column) -> Column:
    return F.transform(shingles, hash60)


def minhash_sig(hashes: Column, size_col: Column | None = None) -> Column:
    """array<long> of MINHASH_K minima of the universal-hash family,
    computed in ONE aggregate pass over the hash array (16 separate
    ``array_min(transform(...))`` expressions would re-evaluate the md5
    base-hash subtree 16× — measured 15× slower). Empty input → null
    array (docs with no shingles never pair: null band keys drop out of
    the bucket join in both engines)."""
    ab = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in MINHASH_AB
        ]
    )
    init = F.array(*[F.lit(P31).cast("long")] * MINHASH_K)
    agg = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda cur, p: F.least(
                cur, (p["a"] * (h % F.lit(P31)) + p["b"]) % F.lit(P31)
            ),
        ),
    )
    # the emptiness guard re-evaluates `hashes` unless the caller passes
    # the (cheap) source-array size column
    n = F.size(hashes) if size_col is None else size_col
    return F.when(n > 0, agg).otherwise(F.lit(None).cast("array<bigint>"))


def minhash_band_keys(sig: Column, n_bands: int) -> Column:
    """Band keys 'b{i}:v_v_...' over contiguous signature slices."""
    assert MINHASH_K % n_bands == 0
    rows = MINHASH_K // n_bands
    keys = []
    for band in range(n_bands):
        parts: list[Column] = [F.lit(f"b{band}:")]
        for r in range(rows):
            if r:
                parts.append(F.lit("_"))
            parts.append(sig[band * rows + r].cast("string"))
        keys.append(F.concat(*parts))
    return F.array(*keys)


def simhash60(hashes: Column) -> Column:
    """60-bit SimHash over pre-hashed longs: one aggregate pass carrying a
    60-long vote vector (native, JVM-side; no explode/shuffle)."""
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
        hashes, init, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b)
    )
    bits = F.zip_with(
        counts,
        F.array(*masks),
        lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))


def fingerprint(text: Column, k: int = 3) -> Column:
    """Portable document fingerprint: min hash60 over the shingle set
    (1-perm MinHash; 0 for empty docs). DuckDB twin: sql_fingerprint."""
    return F.coalesce(
        F.array_min(base_hashes(portable_shingles(text, k))), F.lit(0).cast("long")
    )


def simhash60_band_keys(sim: Column, n_bands: int) -> Column:
    """Equal-width band keys over the 60-bit simhash. With
    ``max_hamming < n_bands`` the pigeonhole principle guarantees every
    pair within the Hamming bound shares at least one untouched band —
    band blocking is then EXACTLY equivalent to the all-pairs filter
    (which is what the DuckDB oracle computes)."""
    assert SIMHASH_BITS % n_bands == 0
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.concat(
                F.lit(f"s{b}:"),
                F.shiftrightunsigned(sim, b * width).bitwiseAND(F.lit(mask)).cast("string"),
            )
            for b in range(n_bands)
        ]
    )


# ---------------------------------------------------------------------------
# DuckDB SQL generators (paired, built from the same constants)
# ---------------------------------------------------------------------------

SQL_TOKENS = "list_filter(string_split_regex({text}, '\\s+'), x -> x <> '')"

SQL_SHINGLES3 = (
    "list_distinct(CASE WHEN len({w}) >= 3 THEN "
    "list_transform(range(1, len({w}) - 1), i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2]) "
    "WHEN len({w}) > 0 THEN [array_to_string({w}, ' ')] ELSE [] END)"
)


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`hash60` — parse md5 hex prefix via list_reduce."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split(substr(md5({expr}), 1, 15), ''), "
        "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (a, b) -> a * 16 + b)"
    )


def sql_base_hashes(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {sql_hash60('s')})"


def sql_minhash_sig(hashes_expr: str) -> str:
    mins = ", ".join(
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * (h % {P31}) + {b}) % {P31}))"
        for a, b in MINHASH_AB
    )
    return f"[{mins}]"


def sql_minhash_band_keys(sig_expr: str, n_bands: int) -> str:
    rows = MINHASH_K // n_bands
    keys = []
    for band in range(n_bands):
        parts = " || '_' || ".join(
            f"{sig_expr}[{band * rows + r + 1}]::VARCHAR" for r in range(rows)
        )
        keys.append(f"'b{band}:' || {parts}")
    return "[" + ", ".join(keys) + "]"


def sql_simhash60(hashes_expr: str) -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"coalesce(list_sum(list_transform({hashes_expr}, "
            f"h -> ((h >> {b}) & 1) * 2 - 1)), 0)"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
