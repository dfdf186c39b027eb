"""Pairwise string-similarity kernels.

The reference scores candidates with rapidfuzz ``fuzz.ratio``
(/root/reference/src/matching_engine.py:187-192) — the normalized InDel
(insert/delete-only Levenshtein) similarity. rapidfuzz is not available
here, so the kernels are re-implemented from the public algorithm
definitions with **integer-only arithmetic** (bit-stable across numpy /
platform versions):

* ``indel_ratio``      — 1 - indel_dist/(len_a+len_b); indel_dist =
  la + lb - 2·LCS, with LCS via the Allison–Dix bit-parallel algorithm
  (O(len_a/64 · len_b) word ops on Python bigints).
* ``jaro_winkler``     — standard Jaro similarity + Winkler prefix boost
  (prefix ≤ 4, p = 0.1).
* ``token_set_ratio``  — rapidfuzz token_set_ratio semantics: max of
  indel ratios over {sorted-intersection, intersection+diff_a,
  intersection+diff_b} combinations.

Exposed both as scalar Python functions (unit-test oracles, synth checks)
and as Arrow-batched pandas UDFs (the engine's ONLY Python execution
surface — per BASELINE.json input_hint "no per-row Python" outside
vectorized UDF batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Scalar kernels (pure, integer arithmetic)
# ---------------------------------------------------------------------------


def _build_masks(a: str) -> dict[str, int]:
    masks: dict[str, int] = {}
    bit = 1
    for ch in a:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def _lcs_from_masks(masks: dict[str, int], m: int, b: str) -> int:
    full = (1 << m) - 1
    v = full
    get = masks.get
    for ch in b:
        p = get(ch, 0)
        u = v & p
        v = ((v + u) | (v - u)) & full
    return m - bin(v).count("1")


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence (Allison–Dix bit-parallel).

    One Python-bigint row update per char of ``b``; exact, integer-only.
    """
    if len(a) == 0 or len(b) == 0:
        return 0
    return _lcs_from_masks(_build_masks(a), len(a), b)


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance = la + lb - 2*LCS(a, b)."""
    return len(a) + len(b) - 2 * _lcs_len(a, b)


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0, 1] — ``fuzz.ratio``/100 parity."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 1.0 - indel_distance(a, b) / total


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    sim = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return sim + prefix * p * (1.0 - sim)


def token_set_ratio(a: str, b: str) -> float:
    """rapidfuzz token_set_ratio semantics over whitespace tokens."""
    ta, tb = set(a.split()), set(b.split())
    inter = sorted(ta & tb)
    diff_a = sorted(ta - tb)
    diff_b = sorted(tb - ta)
    s_inter = " ".join(inter)
    s_a = (s_inter + " " + " ".join(diff_a)).strip()
    s_b = (s_inter + " " + " ".join(diff_b)).strip()
    if s_inter and s_inter == s_a == s_b:
        return 1.0
    return max(
        indel_ratio(s_inter, s_a) if s_inter else 0.0,
        indel_ratio(s_inter, s_b) if s_inter else 0.0,
        indel_ratio(s_a, s_b),
    )


# ---------------------------------------------------------------------------
# Naive DP oracle (tests only — validates the bit-parallel core)
# ---------------------------------------------------------------------------


def _lcs_len_naive(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ai = a[i - 1]
        for j in range(1, lb + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return prev[lb]


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs (the engine's scoring surface)
# ---------------------------------------------------------------------------

MAX_SCORE_CHARS = 512  # cap DP cost per pair; normalized web text rarely needs more

# Exact prescreen: indel_ratio(a,b) <= 2*min(|a|,|b|)/(|a|+|b|) because
# LCS <= min(|a|,|b|). Pairs whose bound is below the cutoff cannot reach
# the match threshold, so the UDF returns the bound itself instead of
# running the DP — exact for every decision the engine makes (edges are
# cut at >= threshold BEFORE any ranking), approximate only for the
# sub-threshold tail of the score histogram. The cutoff must never exceed
# the effective decision threshold: make_indel_ratio_udf clamps, so a
# user-configured fuzzy_threshold BELOW 0.80 (cli --fuzzy-threshold)
# lowers the prescreen with it and never admits an inflated bound as a
# passing score.
PRESCREEN_BOUND = 0.80


def _prep(s: pd.Series) -> pd.Series:
    return s.fillna("").str.slice(0, MAX_SCORE_CHARS)


def _trim_common_affixes(x: str, y: str) -> tuple[int, str, str]:
    """Strip the longest common prefix + suffix (both greedy-optimal for
    LCS) with numpy codepoint compares; returns (trimmed_len, mid_x, mid_y).

    Near-duplicate web pages differ in a small middle span, so this turns
    the O(|x|·|y|/64) bit-parallel DP into work on the tiny differing core.
    """
    ax = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
    ay = np.frombuffer(y.encode("utf-32-le"), dtype=np.uint32)
    n = min(len(ax), len(ay))
    neq = ax[:n] != ay[:n]
    pre = int(neq.argmax()) if neq.any() else n
    sx, sy = ax[pre:], ay[pre:]
    m = min(len(sx), len(sy))
    if m:
        neq2 = sx[-m:] != sy[-m:]
        suf = int(neq2[::-1].argmax()) if neq2.any() else m
    else:
        suf = 0
    end_x = len(ax) - suf
    end_y = len(ay) - suf
    return pre + suf, x[pre:end_x], y[pre:end_y]


def make_indel_ratio_udf(match_threshold: float = PRESCREEN_BOUND):
    """Build the InDel-ratio pandas UDF with a prescreen cutoff that is
    exact for decisions at ``match_threshold``: cutoff =
    min(PRESCREEN_BOUND, match_threshold), so a sub-threshold length-bound
    can never be returned as a score that passes the threshold."""
    cutoff = min(PRESCREEN_BOUND, float(match_threshold))

    @F.pandas_udf(T.DoubleType())
    def _indel_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        """InDel ratio with three batch-level fast paths: identical-string
        short-circuit, vectorized common prefix/suffix trimming (the DP then
        runs only on the differing core — near-dup pairs become ~free), and
        per-batch mask reuse (candidate pairs arrive grouped by block, so the
        same probe text recurs; its char bitmasks — the expensive half of the
        bit-parallel LCS — are built once)."""
        a, b = _prep(a), _prep(b)
        cache: dict[str, dict[str, int]] = {}
        out = []
        for x, y in zip(a, b):
            total = len(x) + len(y)
            if total == 0:
                out.append(1.0)
                continue
            if len(x) == 0 or len(y) == 0:
                out.append(0.0)
                continue
            if x == y:
                out.append(1.0)
                continue
            bound = 2.0 * min(len(x), len(y)) / total
            if bound < cutoff:
                out.append(bound)
                continue
            common, mx, my = _trim_common_affixes(x, y)
            if len(mx) == 0 or len(my) == 0:
                lcs = common
            else:
                masks = cache.get(mx)
                if masks is None:
                    masks = cache[mx] = _build_masks(mx)
                lcs = common + _lcs_from_masks(masks, len(mx), my)
            out.append(1.0 - (total - 2 * lcs) / total)
        return pd.Series(out, dtype="float64")

    return _indel_ratio


# default instance at the reference threshold (0.85 ≥ PRESCREEN_BOUND)
indel_ratio_udf = make_indel_ratio_udf()


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    a, b = _prep(a), _prep(b)
    return pd.Series([jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64")


@F.pandas_udf(T.DoubleType())
def token_set_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    a, b = _prep(a), _prep(b)
    return pd.Series([token_set_ratio(x, y) for x, y in zip(a, b)], dtype="float64")
