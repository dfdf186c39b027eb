"""Kernel correctness: bit-parallel LCS vs naive DP, published JW values,
InDel ratio semantics (fuzz.ratio parity — SURVEY §2.8)."""

import random

import pytest

from ai_data_matching_spark.functions.similarity import (
    _lcs_len,
    _lcs_len_naive,
    indel_distance,
    indel_ratio,
    jaro_winkler,
    token_set_ratio,
)


def test_lcs_bit_parallel_matches_naive_dp():
    rng = random.Random(123)
    for _ in range(500):
        a = "".join(rng.choice("abcdef ") for _ in range(rng.randrange(0, 64)))
        b = "".join(rng.choice("abcdef ") for _ in range(rng.randrange(0, 64)))
        assert _lcs_len(a, b) == _lcs_len_naive(a, b)


def test_indel_known_values():
    assert indel_distance("abc", "abc") == 0
    assert indel_distance("abc", "abd") == 2  # substitution costs 2 in InDel
    assert indel_ratio("", "") == 1.0
    assert indel_ratio("abc", "") == 0.0
    # fuzz.ratio("this is a test", "this is a test!") == 96.55...
    assert indel_ratio("this is a test", "this is a test!") == pytest.approx(0.9655, abs=1e-3)


def test_jaro_winkler_published_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("dwayne", "duane") == pytest.approx(0.84, abs=1e-3)
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("a", "") == 0.0


def test_token_set_ratio_order_invariance():
    assert token_set_ratio("fuzzy was a bear", "bear a was fuzzy") == 1.0
    assert token_set_ratio("abc def", "abc def xyz") > 0.6


def test_udfs_match_scalar_kernels(spark):
    from pyspark.sql import functions as F

    from ai_data_matching_spark.functions.similarity import (
        indel_ratio_udf,
        jaro_winkler_udf,
    )

    rows = [("hello world", "helo world"), ("acme corp", "acme inc"), ("", "x")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        "a", "b", indel_ratio_udf("a", "b").alias("i"), jaro_winkler_udf("a", "b").alias("j")
    ).collect()
    for r in got:
        assert r["i"] == pytest.approx(indel_ratio(r["a"], r["b"]))
        assert r["j"] == pytest.approx(jaro_winkler(r["a"], r["b"]))


def test_prescreen_clamps_to_low_threshold(spark):
    """With fuzzy_threshold < PRESCREEN_BOUND the UDF must return EXACT
    ratios for every pair at/above the threshold — never the inflated
    length-ratio bound (ADVICE r01: false fuzzy edges at threshold 0.7)."""
    from ai_data_matching_spark.functions.similarity import (
        indel_ratio,
        make_indel_ratio_udf,
    )

    # |a|=7, |b|=9 → bound = 2*7/16 = 0.875? pick a pair whose bound is in
    # [0.7, 0.8) but whose true ratio is far below 0.7
    a, b = "abcdefg", "tuvwxyzjk"  # bound = 14/16 = 0.875 → need longer b
    a, b = "abcdefg", "tuvwxyzjklmn"  # bound = 14/19 ≈ 0.7368, true ratio = 0
    assert 0.7 <= 2 * min(len(a), len(b)) / (len(a) + len(b)) < 0.8
    df = spark.createDataFrame([(a, b)], "x string, y string")
    from pyspark.sql import functions as F

    got = df.select(make_indel_ratio_udf(0.7)(F.col("x"), F.col("y")).alias("r")).collect()[0]["r"]
    assert abs(got - indel_ratio(a, b)) < 1e-12
    assert got < 0.7  # the true ratio — correctly below threshold
