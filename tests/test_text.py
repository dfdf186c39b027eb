"""Text-analysis functions: native expressions vs hand-computed values."""

import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    subword_count_est,
    token_count,
)


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the barn"),
        (2, "der hund und die katze ist das tier und der vogel"),
        (3, "le chat et la souris est dans les champs et le jardin"),
        (4, ""),
        (5, "zzz qqq xxx"),
        (6, "Hello, world! This is a test sentence, with punctuation."),
    ]
    return spark.createDataFrame(rows, "id long, text string").cache()


def _get(tdf, col, _id):
    return {r["id"]: r["v"] for r in tdf.select("id", col.alias("v")).collect()}[_id]


def test_token_count(tdf):
    assert _get(tdf, token_count(F.col("text")), 1) == 14
    assert _get(tdf, token_count(F.col("text")), 4) == 0


def test_lang_id(tdf):
    assert _get(tdf, lang_id(F.col("text")), 1) == "en"
    assert _get(tdf, lang_id(F.col("text")), 2) == "de"
    assert _get(tdf, lang_id(F.col("text")), 3) == "fr"
    assert _get(tdf, lang_id(F.col("text")), 4) == "und"
    assert _get(tdf, lang_id(F.col("text")), 5) == "und"


def test_stopword_and_punct_ratio(tdf):
    # 'the' x3 + 'and' + 'to' = 5 stopword hits of 14 tokens
    assert _get(tdf, stopword_ratio(F.col("text")), 1) == pytest.approx(5 / 14)
    assert _get(tdf, punct_ratio(F.col("text")), 1) == 0.0
    assert _get(tdf, punct_ratio(F.col("text")), 6) > 0.0


def test_mean_word_length(tdf):
    text = "the quick brown fox jumps over the lazy dog and runs to the barn"
    words = text.split()
    expected = sum(len(w) for w in words) / len(words)
    assert _get(tdf, mean_word_length(F.col("text")), 1) == pytest.approx(expected)


def test_quality_score_bounds(tdf):
    vals = [r["v"] for r in tdf.select(quality_score(F.col("text")).alias("v")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert _get(tdf, quality_score(F.col("text")), 1) > _get(tdf, quality_score(F.col("text")), 4)


def test_subword_estimate_monotone(tdf):
    short = _get(tdf, subword_count_est(F.col("text")), 5)
    long_ = _get(tdf, subword_count_est(F.col("text")), 1)
    assert long_ > short > 0


def test_fingerprint_stability(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "other words here")]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = {r["id"]: r["fp"] for r in df.select("id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_marker_count_adjacent_repeats(spark):
    """Adjacent repeated stopwords must each count (regression: the padded
    non-overlapping replace counted 'the the the' as 2), and tokens split
    on any whitespace, not just literal spaces."""
    from ai_data_matching_spark.functions.text import _substr_count, stopword_ratio

    df = spark.createDataFrame([("the the the",), ("the\nthe\tthe x",)], "t string")
    got = df.select(
        _substr_count(F.col("t"), "the").alias("n"),
        F.round(stopword_ratio(F.col("t")), 6).alias("r"),
    ).collect()
    assert got[0]["n"] == 3 and got[0]["r"] == 1.0
    assert got[1]["n"] == 3 and got[1]["r"] == 0.75


def test_repetition_signals_hand_computed(spark):
    """Gopher-family repetition rules on crafted docs.

    Doc A 'x\\ny\\nx\\nzz': dup lines = both 'x' instances (2 chars) over
    total 1+1+1+2=5 -> 0.4. Doc B no dups -> 0.0; empty doc -> 0.0.
    Top-bigram on 'a b a b a' (len 9): bigrams [ab,ba,ab,ba], top
    coverage 2*3=6 -> 6/9. dup-5gram on 'a b c d e a b c d e a b c d e'
    (len 29, 11 grams): the repeated values are the 5-cycle's 5 distinct
    gram strings, each occurring 2-3x, so ALL 11 instances repeat -> 1.0;
    'a b c d e f' (2 distinct grams... actually 2 grams, both unique)
    -> 0.0."""
    from pyspark.sql import functions as F

    from ai_data_matching_spark.functions.text import (
        dup_line_char_frac,
        dup_ngram_word_frac,
        top_ngram_char_frac,
    )

    df = spark.createDataFrame(
        [
            (1, "x\ny\nx\nzz"),
            (2, "a\nb"),
            (3, ""),
            (4, "a b a b a"),
            (5, "a b c d e a b c d e a b c d e"),
            (6, "a b c d e f"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["l"], r["g2"], r["g5"])
        for r in df.select(
            "id",
            F.round(dup_line_char_frac(F.col("text")), 6).alias("l"),
            F.round(top_ngram_char_frac(F.col("text"), n=2), 6).alias("g2"),
            F.round(dup_ngram_word_frac(F.col("text"), n=5), 6).alias("g5"),
        ).collect()
    }
    assert out[1][0] == 0.4
    assert out[2][0] == 0.0 and out[3] == (0.0, 0.0, 0.0)
    assert out[4][1] == round(6 / 9, 6)
    assert out[5][2] == 1.0
    assert out[6][2] == 0.0


def test_repetition_signals_max_units_cap(spark):
    """The quadratic window is bounded: a doc with its repetition beyond
    the cap reads as clean under the capped slice, and the cap keeps the
    expression cheap on adversarially long docs (contract, not a bug —
    the signal is about the document's head at production thresholds)."""
    from pyspark.sql import functions as F

    from ai_data_matching_spark.functions.text import dup_ngram_word_frac

    text = " ".join(str(i) for i in range(40)) + " q w e r t q w e r t"
    df = spark.createDataFrame([(text,)], "text string")
    capped = df.select(
        F.round(dup_ngram_word_frac(F.col("text"), n=5, max_units=40), 6).alias("v")
    ).collect()[0]["v"]
    full = df.select(
        F.round(dup_ngram_word_frac(F.col("text"), n=5), 6).alias("v")
    ).collect()[0]["v"]
    assert capped == 0.0 and full > 0.0


# ---------------------------------------------------------------------------
# gopher_quality_filter — the composite keep/drop rule chain
# ---------------------------------------------------------------------------

_CYCLE10 = " ".join(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj"] * 2)

_RULE_DOCS = [
    # (text, expected reason)
    ("ok doc " + " ".join(f"word{i}" for i in range(20)), "ok"),
    ("too few", "too_short"),
    (" ".join(["a"] * 12), "word_length"),  # mwl 1 < 2
    (" ".join(["..."] * 12), "punct"),  # mwl 3 ok, punct 0.75 > 0.2
    (
        "foo bar baz qux quux\nfoo bar baz qux quux\nother words entirely here",
        "dup_line",
    ),
    ("go go go go go go go go go go go", "top_2gram"),
    # a 10-token cycle repeated: every 5-gram duplicates (dup5 = 1.0) but
    # each 2-gram covers only 2*5/59 ≈ 0.17 of the chars (top2 passes)
    (_CYCLE10, "dup_5gram"),
]


def test_gopher_filter_reasons(spark):
    from ai_data_matching_spark.functions.text import gopher_quality_filter

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(_RULE_DOCS)], "id long, text string"
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id", gopher_quality_filter(F.col("text")).alias("g")
        ).select("id", "g.*").collect()
    }
    for i, (text, want) in enumerate(_RULE_DOCS):
        assert rows[i]["reason"] == want, f"{text!r}: {rows[i]}"
        assert rows[i]["keep"] == (want == "ok")


def test_gopher_filter_custom_thresholds(spark):
    from ai_data_matching_spark.functions.text import gopher_quality_filter

    df = spark.createDataFrame([(" ".join(["tok"] * 30),)], "text string")
    r = df.select(
        gopher_quality_filter(
            F.col("text"), max_tokens=20, max_dup5=1.1
        ).alias("g")
    ).select("g.*").collect()[0]
    assert r["reason"] == "too_long" and not r["keep"]
