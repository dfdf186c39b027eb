"""Text-analysis functions for training-data pipelines — all native
column expressions (whole-stage codegen; zero Python).

* token counting (whitespace + a BPE-ish subword regex estimate)
* quality scoring (length / punctuation / stopword ratios → flag)
* language ID (stopword-marker n-gram heuristic)
* document fingerprinting (shingle-hash rolling min — content-addressable id)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import tokens_col, word_shingles

# language marker words — counted as substrings with space guards
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "ist", "das"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
}

_STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def subword_count_est(text: Column) -> Column:
    """BPE-ish subword count estimate: alphanumeric runs + digits +
    punctuation marks each count as ~1 token, long words split every 6
    chars (a public rule-of-thumb approximation, not a trained tokenizer)."""
    words = tokens_col(text)
    per_word = F.transform(
        words,
        lambda w: F.greatest(F.ceil(F.length(w) / F.lit(6.0)).cast("long"), F.lit(1).cast("long")),
    )
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda a, b: a + b) + punct


def _substr_count(text: Column, needle: str) -> Column:
    """Count of whitespace-delimited tokens equal to ``needle`` after
    lowercasing. Token equality, not padded-substring replacement: the
    non-overlapping replace of ' w ' undercounts adjacent repeats ("the
    the the" → 2, boundaries share one space) and misses tokens bounded
    by tabs/newlines. Mirrored by the DuckDB oracle twin in lockstep."""
    return F.size(F.filter(tokens_col(F.lower(text)), lambda t: t == needle)).cast("long")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _STOPWORDS_EN
    hits = sum([_substr_count(text, w) for w in sw[1:]], _substr_count(text, sw[0]))
    n = token_count(text)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}]", ""))
    total = F.length(text)
    return F.when(total > 0, n_punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards 50–10k tokens, plausible
    word lengths, some-but-not-wild punctuation, nonzero stopword ratio
    (the public C4/Gopher-style rule family, simplified & deterministic)."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.2))
    pr = punct_ratio(text)
    punct_ok = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.4))
    return F.round((len_ok + mwl_ok + punct_ok) / F.lit(3.0), 6)


def lang_id(text: Column) -> Column:
    """Predicted language = argmax over marker-word hit counts; 'und'
    (undetermined) when no marker fires. Deterministic tie-break by
    language code order en < de < fr < es via strict > comparison."""
    scores = {lang: sum([_substr_count(text, w) for w in ws[1:]], _substr_count(text, ws[0]))
              for lang, ws in _LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in ["en", "de", "fr", "es"]:  # earlier entry wins ties (strict >)
        s = scores[lang]
        cond = (s > 0) & (s > best_score)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def doc_fingerprint(text: Column, shingle_k: int = 3) -> Column:
    """Content fingerprint: min over shingle xxhash64 values (a 1-perm
    MinHash) — stable under reordering-free edits, cheap rolling id."""
    sh = word_shingles(tokens_col(text), k=shingle_k)
    return F.coalesce(F.array_min(F.transform(sh, lambda s: F.xxhash64(s))), F.lit(0).cast("long"))


# ---------------------------------------------------------------------------
# Repetition signals (the Gopher-rule family, Rae et al. 2021 §A1.1) —
# within-document repetition is the single strongest public heuristic for
# machine-generated/boilerplate web text. All native higher-order
# expressions; each is O(units²) within one document, so callers cap the
# unit count (``max_units``) — the published rules read the whole doc,
# but at 100 TB a pathological 10M-token doc must not quadratic-blow a
# task, and the signal saturates long before the cap.
# ---------------------------------------------------------------------------


def _dup_flags(s: Column) -> Column:
    """Per-element is-duplicated flags over a BOUND, SORTED array (see
    ``_let``): after ``array_sort`` equal values are adjacent, so an
    element's value occurs ≥2× in the array iff it equals a neighbor —
    O(n) flag pass instead of the O(n²) pairwise occurrence count, with
    identical semantics. ``F.get`` (0-based) returns NULL out of range
    (never an ANSI error), and ``false & NULL`` is false, so the edge
    elements need no special casing."""
    n = F.size(s)
    return F.when(n == 0, F.array().cast("array<boolean>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda j: (
                ((j > 0) & (F.get(s, j) == F.get(s, j - 1)))
                | ((j < n - 1) & (F.get(s, j) == F.get(s, j + 1)))
            ),
        )
    )


# let-binding for HOF expression trees — see functions/hof.py for the
# full doctrine (nested non-lambda subtrees re-evaluate per element,
# and CollapseProject inlines through a plain two-step select)
from .hof import let_bound as _let  # noqa: E402


def _word_grams(toks: Column, n: int) -> Column:
    """Word n-grams over a BOUND token array (see ``_let``)."""
    k = F.size(toks) - n + 1
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def dup_line_char_frac(text: Column, sep: str = "\n", max_units: int = 2000) -> Column:
    """Fraction of characters that sit in duplicated lines: total length
    of line instances whose exact value occurs ≥2× in the document,
    over total length of all lines (separators excluded; empty lines
    ignored). 0.0 for texts with no (non-empty) lines."""
    lines_expr = F.slice(
        F.filter(F.split(text, sep), lambda x: x != ""), 1, max_units
    )

    def body(lines: Column) -> Column:
        total = F.aggregate(
            lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )

        def over_sorted(s: Column) -> Column:
            # sorted-neighbor duplicate detection: O(n log n), value-
            # identical to the pairwise count (see _dup_flags)
            dup_chars = F.aggregate(
                F.zip_with(
                    s, _dup_flags(s),
                    lambda x, d: F.when(d, F.length(x).cast("long")).otherwise(
                        F.lit(0).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, c: acc + c,
            )
            return F.when(total > 0, dup_chars / total).otherwise(F.lit(0.0))

        return _let(F.array_sort(lines), over_sorted)

    return _let(lines_expr, body)


def top_ngram_char_frac(text: Column, n: int = 2, max_units: int = 2000) -> Column:
    """Fraction of characters covered by the single most frequent word
    n-gram: occurrences × n-gram length over total text length (the
    Gopher "top n-gram" rule). Ties resolve to the maximal coverage
    value, which is what the rule thresholds on. 0.0 when the document
    has fewer than ``n`` tokens."""
    total = F.length(text)

    def body(toks: Column) -> Column:
        def over_grams(grams: Column) -> Column:
            # run-length max over the SORTED grams: a single O(n) fold
            # tracks (previous value, current run, best coverage); the
            # best is updated at every step, so a run of length k
            # contributes k·len exactly as count(v)·len(v) does — value-
            # identical to the pairwise form, O(n log n) total
            best = F.aggregate(
                F.array_sort(grams),
                F.struct(
                    F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"),
                ),
                lambda acc, x: F.struct(
                    x.alias("prev"),
                    F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1).cast("long"))
                    .alias("run"),
                    F.greatest(
                        acc["best"],
                        F.when(x == acc["prev"], acc["run"] + 1)
                        .otherwise(F.lit(1).cast("long"))
                        * F.length(x),
                    ).alias("best"),
                ),
                lambda acc: acc["best"],
            )
            return F.when(
                (F.size(grams) > 0) & (total > 0), best / total
            ).otherwise(F.lit(0.0))

        return _let(_word_grams(toks, n), over_grams)

    return _let(F.slice(tokens_col(text), 1, max_units), body)


def dup_ngram_word_frac(text: Column, n: int = 5, max_units: int = 2000) -> Column:
    """Fraction of n-gram instances that are within-document repeats
    (value occurs ≥2×) — the Gopher "duplicate n-grams" rule shape. 0.0
    when the document has fewer than ``n`` tokens."""

    def body(toks: Column) -> Column:
        def over_grams(grams: Column) -> Column:
            def over_sorted(s: Column) -> Column:
                # sorted-neighbor flags (see _dup_flags): O(n log n),
                # value-identical to the pairwise occurrence count
                dup = F.size(F.filter(_dup_flags(s), lambda d: d))
                return F.when(F.size(s) > 0, dup / F.size(s)).otherwise(
                    F.lit(0.0)
                )

            return _let(F.array_sort(grams), over_sorted)

        return _let(_word_grams(toks, n), over_grams)

    return _let(F.slice(tokens_col(text), 1, max_units), body)


def gopher_quality_filter(
    text: Column,
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mwl: float = 2.0,
    max_mwl: float = 12.0,
    max_punct: float = 0.2,
    max_dup_line: float = 0.3,
    max_top2: float = 0.2,
    max_dup5: float = 0.3,
    max_units: int = 2000,
) -> Column:
    """Composite keep/drop document filter — the Gopher rule family
    (Rae et al. 2021 §A1.1) over this module's native signals, as one
    struct column ``(n_tokens, mean_word_len, punct_ratio, dup_line_frac,
    top2_char_frac, dup5_word_frac, reason, keep)``.

    ``reason`` is the FIRST failing rule in the fixed order below (or
    ``'ok'``); ``keep = (reason == 'ok')``. Rules compare the raw double
    signals (the struct carries them rounded to 6 dp for reporting only),
    and thresholds are parameters so a deployment can match the published
    Gopher numbers exactly. Length bounds default lower than Gopher's
    50-token floor because the rule set, not the corpus statistics, is
    the contract under test. Still a pure per-row projection: zero
    shuffle, zero Python at any scale."""
    # every signal is let-bound (see ``_let``) so ONE evaluation of the
    # returned struct costs O(max_units log max_units) — a caller
    # expanding the struct with ``g.*`` still duplicates the tree per
    # field, but each copy stays cheap
    signals = F.struct(
        token_count(text).cast("long").alias("n"),
        mean_word_length(text).alias("mwl"),
        punct_ratio(text).alias("pr"),
        dup_line_char_frac(text, max_units=max_units).alias("dline"),
        top_ngram_char_frac(text, n=2, max_units=max_units).alias("top2"),
        dup_ngram_word_frac(text, n=5, max_units=max_units).alias("dup5"),
    )

    def body(s: Column) -> Column:
        n, mwl, pr = s["n"], s["mwl"], s["pr"]
        dline, top2, dup5 = s["dline"], s["top2"], s["dup5"]
        reason = (
            F.when(n < min_tokens, F.lit("too_short"))
            .when(n > max_tokens, F.lit("too_long"))
            .when((mwl < min_mwl) | (mwl > max_mwl), F.lit("word_length"))
            .when(pr > max_punct, F.lit("punct"))
            .when(dline > max_dup_line, F.lit("dup_line"))
            .when(top2 > max_top2, F.lit("top_2gram"))
            .when(dup5 > max_dup5, F.lit("dup_5gram"))
            .otherwise(F.lit("ok"))
        )
        return F.struct(
            n.alias("n_tokens"),
            F.round(mwl, 6).alias("mean_word_len"),
            F.round(pr, 6).alias("punct_ratio"),
            F.round(dline, 6).alias("dup_line_frac"),
            F.round(top2, 6).alias("top2_char_frac"),
            F.round(dup5, 6).alias("dup5_word_frac"),
            reason.alias("reason"),
            (reason == "ok").alias("keep"),
        )

    return _let(signals, body)
