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
