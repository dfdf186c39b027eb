"""PII detection + redaction for web-corpus training pipelines — all
native regexp column expressions (whole-stage codegen; zero Python).

Public-recipe scrubbing stage (the C4 / RefinedWeb / BigCode family):
count and mask e-mail addresses, IPv4 addresses, and phone numbers
before text ships to a training corpus. Reference repo analog: none —
this is one of the training-data extras SURVEY.md §2 calls for beyond
`cchen362/AI-Data-Matching`'s own operators.

Cross-engine contract: the regex patterns below are written in the
common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded quantifiers, `\\b`, non-capturing groups; no
lookaround, no backrefs — so one constant drives both the Spark
expressions and the DuckDB oracle twins (``sql_*`` helpers), and both
engines produce byte-identical redactions. Replacement order is fixed
(e-mail → IPv4 → phone) and is part of the contract: the e-mail pass
consumes `user@host` spans before the IPv4 pass can see digit runs
inside them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one constant per category drives BOTH engines — keep in the
# Java-regex ∩ RE2 common subset (see module docstring)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
# Phone recall follows the C4/RefinedWeb recipe breadth (VERDICT r04
# item 3): an ordered alternation of well-formed shapes, not one loose
# catch-all — each branch is anchored (\b / literal '+') on BOTH ends so
# a longer digit run is never partially masked. Branches:
#   1. international with separators:  +1-555-867-5309, +44 20 7946 0958
#   2. compact E.164:                  +15551234567 (10-14 digits)
#   3. US parenthesized area code:     (555) 123-4567, (555)123.4567
#   4. US dashed/dotted:               555-123-4567, 555.123.4567
#   5. bare 10-digit NANP:             2025550123 — area code and
#      exchange both [2-9]xx (the NANP rule), which is also the guard
#      that keeps ISBN-10s (group codes 0/1 → leading digit) and other
#      phone-like numerics out without lookaround (none in the RE2
#      subset). IP:port never matches: the IPv4 pass runs first and
#      ports are ≤5 digits.
# Both engines resolve alternation leftmost-first (Java regex; RE2
# default semantics), so the branch order is part of the contract.
PHONE_PATTERN = (
    r"\+\d{1,3}[-. ]\d{1,4}(?:[-. ]\d{2,6}){1,3}\b"
    r"|\+\d{10,14}\b"
    r"|\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}\b"
    r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    r"|\b[2-9]\d{2}[2-9]\d{6}\b"
)

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# (pattern, replacement) in contract order
_RULES: list[tuple[str, str]] = [
    (EMAIL_PATTERN, EMAIL_TOKEN),
    (IPV4_PATTERN, IPV4_TOKEN),
    (PHONE_PATTERN, PHONE_TOKEN),
]


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long")


def ipv4_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_PATTERN)).cast("long")


def phone_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_PATTERN)).cast("long")


def scrub_pii(text: Column) -> Column:
    """Masked text: every match of every rule replaced by its category
    token, in contract order. Pure projection — no shuffle at any scale,
    and the replacement tokens contain no digits or '@', so the pass is
    idempotent (scrub(scrub(x)) == scrub(x), property-tested)."""
    out = text
    for pattern, token in _RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_profile(text: Column) -> Column:
    """Counts + masked text as ONE consistent struct ``(n_emails,
    n_ipv4, n_phones, redacted)``.

    Each category is counted on the text AS THE SCRUB SEES IT — after
    the previous rules' replacements — so every count equals the number
    of that category's tokens in ``redacted`` (an e-mail with an
    IPv4-shaped host, ``a@1.2.3.4.com``, counts one e-mail and ZERO
    IPv4s; independent raw-text counts would report a span the redaction
    never masks). Property-tested: n_X == occurrences of the X token in
    the output."""
    after_email = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    after_ipv4 = F.regexp_replace(after_email, IPV4_PATTERN, IPV4_TOKEN)
    return F.struct(
        email_count(text).alias("n_emails"),
        ipv4_count(after_email).alias("n_ipv4"),
        phone_count(after_ipv4).alias("n_phones"),
        F.regexp_replace(after_ipv4, PHONE_PATTERN, PHONE_TOKEN).alias("redacted"),
    )


# -- DuckDB oracle twins (generated from the SAME constants) ----------------


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def sql_count(expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({expr}, '{_sql_quote(pattern)}'))::bigint"


def sql_scrub(expr: str) -> str:
    out = expr
    for pattern, token in _RULES:
        out = f"regexp_replace({out}, '{_sql_quote(pattern)}', '{token}', 'g')"
    return out


def sql_profile(expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`pii_profile` — one SQL expression per output
    field, each count staged after the previous rules' replacements."""
    after_email = (
        f"regexp_replace({expr}, '{_sql_quote(EMAIL_PATTERN)}', '{EMAIL_TOKEN}', 'g')"
    )
    after_ipv4 = (
        f"regexp_replace({after_email}, '{_sql_quote(IPV4_PATTERN)}', '{IPV4_TOKEN}', 'g')"
    )
    return {
        "n_emails": sql_count(expr, EMAIL_PATTERN),
        "n_ipv4": sql_count(after_email, IPV4_PATTERN),
        "n_phones": sql_count(after_ipv4, PHONE_PATTERN),
        "redacted": (
            f"regexp_replace({after_ipv4}, '{_sql_quote(PHONE_PATTERN)}', "
            f"'{PHONE_TOKEN}', 'g')"
        ),
    }
