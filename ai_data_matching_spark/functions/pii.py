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
PHONE_PATTERN = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"

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
