"""PII detection + redaction (functions/pii.py): planted-span behavior,
DuckDB RE2 parity from the shared pattern constants, and the idempotence
property the module docstring promises."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.functions import pii

CASES = [
    # (raw, n_emails, n_ipv4, n_phones, redacted)
    (
        "mail me at jane.doe+spam@sub.example.org today",
        1, 0, 0,
        "mail me at <EMAIL> today",
    ),
    (
        "server 10.0.255.3 and 192.168.1.77 are up",
        0, 2, 0,
        "server <IP> and <IP> are up",
    ),
    (
        "call +1-555-867-5309 or +44-020-794-6000",
        0, 0, 2,
        "call <PHONE> or <PHONE>",
    ),
    (
        "a@b.co b@c.io 1.2.3.4 +1-222-333-4444",
        2, 1, 1,
        "<EMAIL> <EMAIL> <IP> <PHONE>",
    ),
    # email host wins over the IPv4 pass (contract order)
    ("ping root@4.example.com ok", 1, 0, 0, "ping <EMAIL> ok"),
    # 5 dotted octets: leftmost 4 match, trailing .5 survives
    ("addr 1.2.3.4.5 end", 0, 1, 0, "addr <IP>.5 end"),
    # version strings with 3 octets never match
    ("pip install pkg==1.2.3 now", 0, 0, 0, "pip install pkg==1.2.3 now"),
    ("no pii here at all", 0, 0, 0, "no pii here at all"),
    ("", 0, 0, 0, ""),
]


def _spark_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, raw string"
    )
    out = df.select(
        "id",
        pii.email_count(F.col("raw")).alias("e"),
        pii.ipv4_count(F.col("raw")).alias("i"),
        pii.phone_count(F.col("raw")).alias("p"),
        pii.scrub_pii(F.col("raw")).alias("red"),
    ).collect()
    return {r["id"]: (r["e"], r["i"], r["p"], r["red"]) for r in out}


def test_planted_cases(spark):
    got = _spark_rows(spark, [c[0] for c in CASES])
    for i, (raw, e, ip, p, red) in enumerate(CASES):
        assert got[i] == (e, ip, p, red), f"case {i!r}: {raw!r} -> {got[i]}"


def test_duckdb_parity_on_adversarial_and_real_text(spark):
    rng = random.Random(11)
    frags = [
        "x@y.zz", "a.b@c.d.ee", "not@an@email", "@nope", "tld@short.a",
        "1.2.3.4", "12.34.56.78", "999.999.999.999", "1.2.3", "1.2.3.4.5.6",
        "+1-234-567-8901", "+12-345-678-9012", "+1-23-456-7890", "1-555-123-4567",
        "word", "a+b@c-d.net.", "(10.0.0.1)", "v1.2.3.4rc", "..", "@",
    ]
    texts = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(150)
    ]
    texts += [
        r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(100).collect()
    ]
    got = _spark_rows(spark, texts)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, raw VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    want = {
        row[0]: row[1:]
        for row in con.execute(
            f"""SELECT id,
                    {pii.sql_count('raw', pii.EMAIL_PATTERN)},
                    {pii.sql_count('raw', pii.IPV4_PATTERN)},
                    {pii.sql_count('raw', pii.PHONE_PATTERN)},
                    {pii.sql_scrub('raw')}
                FROM t"""
        ).fetchall()
    }
    assert got == want


# -- labeled phone-format corpus (VERDICT r04 item 3) ----------------------
# positives: the widened pattern must mask the WHOLE span; negatives:
# phone-like numerics (ISBNs, IP:port, dates, versions, short/long digit
# runs) must survive untouched.
PHONE_POSITIVES = [
    "+1-555-867-5309",          # international dashed (original form)
    "+44-020-794-6000",
    "+44 20 7946 0958",         # international spaced
    "+1 555 867 5309",
    "+49.30.901820",            # international dotted
    "+15551234567",             # compact E.164
    "+442079460958",
    "(555) 123-4567",           # US parenthesized
    "(555)123-4567",
    "(555) 123 4567",
    "(555)1234567",
    "555-123-4567",             # US dashed
    "555.123.4567",             # US dotted
    "2025550123",               # bare NANP 10-digit
    "9195551234",
]
PHONE_NEGATIVES = [
    "ISBN 0306406152",          # ISBN-10 (group code 0 → fails NANP)
    "ISBN 1861972717",          # ISBN-10 (group code 1)
    "9780306406157",            # ISBN-13 (13 digits — no \b\d{10}\b fit)
    "978-0-306-40615",          # ISBN-13 dashed (1-3-5 groups, not 3-3-4)
    "10.0.0.1:8080",            # IP:port — IPv4 masked first, port ≤5 digits
    "2026-08-21",               # date
    "v1.2.3.4rc",
    "order 123456789",          # 9 digits
    "id 12345678901",           # 11 digits
    "1234567890",               # 10 digits, area code starts 1 → not NANP
    "0223334444",               # 10 digits, area code starts 0
    "2220334444",               # exchange starts 0 → not NANP
    "$1,234,567.89",
]


def test_phone_format_corpus_recall_and_guards(spark):
    texts = [f"call {p} now" for p in PHONE_POSITIVES] + [
        f"ref {n} ok" for n in PHONE_NEGATIVES
    ]
    got = _spark_rows(spark, texts)
    for i, p in enumerate(PHONE_POSITIVES):
        e, ip, ph, red = got[i]
        assert ph >= 1 and red == "call <PHONE> now", (p, got[i])
    for j, n in enumerate(PHONE_NEGATIVES):
        i = len(PHONE_POSITIVES) + j
        e, ip, ph, red = got[i]
        assert ph == 0, (n, got[i])
        # the span itself must survive (modulo an IPv4 mask, which is
        # the contract for IP:port)
        if "." not in n or ":" not in n:
            assert n in red or "<IP>" in red, (n, red)


def test_phone_corpus_duckdb_parity(spark):
    """The widened alternation is the first multi-branch pattern — pin
    leftmost-first parity between Java regex and DuckDB RE2 on every
    labeled positive/negative plus adversarial concatenations."""
    import duckdb as _d

    texts = (
        [f"x {p} y" for p in PHONE_POSITIVES]
        + [f"x {n} y" for n in PHONE_NEGATIVES]
        + [
            " ".join(PHONE_POSITIVES),
            " ".join(PHONE_NEGATIVES),
            "+1 22 33 44 55",           # spaced run at the repeat cap
            "+123456789012345",         # 15 digits — too long for compact E.164
            "(555) 123-45678",          # 5-digit tail breaks the \b
            "5551234567890",            # 13-digit run — no internal match
        ]
    )
    got = _spark_rows(spark, texts)
    con = _d.connect()
    con.execute("CREATE TABLE t (id BIGINT, raw VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    want = {
        row[0]: row[1:]
        for row in con.execute(
            f"""SELECT id,
                    {pii.sql_count('raw', pii.EMAIL_PATTERN)},
                    {pii.sql_count('raw', pii.IPV4_PATTERN)},
                    {pii.sql_count('raw', pii.PHONE_PATTERN)},
                    {pii.sql_scrub('raw')}
                FROM t"""
        ).fetchall()
    }
    assert got == want


def test_scrub_is_idempotent(spark):
    texts = [c[0] for c in CASES] + ["x@y.zz 1.2.3.4 +1-222-333-4444 " * 3]
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    rows = df.select(
        pii.scrub_pii(F.col("raw")).alias("once"),
        pii.scrub_pii(pii.scrub_pii(F.col("raw"))).alias("twice"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]


def test_replacement_tokens_carry_no_matchable_chars():
    for tok in (pii.EMAIL_TOKEN, pii.IPV4_TOKEN, pii.PHONE_TOKEN):
        assert "@" not in tok and not any(ch.isdigit() for ch in tok)


def test_profile_counts_match_redaction_tokens(spark):
    """pii_profile's contract: every count equals that category's token
    occurrences in the redacted output — including the overlap cases
    where raw-text counting would disagree (IPv4-shaped e-mail hosts,
    phone-shaped locals)."""
    texts = [c[0] for c in CASES] + [
        "contact a@1.2.3.4.com now",      # email consumes the IPv4-shaped host
        "+1-555-867-5309@x.com wins",     # email consumes the phone-shaped local
        "a@1.2.3.4.com and 5.6.7.8 and +1-222-333-4444",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    from ai_data_matching_spark.functions.pii import pii_profile

    rows = df.select(pii_profile(F.col("raw")).alias("p")).select("p.*").collect()
    for t, r in zip(texts, rows):
        red = r["redacted"]
        assert r["n_emails"] == red.count(pii.EMAIL_TOKEN), (t, red)
        assert r["n_ipv4"] == red.count(pii.IPV4_TOKEN), (t, red)
        assert r["n_phones"] == red.count(pii.PHONE_TOKEN), (t, red)


def test_profile_matches_duckdb(spark):
    texts = [c[0] for c in CASES] + ["a@1.2.3.4.com x 9.9.9.9 +1-111-222-3333"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, raw string"
    )
    from ai_data_matching_spark.functions.pii import pii_profile, sql_profile

    got = {
        r["id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"], r["redacted"])
        for r in df.select("id", pii_profile(F.col("raw")).alias("p"))
        .select("id", "p.*").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, raw VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    prof = sql_profile("raw")
    want = {
        row[0]: row[1:]
        for row in con.execute(
            f"""SELECT id, {prof['n_emails']}, {prof['n_ipv4']},
                       {prof['n_phones']}, {prof['redacted']} FROM t"""
        ).fetchall()
    }
    assert got == want
