"""Property check of functions/urls.canonical_url against an
independent pure-Python twin of the documented contract.

The twin parses with str.partition/urllib-style splitting (first-'#'
then first-'?'), not with the Spark regexes, so a regex subtlety on
either side breaks the batch comparison. URLs are generated
deterministically (seeded Random) over the contract's domain —
schemes/hosts in mixed case, default and non-default and empty ports,
paths with 0-3 trailing slashes, query params including tracking
prefixes and values containing '?' and '=', fragments with decoy '?',
plus plain non-URL strings — and each batch runs as ONE Spark job.

This test caught a real defect: the original query regex `^[^#]*\\?`
was greedy, binding to the LAST pre-fragment '?' and silently dropping
everything between the first and last '?' of an RFC-legal query value.
"""

import random

from ai_data_matching_spark.functions.urls import TRACKING_PREFIXES, canonical_url

SCHEMES = ["http", "HTTP", "https", "HTTPS", "Ftp", "x-app"]
HOSTS = ["Ex.COM", "www.ex.com", "A.b.C.de", "XN--9.example"]
PORTS = ["", ":80", ":443", ":8080", ":"]
SEGS = ["A", "b", "c.html", "%41x", "~u", "1"]
KEYS = ["a", "B", "z", "utm_source", "utm_x", "fbclid", "gclid", "gclid_state", "q"]
VALS = ["1", "en", "a=b", "x?y", "", "M?=&stillval"[:6]]
FRAGS = ["", "#f", "#sec?x", "#a#b"]


def _gen(rng: random.Random) -> str:
    if rng.random() < 0.1:
        return rng.choice(["plain text", "no-scheme/path?x=1", "://bare", ""])
    scheme = rng.choice(SCHEMES)
    host = rng.choice(HOSTS)
    port = rng.choice(PORTS)
    path = "".join("/" + rng.choice(SEGS) for _ in range(rng.randint(0, 3)))
    path += "/" * rng.randint(0, 3)
    q = ""
    if rng.random() < 0.7:
        parts = [
            f"{rng.choice(KEYS)}={rng.choice(VALS)}" if rng.random() < 0.9 else rng.choice(KEYS)
            for _ in range(rng.randint(0, 4))
        ]
        q = "?" + "&".join(parts)
    return f"{scheme}://{host}{port}{path}{q}{rng.choice(FRAGS)}"


def canonical_url_py(u):
    """Contract twin: parse by first-'#' / first-'?' string splitting."""
    if u is None:
        return None
    sep = u.find("://")
    scheme = u[:sep] if sep > 0 else ""
    if not (scheme and scheme[0].isalpha() and all(c.isalnum() or c in "+.-" for c in scheme)):
        return u
    scheme = scheme.lower()
    rest = u[sep + 3:]
    rest = rest.split("#", 1)[0]  # fragment gone (first '#')
    rest, _, query = rest.partition("?")  # query starts at FIRST '?'
    # hostport ends at the first '/', '?' (already gone) — path is the rest
    slash = rest.find("/")
    hostport, path = (rest, "") if slash < 0 else (rest[:slash], rest[slash:])
    host, _, port = hostport.partition(":")
    host = host.lower()
    if not port.isdigit():
        port = ""
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    params = sorted(
        p
        for p in query.split("&")
        if p != "" and not any(p.startswith(t) for t in TRACKING_PREFIXES)
    )
    path = path.rstrip("/") or "/"
    out = scheme + "://" + host
    if port:
        out += ":" + port
    out += path
    if params:
        out += "?" + "&".join(params)
    return out


def test_canonical_url_matches_python_twin(spark):
    rng = random.Random(20260820)
    urls = [_gen(rng) for _ in range(400)] + [None]
    want = [canonical_url_py(u) for u in urls]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    got = [
        r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).orderBy("i").collect()
    ]
    mismatches = [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ]
    assert not mismatches, mismatches[:5]
