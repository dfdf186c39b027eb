"""Unit tests for functions/urls.canonical_url — each case pins one rule
of the module's canonicalization contract (the DuckDB twin in
__spark_entry__.oracle_sql()['url_canonicalize'] mirrors the same rules;
the parity test covers the two staying in lockstep)."""

from ai_data_matching_spark.functions.urls import canonical_url

CASES = [
    # tracking params dropped, survivors sorted, scheme/host lowered,
    # default https port dropped, trailing slash stripped, fragment gone
    (
        "HTTPS://WWW.Ex.COM:443/Path/?utm_source=f&z=9&a=en&utm_medium=x#frag",
        "https://www.ex.com/Path?a=en&z=9",
    ),
    # :443 is NOT default for http — kept
    ("HTTP://ex.com:443/a/", "http://ex.com:443/a"),
    # :80 IS default for http — dropped; root path keeps its slash
    ("http://EX.com:80/", "http://ex.com/"),
    # empty path becomes '/'
    ("https://ex.com", "https://ex.com/"),
    # multiple trailing slashes + bare '?' both vanish
    ("https://ex.com/a///?", "https://ex.com/a"),
    # a '?' inside the fragment is not a query
    ("https://ex.com/a#sec?notaquery", "https://ex.com/a"),
    # fbclid dropped; gclid_state is NOT gclid= — kept; non-default port kept
    (
        "https://ex.com:8080/A/b?fbclid=1&gclid_state=x",
        "https://ex.com:8080/A/b?gclid_state=x",
    ),
    # path case preserved (only scheme/host fold)
    ("https://ex.com/CamelCase", "https://ex.com/CamelCase"),
    # non-URL passthrough, unchanged
    ("not a url 7", "not a url 7"),
    (None, None),
]


def test_canonical_url_contract(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every URL case — the
    function must be a projection so it can run on already-clean feeds."""
    urls = [u for u, want in CASES if u is not None and want is not None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r[0] for r in df.select(canonical_url("url")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r[0] for r in df2.select(canonical_url("url")).collect()]
    assert once == twice
