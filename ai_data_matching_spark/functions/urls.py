"""URL canonicalization — native Spark column expressions, no Python.

Re-crawl identity in the ER pipeline is keyed by ``url``
(``blocking.latest_crawl_wins``): two crawls of one page whose URLs
differ only in tracking parameters, default ports, scheme/host case, or
a trailing slash would otherwise enter the corpus as distinct documents
and surface as near-duplicate clusters instead of replacing each other.
At Common-Crawl scale that inflation is endemic (utm_* tagging), so
``canonical_url`` normalizes those axes as a plain column expression
that runs upstream of the pipeline — inside whole-stage codegen, one
pass, no UDF.

Scope note: the reference app keys rows by exact id columns
(``/root/reference/src/data_processor.py``) and has no URL handling;
this module is web-scale graft surface, not reference parity.

Canonicalization contract (mirrored byte-for-byte by the DuckDB twin in
``__spark_entry__.oracle_sql()['url_canonicalize']``):

* scheme and host lowercased; path and query VALUES left case-sensitive
* fragment dropped
* default ports dropped (``http:80``, ``https:443``); others kept
* tracking params dropped: ``utm_*``, ``fbclid``, ``gclid``, ``msclkid``
* surviving params sorted bytewise (full ``k=v`` string); an empty
  query string (including a bare ``?``) is dropped
* trailing slashes stripped from non-root paths; an empty path → ``/``
* inputs that do not start ``scheme://`` are passed through unchanged
  (never NULLed — callers decide how to treat non-URLs)

Deliberately out of scope (kept verbatim): userinfo (``user@host``),
bracketed-IPv6 / multi-colon netlocs, percent-encoding normalization,
IDN/punycode, param-value re-ordering inside one key (``a=2&a=1``
keeps both, sorted as strings).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prefixes a surviving query param must NOT start with (the '=' suffix
# on the id-style params keeps a legitimate 'gclid_state=x' alive)
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query sits strictly between the FIRST pre-fragment '?' and the
# fragment. The prefix class excludes both '#' and '?': with only '#'
# excluded the greedy prefix binds \? to the LAST pre-fragment '?',
# silently dropping everything between the first and last '?' of a
# query whose VALUES legally contain '?' (RFC 3986 allows it) — caught
# by the property test against the pure-Python twin.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _col(url) -> Column:
    return F.col(url) if isinstance(url, str) else url


def canonical_url(url) -> Column:
    """Canonical form of ``url`` per the module contract (native exprs)."""
    u = _col(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    raw_query = F.regexp_extract(u, _QUERY_RE, 1)

    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )

    def _kept(p: Column) -> Column:
        cond = p != F.lit("")
        for pre in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pre)
        return cond

    params = F.array_sort(F.filter(F.split(raw_query, "&"), _kept))
    query = F.array_join(params, "&")

    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # non-URL passthrough keeps the row auditable; NULL in, NULL out
    return F.when(scheme == "", u).otherwise(rebuilt)
