"""URL canonicalization + hashing (SURVEY §2.2 P18, §2.4 D3).

The reference builds URLs with
``urlunparse(['https', 'www.airbnb.com', path, None, urlencode(query), None])``
(``/root/reference/deepbnb/api/ApiBase.py:20-25``) and relies on Scrapy's
framework request-fingerprint dedup, which canonicalizes the URL (sorted
query params, no fragment, normalized case/ports) before hashing. This
module re-expresses that contract:

* :func:`canonicalize` — a pure, idempotent Python function (property-tested
  with hypothesis: ``canon(canon(u)) == canon(u)``).
* :func:`canonicalize_udf` — the same function as an Arrow-vectorized
  pandas UDF for use on a ``url`` column (U1).
* :func:`with_canon_columns` — attaches ``canon_url``, ``host``,
  ``url_hash`` (JVM-side ``xxhash64`` over the canon string — stays in
  whole-stage codegen; no Python in the hashing hot path).

At 10^10-frontier scale the canon string is computed once at discovery
time and carried as a frontier column; all downstream dedupe/joins key on
the 64-bit ``url_hash`` (collision expectation at 10^10 keys ≈
10^20/2^65 ≈ 0.003 — negligible, and the exact-confirm table stores the
full canon string anyway).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# characters we keep un-escaped in paths (RFC 3986 pchar minus %)
_PATH_SAFE = "/;:@&=+$,!*'()~-._"
_QUERY_SAFE = ";:@&=+$,!*'()~-._"


def _norm_netloc(scheme: str, netloc: str) -> str:
    """Lowercase host, strip default port, keep userinfo untouched."""
    userinfo, sep, hostport = netloc.rpartition("@")
    hostport = hostport.lower()
    host, _, port = hostport.partition(":")
    if port and _DEFAULT_PORTS.get(scheme) == port:
        hostport = host
    elif port:
        hostport = f"{host}:{port}"
    else:
        hostport = host
    return f"{userinfo}{sep}{hostport}" if sep else hostport


def canonicalize(url: str) -> str:
    """Canonical form of *url*: lowercase scheme+host, default port removed,
    fragment stripped, query keys sorted (stable within a key), consistent
    percent-encoding, empty path → '/'.

    Idempotent; mirrors the canonical-before-fingerprint discipline the
    reference inherits from its framework dedup filter (SURVEY §2.4 D3).
    """
    if url is None:
        return None
    url = url.strip()
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    netloc = _norm_netloc(scheme, parts.netloc)
    path = quote(unquote(parts.path), safe=_PATH_SAFE) or "/"
    # sorted(key) stable sort keeps duplicate-key order (matches w3lib-style
    # canonicalization the framework fingerprint uses)
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    query = urlencode(sorted(pairs, key=lambda kv: kv[0]), safe=_QUERY_SAFE, quote_via=quote)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Host (no port, no userinfo) of *url*; '' when unparseable."""
    if url is None:
        return None
    netloc = urlsplit(url.strip()).netloc
    host = netloc.rpartition("@")[2].partition(":")[0]
    return host.lower()


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize, na_action="ignore")


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore")


def url_hash_col(canon_col: Column) -> Column:
    """64-bit hash of the canon string — JVM-side xxhash64 (codegen'd)."""
    return F.xxhash64(canon_col)


def with_canon_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canon_url / host / url_hash to a DataFrame of raw URLs.

    The two pandas UDFs run in one Python stage (Arrow-batched); the hash
    is computed JVM-side from the canon string.
    """
    return (
        df.withColumn("canon_url", canonicalize_udf(F.col(url_col)))
        .withColumn("host", host_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_col(F.col("canon_url")))
    )
