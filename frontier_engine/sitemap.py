"""Sitemap source (sitemaps.org XML protocol) — seed/refresh discovery
for the crawl frontier (beyond-reference; the reference starts from a
single landing URL, a tier crawl starts from robots.txt + sitemaps).

Pure-stdlib, same discipline as ``robots.py``/``warc.py``:

* ``parse_sitemap``      — one ``<urlset>`` / ``<sitemapindex>`` body
  (plain or gzip — Google serves ``sitemap.xml.gz``) → entry dicts
  with ``loc``/``lastmod``/``changefreq``/``priority``. Namespace-
  agnostic tag matching, malformed XML → empty (a bad sitemap must
  never kill an ingest task).
* ``sitemap_urls_from_robots`` — ``Sitemap:`` directives from a
  robots.txt body. Per the protocol these are NOT user-agent scoped,
  so this scans every line (unlike ``robots.parse_robots_txt``'s
  ``User-agent: *`` group logic).
* ``write_sitemap``      — the inverse (urlset or sitemapindex,
  optional gzip), so tests build archives with no external data.
* ``candidates_from_sitemaps`` — the Spark face: stored sitemap pages
  → frontier-candidate rows via one ``mapInPandas`` stage.

Index recursion is handled BY THE FRONTIER, not the driver: a
``<sitemapindex>`` entry is emitted as a candidate with
``is_sitemap = true`` — the crawl loop fetches it like any URL and the
next round's ingest parses it as a sitemap page. No driver-side
recursion, no unbounded loop (the seen-set dedupes re-listed
sitemaps), and a 50k-sitemap index fans out as 50k ordinary frontier
rows.

Priority folding mirrors ``linkgraph.apply_host_rank``: sitemap
``<priority>`` ∈ [0,1] scales to listing_score ∈ [0,10] — below one
depth step, so it orders URLs within a depth level and never overrides
the DFO discipline (schedule.py:36).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "parse_sitemap",
    "sitemap_urls_from_robots",
    "write_sitemap",
    "candidates_from_sitemaps",
    "is_sitemap_url_expr",
    "changefreq_ttl_s",
]

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("listing_score", T.DoubleType()),
        T.StructField("is_sitemap", T.BooleanType()),
        T.StructField("lastmod", T.TimestampType()),
        T.StructField("changefreq", T.StringType()),
    ]
)

# sitemaps.org changefreq → recrawl TTL seconds (recrawl.due_for_recrawl
# consumes this as the per-URL ttl hint; "always" re-crawls every round,
# "never" only on explicit expiry).
_CHANGEFREQ_TTL = {
    "always": 0.0,
    "hourly": 3600.0,
    "daily": 86400.0,
    "weekly": 604800.0,
    "monthly": 2592000.0,
    "yearly": 31536000.0,
    "never": float("inf"),
}


def changefreq_ttl_s(changefreq: str | None, default: float = 86400.0) -> float:
    """Map a sitemap changefreq hint to a re-crawl TTL in seconds."""
    if not changefreq:
        return default
    return _CHANGEFREQ_TTL.get(changefreq.strip().lower(), default)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _parse_w3c_datetime(s: str | None) -> datetime | None:
    """W3C datetime (the lastmod format): date-only or full ISO-8601 with
    offset. Returns a tz-naive UTC datetime (Spark TimestampType)."""
    if not s:
        return None
    s = s.strip()
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_sitemap(data: bytes) -> tuple[str, list[dict]]:
    """Parse one sitemap body (plain XML or gzip member).

    Returns ``(kind, entries)`` with kind ∈ {"urlset", "sitemapindex",
    "invalid"}. Each entry: ``{"loc", "lastmod", "changefreq",
    "priority"}`` (index entries only populate loc/lastmod). Entries
    without a ``<loc>`` are skipped; malformed XML yields
    ``("invalid", [])`` — never raises.
    """
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return "invalid", []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return "invalid", []
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return "invalid", []
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for node in root:
        if _localname(node.tag) != child_tag:
            continue
        fields: dict = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
        for sub in node:
            name = _localname(sub.tag)
            if name in fields:
                fields[name] = (sub.text or "").strip() or None
        if not fields["loc"]:
            continue
        if fields["priority"] is not None:
            try:
                fields["priority"] = float(fields["priority"])
            except ValueError:
                fields["priority"] = None
        entries.append(fields)
    return kind, entries


def sitemap_urls_from_robots(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — case-insensitive
    key, NOT scoped to any user-agent group (sitemaps.org protocol)."""
    out = []
    for line in (text or "").splitlines():
        line = line.split("#", 1)[0].strip()
        key, sep, val = line.partition(":")
        if sep and key.strip().lower() == "sitemap":
            val = val.strip()
            if val:
                out.append(val)
    return out


def write_sitemap(
    entries: list[dict], kind: str = "urlset", gzip_out: bool = False
) -> bytes:
    """Inverse of :func:`parse_sitemap` (tests build worlds data-free)."""
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(kind)
    child_tag = "url" if kind == "urlset" else "sitemap"
    root = ET.Element(f"{{{SITEMAP_NS}}}{kind}")
    for e in entries:
        node = ET.SubElement(root, f"{{{SITEMAP_NS}}}{child_tag}")
        for name in ("loc", "lastmod", "changefreq", "priority"):
            v = e.get(name)
            if v is not None:
                ET.SubElement(node, f"{{{SITEMAP_NS}}}{name}").text = str(v)
    buf = io.BytesIO()
    tree = ET.ElementTree(root)
    tree.write(buf, encoding="utf-8", xml_declaration=True, default_namespace=SITEMAP_NS)
    data = buf.getvalue()
    if gzip_out:
        data = gzip.compress(data, compresslevel=6)
    return data


def is_sitemap_url_expr(url=None):
    """Column predicate selecting sitemap URLs from the pages table
    (path mentions 'sitemap' and ends .xml or .xml.gz — the dominant
    publishing convention; robots-discovered sitemaps with other names
    should be fed in pre-filtered)."""
    url = F.col("url") if url is None else url
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    return path.contains("sitemap") & (path.endswith(".xml") | path.endswith(".xml.gz"))


def candidates_from_sitemaps(
    pages: DataFrame, base_depth: int = 1, default_priority: float = 0.5
) -> DataFrame:
    """Stored sitemap pages → frontier candidates.

    Input: any frame with ``url`` (string) + ``html`` (binary body —
    sitemaps can be gzip, so the byte column, not ``text``). The
    sitemap filter is applied here, so the whole pages table can be
    passed; Catalyst pushes the URL predicate into the scan and prunes
    to the two needed columns.

    Output rows follow the crawler's candidate shape (url, parent_url,
    depth, listing_score) plus ``is_sitemap`` (index child — fetch and
    re-ingest), ``lastmod`` and ``changefreq`` (recrawl TTL hints via
    :func:`changefreq_ttl_s`). listing_score = priority × 10 (below one
    depth step, like the PageRank boost).
    """
    src = pages.where(is_sitemap_url_expr()).select("url", "html")

    def explode(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for page_url, body in zip(pdf["url"], pdf["html"]):
                kind, entries = parse_sitemap(bytes(body) if body is not None else b"")
                for e in entries:
                    rows.append(
                        {
                            "url": e["loc"],
                            "parent_url": page_url,
                            "depth": base_depth,
                            "listing_score": 10.0
                            * (
                                e["priority"]
                                if e["priority"] is not None
                                else default_priority
                            ),
                            "is_sitemap": kind == "sitemapindex",
                            "lastmod": _parse_w3c_datetime(e["lastmod"]),
                            "changefreq": e["changefreq"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in ENTRY_SCHEMA.fields])

    return src.mapInPandas(explode, ENTRY_SCHEMA)
