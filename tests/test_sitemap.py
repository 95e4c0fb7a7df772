"""Sitemap source (sitemap.py): round-trip, gzip, namespace variants,
robots discovery, malformed-input safety, and the Spark explode face."""

import gzip
from datetime import datetime

import pytest
import pyspark.sql.functions as F

from frontier_engine.sitemap import (
    candidates_from_sitemaps,
    changefreq_ttl_s,
    is_sitemap_url_expr,
    parse_sitemap,
    sitemap_urls_from_robots,
    write_sitemap,
)
from frontier_engine.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(master="local[4]", shuffle_partitions=4)


URLSET = [
    {
        "loc": "https://ex.example/a",
        "lastmod": "2026-05-01",
        "changefreq": "daily",
        "priority": "0.8",
    },
    {"loc": "https://ex.example/b", "lastmod": "2026-05-02T10:30:00+02:00"},
    {"loc": "https://ex.example/c"},
]


def test_urlset_round_trip_plain_and_gzip():
    for gz in (False, True):
        data = write_sitemap(URLSET, gzip_out=gz)
        if gz:
            assert data[:2] == b"\x1f\x8b"
        kind, entries = parse_sitemap(data)
        assert kind == "urlset"
        assert [e["loc"] for e in entries] == [u["loc"] for u in URLSET]
        assert entries[0]["priority"] == pytest.approx(0.8)
        assert entries[0]["changefreq"] == "daily"
        assert entries[2]["lastmod"] is None


def test_sitemapindex_round_trip():
    idx = [
        {"loc": "https://ex.example/sitemap-1.xml", "lastmod": "2026-01-01"},
        {"loc": "https://ex.example/sitemap-2.xml.gz"},
    ]
    kind, entries = parse_sitemap(write_sitemap(idx, kind="sitemapindex"))
    assert kind == "sitemapindex"
    assert [e["loc"] for e in entries] == [i["loc"] for i in idx]


def test_namespace_agnostic_and_malformed():
    bare = b"""<?xml version="1.0"?><urlset><url><loc>https://x.example/p</loc>
    <priority>not-a-number</priority></url><url><notloc>skip</notloc></url></urlset>"""
    kind, entries = parse_sitemap(bare)
    assert kind == "urlset"
    assert len(entries) == 1 and entries[0]["priority"] is None
    assert parse_sitemap(b"<html>not a sitemap</html>") == ("invalid", [])
    assert parse_sitemap(b"\x1f\x8b corrupt gzip") == ("invalid", [])
    assert parse_sitemap(b"< broken xml") == ("invalid", [])


def test_robots_sitemap_directives_not_ua_scoped():
    text = """User-agent: somebot
Disallow: /private
SITEMAP: https://ex.example/sitemap.xml
User-agent: *
Sitemap: https://ex.example/sitemap-extra.xml.gz  # trailing comment
sitemap:
"""
    assert sitemap_urls_from_robots(text) == [
        "https://ex.example/sitemap.xml",
        "https://ex.example/sitemap-extra.xml.gz",
    ]
    assert sitemap_urls_from_robots("") == []


def test_changefreq_ttl_monotonic():
    order = ["always", "hourly", "daily", "weekly", "monthly", "yearly", "never"]
    vals = [changefreq_ttl_s(c) for c in order]
    assert vals == sorted(vals)
    assert changefreq_ttl_s(None, default=123.0) == 123.0
    assert changefreq_ttl_s("DAILY") == 86400.0


def test_spark_explode_face(spark, tmp_path):
    """Pages table with a gzip urlset, a sitemapindex, and a non-sitemap
    page → candidate rows with parsed hints; index children flagged."""
    sm1 = write_sitemap(URLSET, gzip_out=True)
    idx = write_sitemap(
        [{"loc": "https://ex.example/sitemap-sub.xml", "lastmod": "2026-02-03"}],
        kind="sitemapindex",
    )
    rows = [
        ("https://ex.example/sitemap.xml.gz", bytearray(sm1)),
        ("https://ex.example/sitemap_index.xml", bytearray(idx)),
        ("https://ex.example/page.html", bytearray(b"<html></html>")),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = candidates_from_sitemaps(pages).orderBy("url").collect()
    by_url = {r.url: r for r in out}
    assert set(by_url) == {
        "https://ex.example/a",
        "https://ex.example/b",
        "https://ex.example/c",
        "https://ex.example/sitemap-sub.xml",
    }
    a = by_url["https://ex.example/a"]
    assert a.parent_url == "https://ex.example/sitemap.xml.gz"
    assert a.listing_score == pytest.approx(8.0)
    assert a.changefreq == "daily"
    assert a.lastmod == datetime(2026, 5, 1, 0, 0)
    assert not a.is_sitemap
    # tz-offset lastmod normalized to UTC
    assert by_url["https://ex.example/b"].lastmod == datetime(2026, 5, 2, 8, 30)
    # no priority → default 0.5 → score 5
    assert by_url["https://ex.example/c"].listing_score == pytest.approx(5.0)
    sub = by_url["https://ex.example/sitemap-sub.xml"]
    assert sub.is_sitemap and sub.lastmod == datetime(2026, 2, 3)

    # parquet path: scan prunes to (url, html) and pushes nothing weird
    p = str(tmp_path / "pages")
    pages.withColumn("extra", F.lit("x")).write.parquet(p)
    out2 = candidates_from_sitemaps(spark.read.parquet(p))
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<url:string,html:binary>" in plan
    assert out2.count() == 4


def test_is_sitemap_url_expr(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml",),
            ("https://a.example/sitemaps/sitemap-5.xml.gz",),
            ("https://a.example/page.html",),
            ("https://a.example/sitemap.xml?page=2",),  # query kept out of path
            ("https://a.example/data.xml",),
        ],
        "url string",
    )
    got = sorted(r.url for r in df.where(is_sitemap_url_expr()).collect())
    assert got == [
        "https://a.example/sitemap.xml",
        "https://a.example/sitemap.xml?page=2",
        "https://a.example/sitemaps/sitemap-5.xml.gz",
    ]
