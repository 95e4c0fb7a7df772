"""CDX archive index sink: SURT key correctness, global sort across part
files, and manifest-pruned prefix lookup."""

import json
import os

import pytest
from pyspark.sql import functions as F

from frontier_engine.sinks import cdx_rows, read_cdx_prefix, surt_expr, write_cdx_index


def test_surt_expr_matches_python(spark):
    urls = [
        "https://sub.Example.COM/A/b?Q=1",
        "http://example.org/",
        "https://user@Host.Net/Path",
        "https://a.b.c.example.com/x/y/z?k=v&k2=v2",
        "http://example.com:8080/x",
        "https://example.com#frag",
        "https://example.com/p#frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = {r.url: r.surt for r in df.select("url", surt_expr(F.col("url")).alias("surt")).collect()}
    assert out["https://sub.Example.COM/A/b?Q=1"] == "com,example,sub)/a/b?q=1"
    assert out["http://example.org/"] == "org,example)/"
    assert out["https://user@Host.Net/Path"] == "net,host)/path"
    assert out["https://a.b.c.example.com/x/y/z?k=v&k2=v2"] == "com,example,c,b,a)/x/y/z?k=v&k2=v2"
    # ADVICE r4: port re-appended AFTER the reversed host (pywb SURT),
    # fragments dropped — both keys must sort inside com,example's range
    assert out["http://example.com:8080/x"] == "com,example:8080)/x"
    assert out["https://example.com#frag"] == "com,example)"
    assert out["https://example.com/p#frag"] == "com,example)/p"


@pytest.fixture(scope="module")
def cdx_world(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdx") / "index")
    pages = spark.range(2000).select(
        F.concat(
            F.lit("https://www.h"),
            F.lpad((F.col("id") % 20).cast("string"), 2, "0"),
            F.lit(".example/p/"),
            F.col("id"),
        ).alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.encode(F.concat(F.lit("body-"), F.col("id")), "UTF-8").alias("html"),
    )
    manifest = write_cdx_index(pages, path, n_parts=8)
    return path, manifest, pages


def test_cdx_index_globally_sorted_across_files(spark, cdx_world):
    path, manifest, _ = cdx_world
    keys = []
    for p in manifest["partitions"]:
        part = spark.read.parquet(os.path.join(path, p["file"]))
        part_keys = [r.surt for r in part.select("surt").collect()]
        # sorted within the file (parquet preserves write order)
        assert part_keys == sorted(part_keys)
        keys.extend(part_keys)
    # manifest order == global order: file i's range ends before file i+1's
    assert keys == sorted(keys)
    assert len(keys) == 2000
    los = [p["lo"] for p in manifest["partitions"]]
    assert los == sorted(los)


def test_cdx_prefix_lookup_prunes_and_matches_full_scan(spark, cdx_world):
    path, manifest, pages = cdx_world
    prefix = "example,h07,www)"
    hit = read_cdx_prefix(spark, path, prefix)
    got = sorted(r.url for r in hit.collect())
    full = spark.read.parquet(path).where(F.col("surt").startswith(prefix))
    want = sorted(r.url for r in full.collect())
    assert got == want and len(got) == 100  # ids ≡ 7 (mod 20)
    # the manifest restricted the read to a strict subset of files
    overlapping = [
        p for p in manifest["partitions"]
        if p["hi"] >= prefix and (p["lo"] <= prefix or p["lo"].startswith(prefix))
    ]
    assert 0 < len(overlapping) < len(manifest["partitions"])
    # digest/length columns carried through
    row = hit.limit(1).collect()[0]
    assert row.digest is not None and row.length > 0


def test_cdx_missing_prefix_returns_empty(spark, cdx_world):
    path, _, _ = cdx_world
    assert read_cdx_prefix(spark, path, "zz,nowhere)").count() == 0


def test_cdx_prefix_survives_astral_plane_lowest_key(spark, tmp_path):
    """ADVICE r4: a partition whose LOWEST matching key continues the
    prefix with a >U+FFFF character compared greater than the old
    `prefix + U+FFFF` upper bound and was wrongly pruned."""
    path = str(tmp_path / "astral")
    pages = spark.createDataFrame(
        [(f"https://example.com/\U00010348gothic/{i}",) for i in range(5)],
        ["url"],
    )
    write_cdx_index(pages, path, n_parts=1)
    hit = read_cdx_prefix(spark, path, "com,example)/")
    assert hit.count() == 5
