"""WARC source: record framing, gzip member chaining, HTTP payload
parsing, and the Spark ingest face producing the exact pages shape the
fixture world carries (same urls, same html bytes, same engine text)."""

from datetime import datetime, timezone

import pytest

from frontier_engine import warc as WC


def mk_pages(n=5):
    return [
        {
            "url": f"https://host{i % 2}.example/page/{i}",
            "ts": datetime(2021, 3, 4, 5, 6, i, tzinfo=timezone.utc),
            "html": f"<html><body><p>doc {i} &amp; more</p></body></html>".encode(),
            "lang": ["en", "es"][i % 2],
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_records(gz):
    pages = mk_pages()
    data = WC.write_warc(pages, gzip_per_record=gz)
    recs = list(WC.iter_warc(data))
    assert recs[0]["type"] == "warcinfo"
    resp = [r for r in recs if r["type"] == "response"]
    assert len(resp) == 5
    for p, r in zip(pages, resp):
        assert r["headers"]["WARC-Target-URI"] == p["url"]
        status, hh, body = WC.parse_http_response(r["payload"])
        assert status == 200
        assert body == p["html"]
        assert hh["content-language"] == p["lang"]
        assert hh["content-type"].startswith("text/html")


def test_gzip_members_are_independent():
    # .warc.gz = one gzip member per record: each member must inflate
    # alone (that is what makes per-record random access possible)
    import zlib

    pages = mk_pages(3)
    data = WC.write_warc(pages)
    members = []
    rest = data
    while rest:
        do = zlib.decompressobj(31)
        members.append(do.decompress(rest) + do.flush())
        rest = do.unused_data
    assert len(members) == 4  # warcinfo + 3 responses
    for m in members:
        assert m.startswith(b"WARC/1.0")


def test_non200_and_non_response_records_skipped():
    pages = mk_pages(3)
    pages[1]["status"] = 404
    rows = WC._records_to_page_rows(WC.write_warc(pages))
    assert [r["url"] for r in rows] == [pages[0]["url"], pages[2]["url"]]
    # engine text derived from the body
    assert rows[0]["text"] == "doc 0 & more"
    assert rows[0]["lang"] == "en"
    assert rows[0]["warc_ts"] == datetime(2021, 3, 4, 5, 6, 0)


def test_truncation_and_framing_errors():
    data = WC.write_warc(mk_pages(2), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated|separator"):
        list(WC.iter_warc(data[:-10]))
    with pytest.raises(ValueError, match="bad version"):
        list(WC.iter_warc(b"NOTWARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    # resource-style payload (no HTTP prefix) → all body
    status, hh, body = WC.parse_http_response(b"raw bytes only")
    assert status == 200 and hh == {} and body == b"raw bytes only"


def test_read_warc_matches_fixture_world(spark, tmp_path):
    """The Spark ingest face: read_warc over the sharded fixture-world
    archives must reproduce the pages table — same url set, per-url
    byte-identical html, and text equal to the committed golden (the
    byte-parity invariant carried through the WARC edge)."""
    from frontier_engine.fixtures import WorldSpec, generate_world

    spec = WorldSpec(n_hosts=6, listings_total=24)
    paths = WC.write_warc_world(spec, str(tmp_path / "warcs"), n_archives=3)
    assert len(paths) == 3
    got = {r.url: r for r in WC.read_warc(spark, str(tmp_path / "warcs")).collect()}
    want = generate_world(spec)["pages"]
    assert set(got) == set(want["url"])
    for _, w in want.iterrows():
        g = got[w["url"]]
        assert bytes(g.html) == bytes(w["html"])
        assert g.text == w["text"]
        assert g.lang == w["lang"]


def test_read_warc_stage_prunes_to_content(spark, tmp_path):
    """The mapInPandas stage must see ONLY the content column — path,
    length and modificationTime are pruned before the Python stage."""
    paths = WC.write_warc_world(
        __import__("frontier_engine.fixtures", fromlist=["WorldSpec"]).WorldSpec(
            n_hosts=2, listings_total=4
        ),
        str(tmp_path / "w"),
        n_archives=1,
    )
    df = WC.read_warc(spark, paths[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = [
        ln.split("ReadSchema:", 1)[1] for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert schemas == [" struct<content:binary>"]


def test_wet_roundtrip_and_deterministic_archives(spark):
    """WET export: conversion records round-trip through iter_warc with
    exact text payloads; archive assignment is deterministic under
    re-execution and parallelism."""
    from datetime import datetime, timezone

    from frontier_engine.warc import iter_warc, wet_archives

    pages = spark.createDataFrame(
        [
            (f"https://h{i % 5}.example/p/{i}",
             datetime(2026, 1, 1, tzinfo=timezone.utc),
             f"extracted text body {i} with unicode: café")
            for i in range(200)
        ],
        "url string, warc_ts timestamp, text string",
    )
    out = wet_archives(pages, records_per_archive=50).collect()
    assert sum(r.n_records for r in out) == 200
    assert len(out) == 4  # ceil(200/50) hash-assigned archives
    seen = {}
    for r in out:
        recs = list(iter_warc(bytes(r.wet)))
        assert recs[0]["type"] == "warcinfo"
        conv = [x for x in recs[1:]]
        assert all(x["type"] == "conversion" for x in conv)
        assert len(conv) == r.n_records
        for x in conv:
            seen[x["headers"]["WARC-Target-URI"]] = x["payload"].decode("utf-8")
    assert len(seen) == 200
    assert seen["https://h0.example/p/0"] == "extracted text body 0 with unicode: café"
    # determinism: same archive ids + record counts at different parallelism
    out2 = wet_archives(pages.repartition(13), records_per_archive=50).collect()
    a = sorted((r.archive_id, r.n_records) for r in out)
    b = sorted((r.archive_id, r.n_records) for r in out2)
    assert a == b


def test_wet_archive_larger_than_arrow_batch_is_one_row(spark):
    """ADVICE r4 (high): a group bigger than arrow maxRecordsPerBatch
    must still serialize to ONE archive row — the iterator-form
    applyInPandas fragmented it into one row per Arrow batch, each with
    its own warcinfo, which the <archive_id>.warc.wet.gz dump pattern
    would silently overwrite."""
    from datetime import datetime, timezone

    from frontier_engine.warc import iter_warc, wet_archives

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "40")  # force >1 Arrow batch for the 130-row group
    try:
        pages = spark.createDataFrame(
            [
                (f"https://one.example/p/{i}",
                 datetime(2026, 1, 1, tzinfo=timezone.utc), f"text {i}")
                for i in range(130)
            ],
            "url string, warc_ts timestamp, text string",
        )
        out = wet_archives(pages, records_per_archive=1000).collect()
        assert len(out) == 1  # ONE row, not ceil(130/40) fragments
        assert out[0].n_records == 130
        recs = list(iter_warc(bytes(out[0].wet)))
        assert [r["type"] for r in recs].count("warcinfo") == 1
        assert sum(1 for r in recs if r["type"] == "conversion") == 130
        # records are sorted by url across the WHOLE group
        uris = [r["headers"]["WARC-Target-URI"] for r in recs if r["type"] == "conversion"]
        assert uris == sorted(uris)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_wet_warc_date_is_utc_under_non_utc_session_tz(spark):
    """ADVICE r4: WARC-Date must be the UTC instant regardless of
    spark.sql.session.timeZone — applyInPandas localizes timestamps to
    the session zone, so relabeling the naive value as UTC shifted the
    date by the zone offset."""
    from datetime import datetime, timezone

    from frontier_engine.warc import iter_warc, wet_archives

    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")  # UTC-5 in January
    try:
        pages = spark.createDataFrame(
            [("https://tz.example/a",
              datetime(2026, 1, 15, 12, 0, 0, tzinfo=timezone.utc), "body")],
            "url string, warc_ts timestamp, text string",
        )
        out = wet_archives(pages).collect()
        recs = [r for r in iter_warc(bytes(out[0].wet)) if r["type"] == "conversion"]
        assert recs[0]["headers"]["WARC-Date"] == "2026-01-15T12:00:00Z"
    finally:
        spark.conf.set(key, old)
