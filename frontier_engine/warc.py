"""Pure-stdlib WARC (ISO 28500) source — reading Common-Crawl-style
archives straight into the engine's ``pages`` shape.

Common Crawl publishes page captures as ``.warc.gz``: concatenated
per-record gzip members, each a WARC record (header block + payload),
where a ``response`` record's payload is the raw HTTP response. All of
that is stdlib territory:

* ``iter_warc``   — record iterator over plain or per-record-gzip WARC
  bytes (multi-member zlib inflate via ``unused_data`` chaining),
  validating Content-Length framing and the record separator.
* ``parse_http_response`` — status line + case-insensitive headers +
  body split for response payloads.
* ``write_warc``  — the inverse (warcinfo + response records, optional
  per-record gzip members, deterministic record ids), so round-trip
  tests can build archives without external data.
* ``read_warc``   — the Spark face: ``binaryFile`` scan → one
  Arrow-batched ``mapInPandas`` stage that explodes each archive into
  ``pages`` rows (url, warc_ts, html, text, lang) with ``text``
  derived by the engine's own ``html_to_text`` (keeping the repo's
  byte-parity invariant: the same function generates and serves).

Scale notes (100 TB of WARC): parallelism is per-FILE — Common Crawl
ships ~1 GB archives, and a gzip member stream cannot be split
mid-file, so the unit of work is the archive (same as every production
WARC reader); a 100k-file crawl dump fans out to 100k tasks. The
mapInPandas stage sees only (path, content) and emits plain columns, so
everything downstream (canon/dedupe/parse) prunes and pushes down as if
the rows came from parquet. Re-materialize to parquet/Iceberg after
first read for columnar pruning on later passes — ``read_warc`` is the
INGEST edge, not the steady-state store.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from hashlib import blake2b
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (API symmetry)
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip wrapper
    return co.compress(data) + co.flush()


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the .warc.gz layout)."""
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        do = zlib.decompressobj(31)
        out += do.decompress(rest)
        out += do.flush()
        rest = do.unused_data
    if rest:
        raise ValueError("WARC: trailing non-gzip bytes in .gz archive")
    return bytes(out)


def _warc_date(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record(wtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [WARC_VERSION.decode()]
    head.append(f"WARC-Type: {wtype}")
    for k, v in headers.items():
        head.append(f"{k}: {v}")
    head.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def write_warc(
    pages: list[dict],
    gzip_per_record: bool = True,
    warcinfo: str = "software: frontier-engine-tests",
) -> bytes:
    """Page dicts (url, ts: datetime, html: bytes, optional lang,
    status, content_type) → WARC archive bytes. ``gzip_per_record``
    writes the standard .warc.gz layout (one gzip member per record)."""
    records = []
    info_payload = (warcinfo + "\r\n").encode()
    records.append(
        _record(
            "warcinfo",
            {
                "WARC-Date": _warc_date(datetime(2020, 1, 1, tzinfo=timezone.utc)),
                "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
                "Content-Type": "application/warc-fields",
            },
            info_payload,
        )
    )
    for p in pages:
        html: bytes = p["html"] if isinstance(p["html"], bytes) else p["html"].encode()
        status = p.get("status", 200)
        http_headers = [
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'ERR'}",
            f"Content-Type: {p.get('content_type', 'text/html; charset=utf-8')}",
            f"Content-Length: {len(html)}",
        ]
        if p.get("lang"):
            http_headers.append(f"Content-Language: {p['lang']}")
        http = ("\r\n".join(http_headers) + "\r\n\r\n").encode() + html
        rid = blake2b(p["url"].encode(), digest_size=16).hexdigest()
        records.append(
            _record(
                "response",
                {
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": _warc_date(p["ts"]),
                    "WARC-Record-ID": f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>",
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    if gzip_per_record:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def iter_warc(data: bytes) -> Iterator[dict]:
    """Yield {type, headers (dict, case-preserved), payload} per record.
    Accepts plain WARC or concatenated-gzip-member .warc.gz bytes."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("WARC: unterminated record header")
        head = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {head[0]!r}")
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC: missing/bad Content-Length") from e
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("WARC: truncated record payload")
        if data[body_start + length : body_start + length + 4] != b"\r\n\r\n":
            raise ValueError("WARC: missing record separator")
        yield {
            "type": headers.get("WARC-Type", ""),
            "headers": headers,
            "payload": payload,
        }
        pos = body_start + length + 4


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response payload → (status, lowercase-keyed headers, body)."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0 or not payload.startswith(b"HTTP/"):
        return 200, {}, payload  # resource-style payload: all body
    lines = payload[:head_end].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[head_end + 4 :]


def _records_to_page_rows(content: bytes) -> list[dict]:
    from frontier_engine.html_text import html_to_text

    rows = []
    for rec in iter_warc(bytes(content)):
        if rec["type"] != "response":
            continue
        status, http_headers, body = parse_http_response(rec["payload"])
        if status != 200:
            continue
        url = rec["headers"].get("WARC-Target-URI", "")
        date = rec["headers"].get("WARC-Date", "1970-01-01T00:00:00Z")
        ts = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        html = body
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": html_to_text(html.decode("utf-8", "replace")),
                "lang": http_headers.get("content-language", "und"),
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files → the engine's ``pages`` DataFrame.

    ``binaryFile`` scan (one task per archive — the natural WARC
    parallelism unit) → mapInPandas explode into page rows. The UDF
    stage sees only (content); path/length/modtime are pruned."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for content in pdf["content"]:
                out.extend(_records_to_page_rows(content))
            yield pd.DataFrame(
                out, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(run, PAGES_SCHEMA)


def write_warc_world(spec, out_dir: str, n_archives: int = 4) -> list[str]:
    """Fixture world → ``n_archives`` .warc.gz files (pages sharded by
    url hash — the multi-file layout read_warc parallelizes over).
    Returns the file paths."""
    import os

    from frontier_engine.fixtures import generate_world

    os.makedirs(out_dir, exist_ok=True)
    pages = generate_world(spec)["pages"]
    shards: list[list[dict]] = [[] for _ in range(n_archives)]
    for _, r in pages.iterrows():
        shard = int.from_bytes(blake2b(r["url"].encode(), digest_size=2).digest(), "big") % n_archives
        ts = r["warc_ts"].to_pydatetime() if hasattr(r["warc_ts"], "to_pydatetime") else r["warc_ts"]
        shards[shard].append(
            {"url": r["url"], "ts": ts, "html": r["html"], "lang": r["lang"]}
        )
    paths = []
    for i, shard in enumerate(shards):
        p = os.path.join(out_dir, f"part-{i:04d}.warc.gz")
        with open(p, "wb") as f:
            f.write(write_warc(shard))
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# WET export (late r4): Common Crawl's text-extraction sibling format —
# WARC "conversion" records carrying the extracted plain text
# ---------------------------------------------------------------------------


def write_wet(pages: list[dict], gzip_per_record: bool = True) -> bytes:
    """Page dicts (url, ts: datetime, text: str) → WET archive bytes:
    a warcinfo record followed by one ``conversion`` record per page
    (WARC-Type: conversion, Content-Type: text/plain — the cc WET
    layout), per-record gzip members by default."""
    records = [
        _record(
            "warcinfo",
            {
                "WARC-Date": _warc_date(datetime(2020, 1, 1, tzinfo=timezone.utc)),
                "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
                "Content-Type": "application/warc-fields",
            },
            b"software: frontier-engine\r\nformat: WET\r\n",
        )
    ]
    for p in pages:
        payload = p["text"].encode("utf-8", "replace")
        rid = blake2b(b"wet:" + p["url"].encode(), digest_size=16).hexdigest()
        records.append(
            _record(
                "conversion",
                {
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": _warc_date(p["ts"]),
                    "WARC-Record-ID": f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>",
                    "Content-Type": "text/plain",
                },
                payload,
            )
        )
    if gzip_per_record:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def wet_archives(pages: DataFrame, records_per_archive: int = 10_000) -> DataFrame:
    """The Spark face of WET export: pages → one serialized ``.wet.gz``
    archive per group of *records_per_archive* pages, as rows
    ``(archive_id, n_records, wet)`` with ``wet`` the archive bytes.

    Scale shape: archive assignment is ``xxhash64(url) %
    ceil(n/records_per_archive)`` — a deterministic hash partitioning,
    so the output set is stable under re-execution and parallelism; one
    shuffle groups each archive's pages onto one task, and an
    Arrow-batched ``applyInPandas`` serializes per group (the text
    bytes cross the boundary exactly once, as the payload they become).
    Write the result with ``.write.parquet`` (archive blobs as a binary
    column — the Iceberg-friendly shape) or dump each row to
    ``<archive_id>.warc.wet.gz`` for pywb-style consumers; round-trip
    readable by :func:`iter_warc`.

    ``serialize`` is deliberately the ONE-DataFrame-per-group
    grouped-map form (plain pdf→pdf signature), NOT the iterator form:
    the iterator form yields one Arrow batch at a time
    (``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k), and
    serializing per batch would fragment any archive over ~10k pages
    into multiple same-``archive_id`` rows, each with its own warcinfo —
    the dump-to-``<archive_id>.warc.wet.gz`` pattern would then silently
    overwrite fragments (ADVICE r4). One row out per group, always.

    ``warc_ts`` crosses the Arrow boundary as epoch seconds, not a
    timestamp: applyInPandas delivers timestamps localized to
    ``spark.sql.session.timeZone``, so relabeling the naive value as UTC
    would shift WARC-Date by the session-zone offset (ADVICE r4); the
    epoch is zone-free."""
    n = pages.count()
    n_archives = max(1, -(-n // records_per_archive))

    def serialize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        rows = [
            {
                "url": r.url,
                "ts": datetime.fromtimestamp(int(r.ts_epoch), tz=timezone.utc),
                "text": r.text or "",
            }
            for r in pdf.itertuples()
        ]
        blob = write_wet(rows)
        return pd.DataFrame(
            {
                "archive_id": [int(pdf["_aid"].iloc[0])],
                "n_records": [len(rows)],
                "wet": [blob],
            }
        )

    assigned = pages.select(
        "url", "text",
        F.unix_timestamp("warc_ts").alias("ts_epoch"),
        (F.pmod(F.xxhash64("url"), F.lit(n_archives))).alias("_aid"),
    )
    out_schema = T.StructType(
        [
            T.StructField("archive_id", T.LongType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("wet", T.BinaryType()),
        ]
    )
    return assigned.groupBy("_aid").applyInPandas(serialize, out_schema)
