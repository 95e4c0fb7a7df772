"""Stored-page fetch as a join (SURVEY §2.5 J4, §2.10 ST3).

The reference fetches live (playwright handler, settings.py.dist:186-191;
blocking requests.get, PdpReviews.py:30). Per the input hint, the engine
replays from an Iceberg-style pages table: "fetch" = equi-join of the
scheduled batch against ``pages`` on url. Misses (URL scheduled but absent
from storage) are first-class rows with ``status='missing'`` — the
fetch-failure path the reference handles with errbacks (airbnb.py:125-127).

Join strategy: the per-round batch is small (politeness-bounded), the
pages table is the 100 TB side — Catalyst/AQE picks broadcast of the
batch side or a DPP-style scan; either way the pages table is never
shuffled. Only the columns the parsers need are selected before the join
so the parquet scan prunes (html is only read for page types that need
it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_batch(batch: DataFrame, pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(fetched, missing) = batch ⋈ pages on url.

    *batch* columns pass through; fetched rows gain warc_ts/html/text/lang.
    """
    pg = pages.select("url", "warc_ts", "html", "text", "lang")
    joined = batch.join(pg, "url", "left")
    fetched = joined.where(F.col("text").isNotNull() | F.col("html").isNotNull())
    missing = joined.where(F.col("text").isNull() & F.col("html").isNull()).select(
        *batch.columns
    )
    return fetched, missing
