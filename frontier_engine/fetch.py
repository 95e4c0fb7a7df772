"""Stored-page fetch as a join (SURVEY §2.5 J4, §2.10 ST3).

The reference fetches live (playwright handler, settings.py.dist:186-191;
blocking requests.get, PdpReviews.py:30). Per the input hint, the engine
replays from an Iceberg-style pages table: "fetch" = equi-join of the
scheduled batch against ``pages`` on url. Misses (URL scheduled but absent
from storage) are first-class rows with ``status='missing'`` — the
fetch-failure path the reference handles with errbacks (airbnb.py:125-127).

Join strategy (round-3 fix): a LEFT OUTER join from the batch can never
broadcast the batch — Spark must stream the preserved side, so the only
broadcastable side is the 100 TB pages table, and the planner silently
fell back to shuffling the ENTIRE pages table every round once it
outgrew the broadcast threshold. The join is therefore decomposed into
shapes whose small side IS broadcastable:

* ``fetched`` = pages ⋈ batch INNER (either side may build ⇒ AQE
  broadcasts the politeness-bounded batch; the pages table is scanned in
  place, never shuffled);
* ``missing`` = batch ANTI fetched.urls (build side = fetched urls ⊆
  batch — tiny). Callers that cache ``fetched`` (the crawler does) pay
  no recompute; otherwise the anti's subplan prunes to a 3-column scan.

Oversized batches degrade to SMJ automatically (AQE runtime sizes) — on
a real deployment that is the cue to bucket the pages table by url.
Only the columns the parsers need are selected before the join so the
parquet scan prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_batch(batch: DataFrame, pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(fetched, missing) = batch ⋈ pages on url.

    *batch* columns pass through; fetched rows gain warc_ts/html/text/lang.
    A pages row with neither text nor html counts as missing (the
    reference's errback path) — same rule as the old single outer join.
    """
    pg = pages.select("url", "warc_ts", "html", "text", "lang")
    fetched = (
        pg.join(batch, "url", "inner")
        .where(F.col("text").isNotNull() | F.col("html").isNotNull())
        .select(*batch.columns, "warc_ts", "html", "text", "lang")
    )
    missing = batch.join(fetched.select("url"), "url", "left_anti")
    return fetched, missing
