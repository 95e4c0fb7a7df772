"""Structured-Streaming face of the crawl (SURVEY §2.10 ST1-ST4).

The reference is a continuous single-process event loop; the engine's
primary form is the iterative round driver (crawler.py — each round one
DataFrame job, snapshot-committed). This module provides the streaming
alternative for deployments that want micro-batch semantics end-to-end:

* :func:`stream_pages` — a ``readStream`` over a pages directory (new
  page files arrive as the fetch tier lands WARC conversions) with
  ``foreachBatch`` running the SAME parse stage per micro-batch and
  appending outputs — exactly the ST1 "each scheduling round is a
  DataFrame job" discipline, with checkpointing delegated to the
  streaming engine.
* :func:`windowed_fetch_metrics` — event-time tumbling windows with a
  watermark over the fetch-metrics stream (late fetch completions are
  the reference's retry stragglers, ST3); feeds the ST4 adaptive-delay
  loop.

Kept deliberately thin: all logic is shared with the batch path — this
file only adapts sources/sinks, so streaming and batch can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frontier_engine import parse as P
from frontier_engine.config import EngineConfig


def parse_micro_batch(batch_df: DataFrame, args: P.CrawlArgs, cfg: EngineConfig) -> dict[str, DataFrame]:
    """The shared per-micro-batch parse (same functions as the batch round)."""
    typed = batch_df.withColumn("page_type", P.page_type_col())
    out = {}
    out["search_results"], c1 = P.parse_search(typed.where(F.col("page_type") == "search"), args, cfg)
    out["pdp_rows"], c2 = P.parse_pdp(typed.where(F.col("page_type") == "pdp"), cfg)
    out["review_rows"], c3 = P.parse_reviews(typed.where(F.col("page_type") == "reviews"), cfg)
    out["candidates"] = c1.unionByName(c2).unionByName(c3)
    return out


def stream_pages(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    args: P.CrawlArgs,
    cfg: EngineConfig,
    trigger_once: bool = True,
):
    """readStream(pages) → foreachBatch(parse) → append outputs.

    Returns the started StreamingQuery. ``trigger_once`` processes all
    available input then stops (the testable mode); continuous deployments
    drop it."""
    from frontier_engine.fixtures import WorldSpec  # schema donor only

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
        .withColumn("host", F.regexp_extract("url", r"^https?://([^/]+)/", 1))
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        outs = parse_micro_batch(batch_df, args, cfg)
        for name, df in outs.items():
            df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                f"{out_dir}/{name}"
            )

    writer = src.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_fetch_metrics(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST3/ST4: tumbling 1-minute per-host latency windows with late-data
    tolerance; output feeds the next round's politeness delay
    (AutoThrottle semantics, settings.py.dist:163-175). Works on both a
    streaming and a batch DataFrame with (ts, host, latency_s)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    agg = df.groupBy(F.window("ts", "1 minute").alias("w"), "host").agg(
        F.count("*").alias("fetches"),
        F.avg("latency_s").alias("avg_latency_s"),
    )
    return agg.select(
        F.col("w")["start"].alias("window_start"),
        "host",
        "fetches",
        F.round("avg_latency_s", 4).alias("avg_latency_s"),
        F.round(
            F.least(F.lit(60.0), F.greatest(F.lit(5.0), F.col("avg_latency_s") * 2)), 4
        ).alias("next_delay_s"),
    )
