"""ST1-ST4: Structured-Streaming face — micro-batch parse over a pages
stream equals the batch parse; windowed metrics feed adaptive delay."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_stream_pages_equals_batch(spark, world, spec, args, cfg, tmp_path):
    from frontier_engine import parse as P
    from frontier_engine.streaming import stream_pages

    pages_dir = str(tmp_path / "pages")
    pdf = world["pages"].copy()
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(pages_dir)

    out_dir = str(tmp_path / "out")
    q = stream_pages(
        spark, pages_dir, out_dir, str(tmp_path / "ckpt"), args, cfg, trigger_once=True
    )
    q.awaitTermination(300)

    got_pdp = spark.read.parquet(os.path.join(out_dir, "pdp_rows"))
    batch_pages = spark.read.parquet(pages_dir).withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    )
    want_pdp, _ = P.parse_pdp(batch_pages.where(P.page_type_col() == "pdp"), cfg)
    assert got_pdp.count() == want_pdp.count()
    got_ids = {r.listing_id for r in got_pdp.select("listing_id").collect()}
    want_ids = {r.listing_id for r in want_pdp.select("listing_id").collect()}
    assert got_ids == want_ids


def test_windowed_fetch_metrics_batch_mode(spark):
    from frontier_engine.streaming import windowed_fetch_metrics

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:10", "2026-01-01 00:00:50", "2026-01-01 00:01:10"]
            ).astype("datetime64[us]"),
            "host": ["h1", "h1", "h1"],
            "latency_s": [4.0, 8.0, 40.0],
        }
    )
    out = {r.window_start.minute: r for r in windowed_fetch_metrics(spark.createDataFrame(pdf)).collect()}
    assert out[0].fetches == 2 and abs(out[0].avg_latency_s - 6.0) < 1e-9
    assert out[0].next_delay_s == 12.0  # 2×avg clamped to [5, 60]
    assert out[1].next_delay_s == 60.0  # 80 clamped to max (AutoThrottle cap)
