"""The crawl driver loop: each scheduling round is one DataFrame job
(SURVEY §2.10 ST1, §3.1 — replaces the reference's event-loop scheduler).

Round r:

1. rank the pending frontier per host (schedule.rank_batch — priority
   window + politeness budget + hot-host salting)
2. "fetch" = join the batch against the stored pages table (fetch.J4)
3. parse fetched pages by type (parse.py) → output rows + new candidates
4. ingest candidates: canonicalize → within-round dedupe → EXACT unseen
   filter via bloom shards + confirm table (seen.D1) → assign
   discovered_seq → robots split (robots.F11) → append to frontier
5. write metrics; snapshot frontier + seen atomically (snapshots.S8)

The loop is resumable: state lives in the snapshot store, never in
driver memory (the reference's scalability wall, airbnb.py:48,51).
Checkpointing every round also truncates DataFrame lineage, which is
what makes a long crawl's plans stay bounded.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frontier_engine import parse as P
from frontier_engine import seen as S
from frontier_engine.canon import with_canon_columns
from frontier_engine.config import EngineConfig
from frontier_engine.fetch import fetch_batch
from frontier_engine.metrics import empty_metrics, round_metrics
from frontier_engine.robots import rules_from_pages, split_allowed
from frontier_engine.schedule import assign_discovered_seq, priority_expr, rank_batch
from frontier_engine.snapshots import SnapshotStore

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("listing_score", T.DoubleType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("discovered_seq", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)

BATCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.IntegerType()),
    ]
)

OUTPUT_TABLES = ("search_results", "pdp_rows", "review_rows", "batches", "metrics")


@dataclass
class CrawlResult:
    rounds: int
    store: SnapshotStore
    frontier: DataFrame
    seen_exact: DataFrame
    seen_shards: DataFrame
    outputs: dict[str, DataFrame] = field(default_factory=dict)


def _ingest_candidates(
    cands: DataFrame,
    shards: DataFrame,
    seen_exact: DataFrame,
    rules: DataFrame,
    cfg: EngineConfig,
    seq_offset: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """candidates (url, parent_url, depth, listing_score) →
    (pending_rows, blocked_rows, new_shards, new_seen_exact).

    Mirrors simulator.enqueue exactly: within-round dedupe keeps the
    (depth, parent_url, url)-least row per canon url; discovered_seq is
    assigned over unseen candidates in (depth, parent_url, url) order
    (BEFORE the robots split, so blocked urls consume sequence numbers
    and enter the seen set, like a framework dupefilter would).
    """
    cands = with_canon_columns(cands)
    w = Window.partitionBy("canon_url").orderBy("depth", "parent_url", "url")
    deduped = (
        cands.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    unseen = S.filter_unseen(
        deduped, shards, seen_exact, cfg.n_seen_shards, cfg.bloom_bits_per_shard, cfg.bloom_num_hashes
    )
    unseen = assign_discovered_seq(unseen, seq_offset).cache()

    new_shards, new_exact = S.update_seen(
        unseen, shards, seen_exact, cfg.n_seen_shards, cfg.bloom_bits_per_shard, cfg.bloom_num_hashes
    )

    allowed, blocked = split_allowed(unseen, rules, cfg)
    mk = lambda df, status: df.select(
        "url",
        "canon_url",
        "url_hash",
        "host",
        F.col("depth").cast("int").alias("depth"),
        F.col("listing_score").cast("double").alias("listing_score"),
        priority_expr(F.col("depth"), F.col("listing_score")),
        F.col("discovered_seq").cast("long").alias("discovered_seq"),
        F.lit(status).alias("status"),
    )
    return mk(allowed, "pending"), mk(blocked, "robots_blocked"), new_shards, new_exact


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    cfg: EngineConfig,
    args: P.CrawlArgs,
    seeds: DataFrame | None = None,
    max_rounds: int = 50,
    snapshot_dir: str | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or *max_rounds*).

    *seeds*: DataFrame with a ``url`` column (depth-0 landing URLs).
    *resume*: continue from the snapshot store's LATEST state — seeds are
    ignored, outputs keep appending (resume == straight-through, verified
    by the resume property test).
    """
    snapshot_dir = snapshot_dir or tempfile.mkdtemp(prefix="frontier-snap-")
    store = SnapshotStore(snapshot_dir)
    out_dir = os.path.join(snapshot_dir, "outputs")

    rules = rules_from_pages(pages, cfg).cache()
    rules.count()

    if resume:
        snap_id, tables = store.load_latest(spark)
        if snap_id is None:
            raise ValueError("resume=True but snapshot store is empty")
        frontier = tables["frontier"]
        shards = tables["seen_shards"]
        seen_exact = tables["seen_exact"]
        meta = store.manifest(snap_id)["meta"]
        seq_offset = int(meta["seq_offset"])
        start_round = int(meta["round"]) + 1
    else:
        if seeds is None:
            raise ValueError("seeds required for a fresh crawl")
        shards = S.empty_shards(spark)
        seen_exact = S.empty_seen_exact(spark)
        seed_cands = seeds.select(
            F.col("url"),
            F.lit("").alias("parent_url"),
            F.lit(0).alias("depth"),
            F.lit(0.0).alias("listing_score"),
        )
        pending, blocked, shards, seen_exact = _ingest_candidates(
            seed_cands, shards, seen_exact, rules, cfg, 0
        )
        frontier = pending.unionByName(blocked)
        seq_offset = frontier.count()
        start_round = 1
        store.commit(
            0,
            {"frontier": frontier, "seen_shards": shards, "seen_exact": seen_exact},
            meta={"round": 0, "seq_offset": seq_offset},
        )
        snap_id, tables = store.load_latest(spark)
        frontier, shards, seen_exact = (
            tables["frontier"],
            tables["seen_shards"],
            tables["seen_exact"],
        )

    def append_output(name: str, df: DataFrame, rnd: int):
        df.withColumn("round", F.lit(rnd)).write.mode("append").parquet(
            os.path.join(out_dir, name)
        )

    rnd = start_round - 1
    for rnd in range(start_round, max_rounds + 1):
        pending = frontier.where(F.col("status") == "pending")
        delay_dim = rules.select("host", "crawl_delay_s", "max_concurrency")
        ranked = rank_batch(
            pending.join(F.broadcast(delay_dim), "host", "left"), cfg
        ).drop("crawl_delay_s", "max_concurrency")
        batch = ranked.cache()
        n_batch = batch.count()
        if n_batch == 0:
            rnd -= 1
            break

        append_output("batches", batch.select("host", "url", "rank"), rnd)

        fetched, missing = fetch_batch(batch, pages)
        fetched = fetched.cache()

        typed = fetched.withColumn("page_type", P.page_type_col())
        parts = {}
        cand_frames = []
        out_landing, c = P.parse_landing(typed.where(F.col("page_type") == "landing"), args, cfg)
        cand_frames.append(c)
        res, c = P.parse_search(typed.where(F.col("page_type") == "search"), args, cfg)
        parts["search_results"] = res
        cand_frames.append(c)
        pdp, c = P.parse_pdp(typed.where(F.col("page_type") == "pdp"), cfg)
        parts["pdp_rows"] = pdp
        cand_frames.append(c)
        rev, c = P.parse_reviews(typed.where(F.col("page_type") == "reviews"), cfg)
        parts["review_rows"] = rev
        cand_frames.append(c)

        candidates = cand_frames[0]
        for cdf in cand_frames[1:]:
            candidates = candidates.unionByName(cdf)

        new_pending, new_blocked, shards, seen_exact = _ingest_candidates(
            candidates, shards, seen_exact, rules, cfg, seq_offset
        )
        new_rows = new_pending.unionByName(new_blocked).cache()
        n_new = new_rows.count()
        seq_offset += n_new

        # status transitions for this round's batch
        status_updates = (
            fetched.select("url").withColumn("new_status", F.lit("fetched"))
            .unionByName(missing.select("url").withColumn("new_status", F.lit("missing")))
        )
        frontier = (
            frontier.join(status_updates, "url", "left")
            .withColumn("status", F.coalesce("new_status", "status"))
            .drop("new_status")
            .unionByName(new_rows)
        )

        for name, df in parts.items():
            append_output(name, df, rnd)
        append_output(
            "metrics",
            round_metrics(rnd, batch, fetched, missing, new_blocked, new_rows).drop("round"),
            rnd,
        )

        store.commit(
            rnd,
            {"frontier": frontier, "seen_shards": shards, "seen_exact": seen_exact},
            meta={"round": rnd, "seq_offset": seq_offset},
        )
        _, tables = store.load_latest(spark)
        frontier, shards, seen_exact = (
            tables["frontier"],
            tables["seen_shards"],
            tables["seen_exact"],
        )
        batch.unpersist()
        fetched.unpersist()
        new_rows.unpersist()

    outputs = {}
    for name in OUTPUT_TABLES:
        path = os.path.join(out_dir, name)
        if os.path.exists(path):
            outputs[name] = spark.read.parquet(path)
        else:
            outputs[name] = None
    return CrawlResult(
        rounds=rnd,
        store=store,
        frontier=frontier,
        seen_exact=seen_exact,
        seen_shards=shards,
        outputs=outputs,
    )
