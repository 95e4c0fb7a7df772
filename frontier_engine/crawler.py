"""The crawl driver loop: each scheduling round is one DataFrame job
(SURVEY §2.10 ST1, §3.1 — replaces the reference's event-loop scheduler).

Round r:

1. rank the pending frontier per host (schedule.rank_batch — priority
   window + politeness budget + hot-host salting)
2. "fetch" = join the batch against the stored pages table (fetch.J4)
3. parse fetched pages by type (parse.py) → output rows + new candidates
4. ingest candidates: canonicalize → within-round dedupe → EXACT unseen
   filter via bloom shards + bucketed confirm store (seen.D1,
   seen_store) → assign discovered_seq → robots split (robots.F11)
5. write metrics; commit the round's DELTAS atomically (snapshots.S8)

Frontier state is merge-on-read (VERDICT round-1 item #6 — never rewrite
the frontier per round):

* ``frontier_base`` — full rows, written at round 0 and at compactions;
* ``frontier_delta/snap-r`` — ONLY round r's newly discovered rows;
* ``status_log/snap-r`` — ONLY round r's (url_hash, new_status) facts
  (pending→fetched|missing; a url enters the log at most once ever);
* pending view = (base ∪ deltas) ⋈ status_log (left; log side is
  O(fetched-so-far) and folds into the base when it outgrows
  ``cfg.frontier_compact_ratio`` — Iceberg MERGE's copy-on-write,
  amortized).

Per-round commit bytes therefore scale with the BATCH, not the frontier;
the exact-seen table lives in seen_store (bucketed base + deltas) with
the same property. The loop is resumable: state lives in the snapshot
store, never in driver memory (the reference's scalability wall,
airbnb.py:48,51). Checkpointing every round also truncates DataFrame
lineage, which is what makes a long crawl's plans stay bounded.
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
from frontier_engine.metrics import round_metrics
from frontier_engine.robots import rules_from_pages, split_allowed
from frontier_engine.schedule import assign_discovered_seq_counted, priority_expr, rank_batch
from frontier_engine.seen_store import SeenExactStore
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


class _FrontierState:
    """Merge-on-read frontier over the snapshot store's immutable dirs."""

    def __init__(self, spark: SparkSession, base_paths: list[str], delta_paths: list[str],
                 status_paths: list[str], base_rows: int, status_rows: int):
        self.spark = spark
        self.base_paths = base_paths
        self.delta_paths = delta_paths
        self.status_paths = status_paths
        self.base_rows = base_rows
        self.status_rows = status_rows

    def to_meta(self) -> dict:
        return {
            "base_paths": self.base_paths, "delta_paths": self.delta_paths,
            "status_paths": self.status_paths, "base_rows": self.base_rows,
            "status_rows": self.status_rows,
        }

    @classmethod
    def from_meta(cls, spark: SparkSession, meta: dict) -> "_FrontierState":
        return cls(
            spark, list(meta["base_paths"]), list(meta["delta_paths"]),
            list(meta["status_paths"]), int(meta["base_rows"]), int(meta["status_rows"]),
        )

    def view(self) -> DataFrame:
        """Current frontier: rows ∪ deltas with the status log applied.
        The log holds ≤1 row per url_hash (a url is fetched at most once
        ever), so a left join + coalesce is the exact MERGE semantics."""
        fr = self.spark.read.parquet(*(self.base_paths + self.delta_paths))
        if not self.status_paths:
            return fr
        slog = self.spark.read.parquet(*self.status_paths)
        return (
            fr.join(slog, "url_hash", "left")
            .withColumn("status", F.coalesce("new_status", "status"))
            .drop("new_status")
        )

    def should_compact(self, ratio: float) -> bool:
        total = self.base_rows or 1
        return self.status_rows > total * ratio or len(self.status_paths) > 16


class _ShardState:
    """Merge-on-read LSM over the bloom/cuckoo shard blobs (round-3
    commit-bytes fix): per-round commits write ONLY the dirty shards;
    untouched blobs carry forward by manifest reference. Folded into a
    fresh base when the delta chain grows past ``COMPACT_CHAIN`` (same
    amortized-rewrite discipline as seen_store / the frontier)."""

    COMPACT_CHAIN = 8

    def __init__(self, spark: SparkSession, base_path: str | None, delta_paths: list[str]):
        self.spark = spark
        self.base_path = base_path
        self.delta_paths = delta_paths

    def to_meta(self) -> dict:
        return {"base_path": self.base_path, "delta_paths": self.delta_paths}

    @classmethod
    def from_meta(cls, spark: SparkSession, meta: dict, legacy_path: str | None = None):
        if meta:
            return cls(spark, meta.get("base_path"), list(meta.get("delta_paths", [])))
        # manifests written before the dirty-shard mode: one full table
        return cls(spark, legacy_path, [])

    def view(self) -> DataFrame:
        return S.resolve_shards(self.spark, self.base_path, self.delta_paths)

    def should_compact(self) -> bool:
        return len(self.delta_paths) >= self.COMPACT_CHAIN


def _ingest_candidates(
    cands: DataFrame,
    shards: DataFrame,
    seen_parts: list[DataFrame],
    rules: DataFrame,
    cfg: EngineConfig,
    seq_offset: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, int, DataFrame]:
    """candidates (url, parent_url, depth, listing_score) →
    (pending_rows, blocked_rows, new_shards, unseen, n_unseen, cache_handle).

    ``new_shards`` holds ONLY the dirty (touched) shard rows — the
    caller commits it as a delta and resolves the full view via
    _ShardState (round-3 commit-bytes fix). ``cache_handle`` is the
    frame assign_discovered_seq_counted actually persisted; the caller
    MUST unpersist it after the round's commit (unpersisting a derived
    frame is a no-op — ADVICE r2 leak).

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
    if cfg.trap_cap is not None:
        # per-round per-(host, url-template) admission budget (traps.py,
        # r5; opt-in — default None keeps reference crawl-order parity).
        # Applied pre-seen-filter so discarded URLs stay unseen and can
        # compete under a later round's budget (IRLbot-style deferral);
        # same (depth, parent_url, url) order as the dedupe above.
        from frontier_engine.traps import cap_per_template

        deduped = cap_per_template(
            deduped, cfg.trap_cap, order_cols=["depth", "parent_url"],
            url_col="canon_url",  # sorted-params form → stabler family keys
        )
    # per-shard sizing unit: bloom = bits, cuckoo = buckets (×4 slots)
    cuckoo = cfg.seen_filter_kind == "cuckoo"
    n_units = cfg.cuckoo_buckets_per_shard if cuckoo else cfg.bloom_bits_per_shard
    unseen = S.filter_unseen(
        deduped, shards, seen_parts, cfg.n_seen_shards, n_units,
        cfg.bloom_num_hashes, filter_kind=cfg.seen_filter_kind,
    )
    unseen, n_unseen, cache_handle = assign_discovered_seq_counted(unseen, seq_offset)

    if cuckoo:
        from frontier_engine.cuckoo import update_cuckoo_shards

        new_shards = update_cuckoo_shards(
            unseen, shards, cfg.n_seen_shards, n_units, dirty_only=True
        )
    else:
        new_shards = S.update_shards(
            unseen, shards, cfg.n_seen_shards, n_units, cfg.bloom_num_hashes,
            dirty_only=True,
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
    return (
        mk(allowed, "pending"), mk(blocked, "robots_blocked"),
        new_shards, unseen, n_unseen, cache_handle,
    )


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    cfg: EngineConfig,
    args: P.CrawlArgs,
    seeds: DataFrame | None = None,
    max_rounds: int = 50,
    snapshot_dir: str | None = None,
    resume: bool = False,
    resume_snap: int | None = None,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or *max_rounds*).

    *seeds*: DataFrame with a ``url`` column (depth-0 landing URLs).
    *resume*: continue from the snapshot store's LATEST state — seeds are
    ignored, outputs keep appending (resume == straight-through, verified
    by the resume property test).
    *resume_snap*: time-travel — roll LATEST back to this snapshot id
    first (Iceberg rollback_to_snapshot) and replay from there. Replayed
    rounds are idempotent: state snap dirs overwrite and per-round output
    partitions are dynamically overwritten, so a replay converges to the
    straight-through result (tested).
    """
    snapshot_dir = snapshot_dir or tempfile.mkdtemp(prefix="frontier-snap-")
    store = SnapshotStore(snapshot_dir)
    out_dir = os.path.join(snapshot_dir, "outputs")
    seen_root = os.path.join(snapshot_dir, "seen_exact_store")

    rules = rules_from_pages(pages, cfg).cache()
    rules.count()

    if resume:
        if resume_snap is not None:
            store.rollback(resume_snap)
        snap_id, tables = store.load_latest(spark)
        if snap_id is None:
            raise ValueError("resume=True but snapshot store is empty")
        meta = store.manifest(snap_id)["meta"]
        sstate = _ShardState.from_meta(
            spark, meta.get("shards", {}),
            legacy_path=store.manifest(snap_id)["tables"]["seen_shards"]["path"],
        )
        shards = sstate.view()
        seen_store = SeenExactStore.from_meta(spark, seen_root, meta["seen_exact"])
        seen_store.compact_ratio = cfg.seen_compact_ratio
        fstate = _FrontierState.from_meta(spark, meta["frontier"])
        seq_offset = int(meta["seq_offset"])
        start_round = int(meta["round"]) + 1
    else:
        if seeds is None:
            raise ValueError("seeds required for a fresh crawl")
        seen_store = SeenExactStore(
            spark, seen_root, n_buckets=cfg.seen_exact_buckets,
            compact_ratio=cfg.seen_compact_ratio,
        )
        seed_cands = seeds.select(
            F.col("url"),
            F.lit("").alias("parent_url"),
            F.lit(0).alias("depth"),
            F.lit(0.0).alias("listing_score"),
        )
        pending, blocked, new_shards, unseen, n_new, cache_handle = _ingest_candidates(
            seed_cands, S.empty_shards(spark), [], rules, cfg, 0
        )
        seen_store.append(unseen, 0, n_new=n_new)
        seq_offset = n_new
        start_round = 1
        entry = store.commit(
            0,
            {"frontier_base": pending.unionByName(blocked), "seen_shards": new_shards},
            meta={"round": 0, "seq_offset": seq_offset},
            finalize=False,
        )
        fstate = _FrontierState(
            spark, [entry["tables"]["frontier_base"]["path"]], [], [],
            base_rows=entry["tables"]["frontier_base"]["rows"], status_rows=0,
        )
        sstate = _ShardState(spark, entry["tables"]["seen_shards"]["path"], [])
        entry["meta"]["frontier"] = fstate.to_meta()
        entry["meta"]["seen_exact"] = seen_store.to_meta()
        entry["meta"]["shards"] = sstate.to_meta()
        store.publish(entry)
        cache_handle.unpersist()
        shards = sstate.view()

    rounds_done = start_round - 1
    for rnd in range(start_round, max_rounds + 1):
        pending = fstate.view().where(F.col("status") == "pending")
        delay_dim = rules.select("host", "crawl_delay_s", "max_concurrency")
        ranked = rank_batch(
            pending.join(F.broadcast(delay_dim), "host", "left"), cfg
        ).drop("crawl_delay_s", "max_concurrency")
        batch = ranked.cache()
        n_batch = batch.count()
        if n_batch == 0:
            batch.unpersist()  # don't leak the cached frame on the exit path
            break
        rounds_done = rnd

        append_output(out_dir, "batches", batch.select("host", "url", "rank"), rnd)

        fetched, missing = fetch_batch(batch, pages)
        fetched = fetched.cache()

        # one tokenization per page: rows and candidates project from the
        # persisted per-type extraction intermediates (parse.parse_round)
        pround = P.parse_round(fetched, args, cfg)
        parts = pround.parts
        candidates = pround.candidates

        new_pending, new_blocked, shards_dirty, unseen, n_new, cache_handle = _ingest_candidates(
            candidates, shards, seen_store.parts(), rules, cfg, seq_offset
        )
        new_rows = new_pending.unionByName(new_blocked)
        seq_offset += n_new

        # status transitions for this round's batch — a per-batch FACT
        # table, not a frontier rewrite
        status_updates = (
            fetched.select("url_hash").withColumn("new_status", F.lit("fetched"))
            .unionByName(missing.select("url_hash").withColumn("new_status", F.lit("missing")))
        )

        for name, df in parts.items():
            append_output(out_dir, name, df, rnd)
        append_output(
            out_dir, "metrics",
            round_metrics(rnd, batch, fetched, missing, new_blocked, new_rows).drop("round"),
            rnd,
        )

        # ---- atomic delta commit -----------------------------------------
        seen_store.append(unseen, rnd, n_new=n_new)
        # dirty shards only (round-3): untouched blobs ride the manifest
        scompact = sstate.should_compact()
        shard_commit = (
            S.resolve_shards(spark, sstate.base_path, sstate.delta_paths,
                             extra_df=shards_dirty)
            if scompact
            else shards_dirty
        )
        tables = {"frontier_delta": new_rows, "status_log": status_updates,
                  "seen_shards": shard_commit}
        compact = fstate.should_compact(cfg.frontier_compact_ratio)
        if compact:
            # fold log+deltas into a fresh base (bounded, amortized
            # rewrite); THIS round's status facts fold in too
            base = (
                fstate.view()
                .join(status_updates, "url_hash", "left")
                .withColumn("status", F.coalesce("new_status", "status"))
                .drop("new_status")
                .unionByName(new_rows)
            )
            tables = {"frontier_base": base, "seen_shards": shard_commit}
        entry = store.commit(
            rnd, tables, meta={"round": rnd, "seq_offset": seq_offset}, finalize=False
        )
        if compact:
            binfo = entry["tables"]["frontier_base"]
            fstate = _FrontierState(spark, [binfo["path"]], [], [],
                                    base_rows=binfo["rows"], status_rows=0)
        else:
            fstate.delta_paths.append(entry["tables"]["frontier_delta"]["path"])
            fstate.status_paths.append(entry["tables"]["status_log"]["path"])
            fstate.base_rows += int(entry["tables"]["frontier_delta"]["rows"])
            fstate.status_rows += int(entry["tables"]["status_log"]["rows"])
        if scompact:
            sstate = _ShardState(spark, entry["tables"]["seen_shards"]["path"], [])
        else:
            sstate.delta_paths.append(entry["tables"]["seen_shards"]["path"])
        entry["meta"]["frontier"] = fstate.to_meta()
        entry["meta"]["seen_exact"] = seen_store.to_meta()
        entry["meta"]["shards"] = sstate.to_meta()
        store.publish(entry)

        shards = sstate.view()
        batch.unpersist()
        pround.unpersist()
        fetched.unpersist()
        cache_handle.unpersist()  # the ACTUAL persisted frame (not the derived unseen)

    rules.unpersist()
    outputs = {}
    for name in OUTPUT_TABLES:
        path = os.path.join(out_dir, name)
        try:
            # a table whose every round was empty leaves a file-less
            # partitioned dir (nothing to infer a schema from) — treat
            # like a missing table
            outputs[name] = spark.read.parquet(path) if os.path.exists(path) else None
        except Exception:
            outputs[name] = None
    return CrawlResult(
        rounds=rounds_done,
        store=store,
        frontier=fstate.view(),
        seen_exact=seen_store.as_df(),
        seen_shards=shards,
        outputs=outputs,
    )


def append_output(out_dir: str, name: str, df: DataFrame, rnd: int):
    """Per-round output commit, partitioned by round with DYNAMIC partition
    overwrite: appending a new round only adds its partition, while
    REPLAYING a round (time-travel resume) replaces exactly that round's
    partition instead of double-appending — idempotent round replay."""
    (
        df.withColumn("round", F.lit(rnd))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("round")
        .parquet(os.path.join(out_dir, name))
    )
