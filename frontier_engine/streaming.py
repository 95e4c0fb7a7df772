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


def parse_micro_batch(
    batch_df: DataFrame, args: P.CrawlArgs, cfg: EngineConfig
) -> tuple[dict[str, DataFrame], P.ParseRound]:
    """The shared per-micro-batch parse (same one-tokenization
    ``parse_round`` as the batch crawl loop). Returns the output dict
    plus the ParseRound whose persisted intermediates the caller MUST
    unpersist after materializing the outputs. Candidates keep this
    sink's historical surface: API-page follow-ups only (no landing
    fan-out — stream_pages is a parse sink, not a frontier feeder)."""
    pr = P.parse_round(batch_df, args, cfg)
    out = dict(pr.parts)
    out["candidates"] = (
        pr.by_type["search"][1]
        .unionByName(pr.by_type["pdp"][1])
        .unionByName(pr.by_type["reviews"][1])
    )
    return out, pr


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
        outs, pround = parse_micro_batch(batch_df, args, cfg)
        for name, df in outs.items():
            df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                f"{out_dir}/{name}"
            )
        pround.unpersist()

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


# --------------------------------------------------------------------------
# ST2 custom stateful operators (applyInPandasWithState)
# --------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, session_no long, n_events long, duration_us long"
)
SESSION_STATE_SCHEMA = "last_us long, start_us long, n long, session_no long"


def sessionize_stateful(
    events: DataFrame, gap_s: int = 1800, watermark_s: int | None = None
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState, event-time timeout) — the streaming twin of
    the batch lag+cumsum sessionizer (__spark_entry__.q_events_sessionize;
    both oracle-checked against the same SQL).

    Per user_id the state holds the open session (last/start/count).
    A closed session row emits when (a) a new event arrives more than
    ``gap_s`` after the last one, (b) the event-time watermark passes
    last+gap (GroupStateTimeout.EventTimeTimeout — the crash-safe path for
    users that simply stop), or (c) an end-of-stream sentinel
    (event_id = -1) arrives. The watermark delay defaults to ``gap_s`` so
    a timeout can only fire when the batch twin would also have split
    (any later event for that user must be ≥ watermark > last+gap).

    Order contract: events for one user must arrive in non-decreasing
    event-time across micro-batches (within a batch the kernel sorts) —
    the caller feeds time-sliced files, exactly Kafka/Kinesis per-key
    ordering at 100 TB scale.
    """
    import pandas as pd  # noqa: F401

    gap_us = gap_s * 1_000_000
    wm = watermark_s if watermark_s is not None else gap_s

    def fn(key, pdfs, state):
        uid = int(key[0])
        if state.hasTimedOut:
            last_us, start_us, n, sess_no = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [uid], "session_no": [sess_no], "n_events": [n],
                 "duration_us": [last_us - start_us]}
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs (unix_micros twin)
        ids = rows["event_id"].to_numpy()
        if state.exists:
            last_us, start_us, n, sess_no = state.get
            has_open = True
        else:
            last_us = start_us = n = 0
            sess_no = 0
            has_open = False
        out = {"user_id": [], "session_no": [], "n_events": [], "duration_us": []}

        def close():
            out["user_id"].append(uid)
            out["session_no"].append(sess_no)
            out["n_events"].append(n)
            out["duration_us"].append(last_us - start_us)

        for t, eid in zip(ts_us.to_numpy(), ids):
            t = int(t)
            if eid == -1:  # end-of-stream sentinel: close, start nothing
                if has_open:
                    close()
                    sess_no += 1
                    has_open = False
                continue
            if not has_open:
                start_us = last_us = t
                n = 1
                has_open = True
            elif t - last_us > gap_us:
                close()
                sess_no += 1
                start_us = last_us = t
                n = 1
            else:
                last_us = t
                n += 1
        if has_open:
            state.update((int(last_us), int(start_us), int(n), int(sess_no)))
            timeout_ms = last_us // 1000 + gap_s * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1000))
        else:
            state.remove() if state.exists else None
        if out["user_id"]:
            yield pd.DataFrame(out)

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = events.withWatermark("ts", f"{wm} seconds")
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


DEDUP_OUT_SCHEMA = "url_hash long, url string"
DEDUP_STATE_SCHEMA = "seen int"


def dedup_stateful(urls: DataFrame) -> DataFrame:
    """First-seen-wins URL dedup as a stateful streaming operator — the
    streaming twin of seen.filter_unseen (D1/D3): keyed by url_hash, the
    first arrival emits and sets a tombstone; every later duplicate is
    swallowed. State is one int per distinct key, sharded by Spark's
    state store exactly like the batch path's bloom shards. Input needs
    (url_hash long, url string [, ts timestamp])."""
    import pandas as pd  # noqa: F401

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - NoTimeout
            return
        first = None
        for pdf in pdfs:
            if not pdf.empty and first is None:
                row = pdf.sort_values("url").iloc[0]
                first = row["url"]
        if state.exists or first is None:
            return
        state.update((1,))
        yield pd.DataFrame({"url_hash": [int(key[0])], "url": [first]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    return urls.groupBy("url_hash").applyInPandasWithState(
        fn,
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drive a (bounded) streaming DataFrame to completion into parquet —
    availableNow processes every pending file then stops."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def frontier_ingest_stream(
    spark: SparkSession,
    cands_dir: str,
    root: str,
    checkpoint_dir: str,
    cfg: EngineConfig,
    max_files_per_trigger: int = 1,
):
    """Streaming frontier ingest (ST2's seen set as a live stream): a
    ``readStream`` of candidate-URL files with ``foreachBatch`` running
    the SAME dedupe discipline as the batch crawler — canonicalize →
    within-batch dedupe → bloom-shard prefilter → exact confirm against
    the persistent SeenExactStore → append the batch's unseen keys to the
    store and OR them into the shard blobs.

    Exactly-once without Iceberg: every per-batch write is keyed by
    ``batch_id`` (store delta ``delta-snap-s<id>``, shard blob dir
    ``shards/b<id>``, output partition ``batch_id=<id>``), so a replayed
    micro-batch overwrites its own files instead of duplicating —
    idempotent under the streaming engine's at-least-once foreachBatch
    contract. Unseen rows land in ``<root>/unseen`` partitioned by
    batch_id.

    Returns the started StreamingQuery; state lives under *root*
    (resumable: pass the same root + checkpoint to continue).
    """
    import json
    import os

    from frontier_engine import seen as S
    from frontier_engine.canon import with_canon_columns
    from frontier_engine.seen_store import SeenExactStore

    schema = "url string"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cands_dir)
    )
    # engine-state manifest (atomic os.replace, same discipline as
    # snapshots.py): the streaming checkpoint only remembers which FILES
    # were read — the seen store + shard blobs must survive a restart too
    meta_path = os.path.join(root, "ingest_meta.json")
    seen_root = os.path.join(root, "seen")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        store = SeenExactStore.from_meta(spark, seen_root, meta["seen"])
        # legacy single-path manifests load as a one-element chain
        chain = meta.get("shard_paths") or (
            [meta["shards_path"]] if meta.get("shards_path") else []
        )
    else:
        store = SeenExactStore(spark, seen_root, n_buckets=cfg.seen_exact_buckets)
        chain = []
    state = {"chain": list(chain)}
    shards_root = os.path.join(root, "shards")
    COMPACT_CHAIN = 8

    def _view():
        if not state["chain"]:
            return S.empty_shards(spark)
        return S.resolve_shards(spark, state["chain"][0], state["chain"][1:])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        shards = _view()
        cands = with_canon_columns(batch_df).dropDuplicates(["canon_url"])
        unseen = S.filter_unseen(
            cands, shards, store.parts(), cfg.n_seen_shards,
            cfg.bloom_bits_per_shard, cfg.bloom_num_hashes,
        ).cache()
        n = unseen.count()
        (
            unseen.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(os.path.join(root, "unseen"))
        )
        if n:
            store.append(unseen, f"s{batch_id}", n_new=n)
            # dirty-shard delta per micro-batch (round-3 commit-bytes
            # fix, same LSM discipline as the batch crawler); fold the
            # chain into a fresh base when it grows past COMPACT_CHAIN
            fold = len(state["chain"]) >= COMPACT_CHAIN
            merged = S.update_shards(
                unseen, shards, cfg.n_seen_shards,
                cfg.bloom_bits_per_shard, cfg.bloom_num_hashes,
                dirty_only=not fold,  # fold ⇒ full merge = the new base
            )
            spath = os.path.join(shards_root, f"b{batch_id}")
            merged.write.mode("overwrite").parquet(spath)
            if fold:
                state["chain"] = [spath]
            elif spath not in state["chain"]:  # replayed batch: same path
                state["chain"] = state["chain"] + [spath]
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"seen": store.to_meta(), "shard_paths": state["chain"]}, f)
            os.replace(tmp, meta_path)
        unseen.unpersist()

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_crawl_stream(
    spark: SparkSession,
    pages: DataFrame,
    cfg: EngineConfig,
    args: P.CrawlArgs,
    seeds: DataFrame | None = None,
    snapshot_dir: str | None = None,
    max_rounds: int = 50,
    resume: bool = False,
):
    """The FULL crawl through the Structured-Streaming face (round-3):
    each scheduling round is one micro-batch of a self-feeding candidate
    stream, and the result must equal ``crawler.run_crawl`` exactly
    (same batches in the same rounds, same parsed outputs, same seen
    set — pinned by the e2e parity test).

    Shape: a ``readStream`` file source watches a candidates directory;
    the seed list is the first file. ``foreachBatch`` runs ONE round
    with the SAME building blocks as the batch driver (_ingest_candidates
    → rank_batch → fetch_batch → parse_* → snapshot commit) and drops
    the round's newly discovered candidates back into the watched
    directory as a single parquet file — the feedback edge. The driver
    loop re-triggers ``availableNow`` passes until a round schedules
    nothing (frontier exhausted): no new file ⇒ the stream has drained.

    An EMPTY candidate file is still written after every non-empty
    batch, because a round with zero discoveries must not stop the
    crawl while pending URLs remain (politeness budgets spread a host's
    backlog over many rounds). Exactly-once over candidate files is the
    streaming engine's checkpoint contract; engine state (seen store,
    shard blobs, frontier) rides the same snapshot manifests as the
    batch path.

    ``resume=True`` continues an interrupted stream from the same
    *snapshot_dir*: the file-source checkpoint replays any micro-batch
    whose offsets were not committed, and engine state reloads from the
    snapshot manifests. Replay is made exact by two rules: (a) a
    manifest whose ``phase`` is ``ingest`` (crash mid-batch, between the
    ingest commit and the round's status commit) is rolled back to its
    parent round boundary, so the replayed batch re-ingests against
    pre-batch state (deterministic seq assignment ⇒ identical result);
    (b) a replayed batch whose round fully committed
    (``last_batch_id`` ≥ batch id — crash after publish but before the
    checkpoint commit) is skipped outright, since its effects are
    already durable. Verified by the resume == straight-through parity
    test.

    Metrics parity (ADVICE r3 fix): a round's metrics row needs both its
    fetch-side counts (known when the round runs) and its ingest-side
    counts (known only when its discoveries are ingested — the NEXT
    micro-batch here). The round phase stashes the fetch-side half
    (``metrics_stash/round-N``); the next ingest completes and publishes
    the row via the same ``combine_metrics`` the batch driver uses, so
    the metrics table is batch-identical — including the final round,
    whose row lands on the done path's ingest. Pinned by the parity test.

    Boundary note for ROUND-CAPPED runs: the batch driver ingests a
    round's discoveries within that round, while the streaming face
    ingests them in the NEXT micro-batch — so a `max_rounds`-capped
    stream stops with the final round's discoveries still in its
    candidate file (one ingest behind the batch driver's state), and
    that final round's metrics row still stashed (it completes at the
    resume's first ingest). The outputs/batches are identical either
    way; a ``resume`` ingests the pending file and re-converges, and a
    run-to-exhaustion is exactly equal (parity-tested, metrics
    included).

    Returns a dict: outputs (name → DataFrame), rounds, seen_exact,
    frontier.
    """
    import glob
    import os
    import shutil
    import tempfile

    from frontier_engine import seen as S
    from frontier_engine.crawler import (
        OUTPUT_TABLES, _FrontierState, _ShardState, _ingest_candidates, append_output,
    )
    from frontier_engine.fetch import fetch_batch
    from frontier_engine.metrics import (
        combine_metrics, fetch_side_metrics, ingest_side_metrics,
    )
    from frontier_engine.robots import rules_from_pages
    from frontier_engine.schedule import rank_batch
    from frontier_engine.seen_store import SeenExactStore
    from frontier_engine.snapshots import SnapshotStore

    snapshot_dir = snapshot_dir or tempfile.mkdtemp(prefix="frontier-stream-")
    cands_dir = os.path.join(snapshot_dir, "cand_stream")
    ckpt = os.path.join(snapshot_dir, "ckpt")
    out_dir = os.path.join(snapshot_dir, "outputs")
    mstash_dir = os.path.join(snapshot_dir, "metrics_stash")
    os.makedirs(cands_dir, exist_ok=True)
    store = SnapshotStore(snapshot_dir)
    seen_store = SeenExactStore(
        spark, os.path.join(snapshot_dir, "seen_exact_store"),
        n_buckets=cfg.seen_exact_buckets, compact_ratio=cfg.seen_compact_ratio,
    )
    rules = rules_from_pages(pages, cfg).cache()
    rules.count()

    def _drop_cand_file(df: DataFrame, tag: str) -> None:
        tmp = os.path.join(snapshot_dir, f"cand-tmp-{tag}")
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        part = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))[0]
        shutil.move(part, os.path.join(cands_dir, f"{tag}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    st = {
        "round": 0, "seq": 0, "snap": 0, "done": False, "last_batch": -1,
        "shards": S.empty_shards(spark), "sstate": None, "fstate": None,
    }
    if resume:
        sid = store.latest_id()
        man = store.manifest(sid) if sid is not None else None
        if man and man["meta"].get("phase") == "ingest" and man["parent_id"] is not None:
            # crash landed between the ingest commit and the round's
            # status commit — roll back to the round boundary; the
            # uncommitted micro-batch replays against pre-batch state
            sid = man["parent_id"]
            store.rollback(sid)
            man = store.manifest(sid)
        if man and man["meta"].get("phase") != "ingest":
            meta = man["meta"]
            seen_store = SeenExactStore.from_meta(
                spark, os.path.join(snapshot_dir, "seen_exact_store"), meta["seen_exact"]
            )
            seen_store.compact_ratio = cfg.seen_compact_ratio
            fstate = _FrontierState.from_meta(spark, meta["frontier"])
            sstate = _ShardState.from_meta(spark, meta["shards"])
            st.update(
                round=int(meta["round"]), seq=int(meta["seq_offset"]),
                snap=int(man["snapshot_id"]),
                last_batch=int(meta.get("last_batch_id", -1)),
                sstate=sstate, fstate=fstate, shards=sstate.view(),
            )
    else:
        if seeds is None:
            raise ValueError("seeds required for a fresh streaming crawl")
        seed_cands = seeds.select(
            F.col("url"), F.lit("").alias("parent_url"),
            F.lit(0).alias("depth"), F.lit(0.0).alias("listing_score"),
        )
        _drop_cand_file(seed_cands, "seed")

    def _next_snap() -> int:
        st["snap"] += 1
        return st["snap"]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if st["done"]:
            return
        if batch_id <= st["last_batch"]:
            return  # replayed batch whose round already fully committed
        rnd = st["round"]  # commits for state as of THIS ingest
        pending_new, blocked_new, shards_dirty, unseen, n_new, cache_handle = (
            _ingest_candidates(
                batch_df, st["shards"], seen_store.parts(), rules, cfg, st["seq"]
            )
        )
        seen_store.append(unseen, rnd, n_new=n_new)
        st["seq"] += n_new
        new_rows = pending_new.unionByName(blocked_new)

        sstate, fstate = st["sstate"], st["fstate"]
        imeta = {"round": rnd, "seq_offset": st["seq"], "phase": "ingest",
                 "last_batch_id": st["last_batch"]}
        if sstate is None:  # seed micro-batch: establish the state bases
            entry = store.commit(
                _next_snap(), {"frontier_base": new_rows, "seen_shards": shards_dirty},
                meta=imeta, finalize=False,
            )
            fstate = _FrontierState(
                spark, [entry["tables"]["frontier_base"]["path"]], [], [],
                base_rows=entry["tables"]["frontier_base"]["rows"], status_rows=0,
            )
            sstate = _ShardState(spark, entry["tables"]["seen_shards"]["path"], [])
        else:
            # Same amortized-fold discipline as run_crawl (ADVICE r3: the
            # streaming face previously never compacted — unbounded
            # manifest chains on a long crawl). Shards: fold the delta
            # chain at COMPACT_CHAIN, the not-yet-written dirty frame
            # riding along as the newest version. Frontier: fold log +
            # deltas into a fresh base past the ratio.
            scompact = sstate.should_compact()
            shard_commit = (
                S.resolve_shards(spark, sstate.base_path, sstate.delta_paths,
                                 extra_df=shards_dirty)
                if scompact
                else shards_dirty
            )
            fcompact = fstate.should_compact(cfg.frontier_compact_ratio)
            if fcompact:
                # view() applies the status log, so the folded base
                # carries every fetched/missing status and the chains
                # reset — identical to the batch driver's fold (minus
                # this round's not-yet-known statuses, which commit at
                # the round boundary below)
                base = fstate.view().unionByName(new_rows)
                tables = {"frontier_base": base, "seen_shards": shard_commit}
            else:
                tables = {"frontier_delta": new_rows, "seen_shards": shard_commit}
            entry = store.commit(_next_snap(), tables, meta=imeta, finalize=False)
            if fcompact:
                binfo = entry["tables"]["frontier_base"]
                fstate = _FrontierState(spark, [binfo["path"]], [], [],
                                        base_rows=binfo["rows"], status_rows=0)
            else:
                fstate.delta_paths.append(entry["tables"]["frontier_delta"]["path"])
                fstate.base_rows += int(entry["tables"]["frontier_delta"]["rows"])
            if scompact:
                sstate = _ShardState(spark, entry["tables"]["seen_shards"]["path"], [])
            else:
                sstate.delta_paths.append(entry["tables"]["seen_shards"]["path"])
        entry["meta"]["frontier"] = fstate.to_meta()
        entry["meta"]["shards"] = sstate.to_meta()
        entry["meta"]["seen_exact"] = seen_store.to_meta()
        store.publish(entry)

        # Complete the PREVIOUS round's metrics row: its fetch-side half
        # was stashed when that round ran; its ingest-side half is THIS
        # ingest (these candidates are that round's discoveries). This
        # keeps the metrics table batch-identical instead of one round
        # shifted, and gives the final round's discoveries a metrics row
        # on the done path (ADVICE r3). Runs before cache_handle
        # unpersists — blocked_new/new_rows still read the cached ingest.
        stash_path = os.path.join(mstash_dir, f"round-{rnd}")
        if rnd > 0 and os.path.exists(stash_path):
            append_output(
                out_dir, "metrics",
                combine_metrics(
                    rnd, spark.read.parquet(stash_path),
                    ingest_side_metrics(blocked_new, new_rows),
                ).drop("round"),
                rnd,
            )
        cache_handle.unpersist()
        st["sstate"], st["fstate"] = sstate, fstate
        st["shards"] = sstate.view()

        # ---- rank + fetch + parse = round rnd+1 (run_crawl numbering)
        rnd += 1
        pending = fstate.view().where(F.col("status") == "pending")
        delay_dim = rules.select("host", "crawl_delay_s", "max_concurrency")
        batch = rank_batch(
            pending.join(F.broadcast(delay_dim), "host", "left"), cfg
        ).drop("crawl_delay_s", "max_concurrency").cache()
        n_batch = batch.count()
        if n_batch == 0:
            batch.unpersist()
            st["done"] = True
            # done marker: promotes the final ingest to a round boundary
            # so a resume never rolls back the crawl's last discoveries
            dentry = store.commit(
                _next_snap(), {},
                meta={"round": st["round"], "seq_offset": st["seq"],
                      "phase": "round_done", "last_batch_id": batch_id},
                finalize=False,
            )
            dentry["meta"]["frontier"] = fstate.to_meta()
            dentry["meta"]["shards"] = sstate.to_meta()
            dentry["meta"]["seen_exact"] = seen_store.to_meta()
            store.publish(dentry)
            st["last_batch"] = batch_id
            # final round's metrics row (written at this ingest) is durable
            shutil.rmtree(
                os.path.join(mstash_dir, f"round-{st['round']}"), ignore_errors=True
            )
            return
        st["round"] = rnd
        append_output(out_dir, "batches", batch.select("host", "url", "rank"), rnd)

        fetched, missing = fetch_batch(batch, pages)
        fetched = fetched.cache()
        # one tokenization per page, same as run_crawl (parse.parse_round)
        pround = P.parse_round(fetched, args, cfg)
        parts = pround.parts
        candidates = pround.candidates

        status_updates = (
            fetched.select("url_hash").withColumn("new_status", F.lit("fetched"))
            .unionByName(
                missing.select("url_hash").withColumn("new_status", F.lit("missing"))
            )
        )
        for name, df in parts.items():
            append_output(out_dir, name, df, rnd)
        # Stash this round's fetch-side metrics half; the row completes at
        # the NEXT micro-batch's ingest, when this round's discoveries are
        # actually ingested (run_crawl parity — see combine_metrics above).
        # Overwrite mode ⇒ a replayed round regenerates an identical stash.
        fetch_side_metrics(batch, fetched, missing).write.mode("overwrite").parquet(
            os.path.join(mstash_dir, f"round-{rnd}")
        )
        # feedback edge: next round's candidates (may be EMPTY — still a
        # file, so the stream keeps triggering while pending URLs remain).
        # Written BEFORE the round-boundary commit: a crash in between
        # replays the batch (ingest-phase rollback) and regenerates the
        # identical file; the reverse order could mark the round done
        # with its feedback file never written — a stalled crawl.
        _drop_cand_file(candidates, f"round-{rnd}")

        # Round-boundary commit; the status log is the growth edge here,
        # so the frontier fold also triggers at this commit point when the
        # log outgrows the base (same predicate as the batch driver).
        fcompact = fstate.should_compact(cfg.frontier_compact_ratio)
        if fcompact:
            base = (
                fstate.view()
                .join(status_updates, "url_hash", "left")
                .withColumn("status", F.coalesce("new_status", "status"))
                .drop("new_status")
            )
            stables = {"frontier_base": base}
        else:
            stables = {"status_log": status_updates}
        sentry = store.commit(
            _next_snap(), stables,
            meta={"round": rnd, "seq_offset": st["seq"], "phase": "round_done",
                  "last_batch_id": batch_id},
            finalize=False,
        )
        if fcompact:
            binfo = sentry["tables"]["frontier_base"]
            fstate = _FrontierState(spark, [binfo["path"]], [], [],
                                    base_rows=binfo["rows"], status_rows=0)
            st["fstate"] = fstate
        else:
            fstate.status_paths.append(sentry["tables"]["status_log"]["path"])
            fstate.status_rows += int(sentry["tables"]["status_log"]["rows"])
        sentry["meta"]["frontier"] = fstate.to_meta()
        sentry["meta"]["shards"] = sstate.to_meta()
        sentry["meta"]["seen_exact"] = seen_store.to_meta()
        store.publish(sentry)
        st["last_batch"] = batch_id
        # the previous round's stash was consumed at this batch's ingest
        # and its durable metrics row is published — safe to drop now
        # (kept until here so an ingest-phase replay could re-read it)
        shutil.rmtree(os.path.join(mstash_dir, f"round-{rnd - 1}"), ignore_errors=True)
        batch.unpersist()
        pround.unpersist()
        fetched.unpersist()

    src = spark.readStream.schema(
        "url string, parent_url string, depth int, listing_score double"
    ).option("maxFilesPerTrigger", 1).parquet(cands_dir)

    while not st["done"] and st["round"] < max_rounds:
        before = st["round"]
        q = (
            src.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if st["round"] == before and not st["done"]:
            break  # no progress and not explicitly finished — drained

    rules.unpersist()
    outputs = {}
    for name in OUTPUT_TABLES:
        path = os.path.join(out_dir, name)
        try:
            outputs[name] = spark.read.parquet(path) if os.path.exists(path) else None
        except Exception:
            outputs[name] = None
    return {
        "outputs": outputs,
        "rounds": st["round"],
        "seen_exact": seen_store.as_df(),
        "frontier": st["fstate"].view() if st["fstate"] else None,
    }


def document_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    apply_c4: bool = False,
    min_words: int = 3,
    min_lines: int = 1,
    max_files_per_trigger: int = 1,
    compact_every: int = 16,
):
    """Continuous training-data ingestion (late r4): a ``readStream``
    of document files with ``foreachBatch`` running the SAME cleaning +
    dedup discipline as the batch ingest round — PII redaction →
    (optional) C4 line filter gate → within-batch exact dedup
    (first-seen = lowest id per text hash) → within-batch MinHash
    near-dup (lowest id of each verified pair survives — ADVICE r4:
    two NEAR-identical docs in one micro-batch both missed the
    corpus-join, which only compares against prior batches) → MinHash
    near-dup join against the PERSISTED corpus band table → append the
    survivors to the corpus AND their band rows to the band table.
    Per-micro-batch cost is O(batch + collisions), independent of
    corpus size — the growing corpus is touched only through its
    (band, bucket) index and the candidate-bounded exact-verify
    semi-join. Exact cross-batch duplicates need no separate structure:
    identical text ⇒ identical bands ⇒ a jaccard-1.0 candidate the
    verify drops.

    Exactly-once without Iceberg (same discipline as
    :func:`frontier_ingest_stream`): both state tables are partitioned
    by ``batch_id`` and written with dynamic partition overwrite, and a
    micro-batch reads the corpus/bands WITHOUT its own partition
    (``batch_id != this``) — so a replayed batch recomputes against
    exactly the pre-batch state and overwrites its own files instead of
    duplicating or self-matching. Corpus-level ops that need GLOBAL
    state (repeated-line dedup, stratified sampling) are compaction- /
    export-time jobs over ``<root>/corpus``, not per-ingest work.

    State maintenance (r5, VERDICT r4 ask #4): one ``batch_id=``
    partition per micro-batch is a many-small-files scan after
    thousands of batches, so every *compact_every* partitions the
    handler FOLDS all prior partitions into one ``batch_id=-(k+1)``
    partition (negative ⇒ never collides with a real batch, always
    included by the ``!= k`` read) and deletes the originals. The fold
    is replay-idempotent by construction: it reads ``batch_id != k``,
    drops duplicate keys (a crash between the fold write and the
    original-partition deletes leaves both visible — the key-dedup
    collapses them), rewrites the same deterministic fold partition,
    and re-deletes; ids are globally unique (caller contract) so the
    key-dedup never merges distinct docs.

    Caller contract: doc ids are globally unique across the stream
    (same as MERGE keys). Returns the started StreamingQuery; state
    lives under *root* (resumable: same root + checkpoint)."""
    import os
    import shutil

    from frontier_engine.textops import (
        c4_line_filter, corpus_band_table, minhash_dedup_join,
        minhash_dedup_pairs, pii_redact,
    )

    corpus_dir = os.path.join(root, "corpus")
    bands_dir = os.path.join(root, "bands")

    def _nonempty(path: str) -> bool:
        if not os.path.isdir(path):
            return False
        return any(
            f == "_SUCCESS" or f.startswith("batch_id=") for f in os.listdir(path)
        )

    def _partitions(path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [f for f in os.listdir(path) if f.startswith("batch_id=")]

    def _compact_state(batch_id: int) -> None:
        """Fold all prior batch_id partitions (positive AND previous
        folds) into one ``batch_id=-(batch_id+1)`` partition, then
        delete the originals. Runs BEFORE the batch's own processing,
        so everything it touches is committed prior state."""
        fold_id = -(batch_id + 1)
        for path, keys in ((corpus_dir, [id_col]), (bands_dir, [id_col, "band", "bucket"])):
            prior = spark.read.parquet(path).where(F.col("batch_id") != batch_id)
            (
                prior.dropDuplicates(keys)
                .withColumn("batch_id", F.lit(fold_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )
            for part in _partitions(path):
                if part != f"batch_id={fold_id}":
                    shutil.rmtree(os.path.join(path, part), ignore_errors=True)

    schema = f"{id_col} long, {text_col} string"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        red = pii_redact(batch_df, text_col, id_col).select(
            id_col,
            F.col("clean_text").alias(text_col),
            "n_emails", "n_ips", "n_phones",
        )
        if apply_c4:
            gate = c4_line_filter(red, text_col, id_col, min_words, min_lines)
            red = red.drop(text_col).join(
                gate.where(F.col("doc_kept")).select(
                    id_col, F.col("c4_text").alias(text_col)
                ),
                id_col,
            )
        firsts = red.groupBy(F.xxhash64(F.col(text_col)).alias("_h")).agg(
            F.min(id_col).alias(id_col)
        )
        exact = red.join(firsts.select(id_col), id_col).cache()
        # within-batch NEAR-dup (ADVICE r4): the corpus join below only
        # compares against PRIOR batches, so two near-identical docs
        # arriving in one micro-batch would both survive it. Same
        # minhash→LSH→exact-verify as the batch ingest round; the
        # higher id of each verified pair (pairs come id_a < id_b)
        # drops, mirroring the exact dedup's first-seen rule.
        intra = (
            minhash_dedup_pairs(exact, text_col, id_col, threshold=threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        red = exact.join(intra, id_col, "left_anti").cache()
        if _nonempty(corpus_dir) and len(_partitions(corpus_dir)) >= compact_every:
            _compact_state(batch_id)
        if _nonempty(corpus_dir):
            corpus = spark.read.parquet(corpus_dir).where(
                F.col("batch_id") != batch_id
            )
            bands = spark.read.parquet(bands_dir).where(
                F.col("batch_id") != batch_id
            ).drop("batch_id")
            dup_ids = (
                minhash_dedup_join(
                    red, corpus, text_col, id_col,
                    threshold=threshold, corpus_bands=bands,
                )
                .select(F.col("id_a").alias(id_col))
                .distinct()
            )
            survivors = red.join(dup_ids, id_col, "left_anti")
        else:
            survivors = red
        survivors = survivors.withColumn("batch_id", F.lit(batch_id)).cache()
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(corpus_dir)
        )
        (
            corpus_band_table(survivors, text_col, id_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(bands_dir)
        )
        survivors.unpersist()
        red.unpersist()
        exact.unpersist()

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
