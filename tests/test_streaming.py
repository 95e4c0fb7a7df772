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


class TestStatefulOps:
    """ST2: applyInPandasWithState sessionize/dedup — state carry-over
    across micro-batches and the event-time TIMEOUT path."""

    def _mk_slices(self, spark, tmp_path, slices, schema):
        import glob
        import os
        import shutil

        src = os.path.join(str(tmp_path), "in")
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(slices):
            df = spark.createDataFrame(rows, schema)
            d = os.path.join(str(tmp_path), f"w{i}")
            df.coalesce(1).write.mode("overwrite").parquet(d)
            shutil.move(glob.glob(os.path.join(d, "part-*.parquet"))[0],
                        os.path.join(src, f"slice-{i}.parquet"))
        return src

    def test_session_timeout_emits_without_sentinel(self, spark, tmp_path):
        """User 1 stops after slice 0; slice 1 (other user, much later ts)
        advances the watermark past last+gap → user 1's open session MUST
        emit through GroupStateTimeout, not via new data or sentinel."""
        import datetime
        import os

        from frontier_engine.streaming import run_stream_to_parquet, sessionize_stateful

        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

        def ts(mins):
            return t0 + datetime.timedelta(minutes=mins)

        schema = "user_id long, event_id long, ts timestamp"
        slices = [
            [(1, 1, ts(0)), (1, 2, ts(5)), (2, 3, ts(6))],
            # 10 hours later: watermark (max - gap) >> user-1 last + gap
            [(2, 4, ts(600)), (2, 5, ts(601))],
        ]
        src = self._mk_slices(spark, tmp_path, slices, schema)
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        out_dir, ck = os.path.join(str(tmp_path), "out"), os.path.join(str(tmp_path), "ck")
        run_stream_to_parquet(sessionize_stateful(stream, gap_s=1800), out_dir, ck)
        rows = {(r.user_id, r.session_no): (r.n_events, r.duration_us)
                for r in spark.read.parquet(out_dir).collect()}
        # user 1's only session emitted by TIMEOUT (no sentinel anywhere)
        assert rows[(1, 0)] == (2, 5 * 60 * 1_000_000)
        # user 2's slice-0 event and slice-1 events are >gap apart → split;
        # the second session is still open (no timeout passed it) → absent
        assert rows[(2, 0)] == (1, 0)
        assert (2, 1) not in rows

    def test_dedup_state_across_batches(self, spark, tmp_path):
        import os

        from frontier_engine.streaming import dedup_stateful, run_stream_to_parquet

        schema = "url string, url_hash long"
        slices = [
            [("u1", 1), ("u2", 2), ("u1", 1)],   # in-batch dup
            [("u2", 2), ("u3", 3)],              # cross-batch dup
        ]
        src = self._mk_slices(spark, tmp_path, slices, schema)
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        out_dir, ck = os.path.join(str(tmp_path), "o2"), os.path.join(str(tmp_path), "c2")
        run_stream_to_parquet(dedup_stateful(stream), out_dir, ck)
        urls = sorted(r.url for r in spark.read.parquet(out_dir).collect())
        assert urls == ["u1", "u2", "u3"]


def _mk_url_slices(spark, tmp_path, slices):
    import glob
    import os
    import shutil
    import time

    src = os.path.join(str(tmp_path), "cands")
    os.makedirs(src, exist_ok=True)
    for i, urls in enumerate(slices):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        d = os.path.join(str(tmp_path), f"cw{i}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        dst = os.path.join(src, f"slice-{i}.parquet")
        shutil.move(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (time.time() + i, time.time() + i))  # mtime order = batch order
    return src


def test_frontier_ingest_stream_matches_batch_dedup(spark, tmp_path, cfg):
    """Streaming frontier ingest: in-batch dups, cross-batch dups and
    canonicalization-equivalent urls all collapse; the persistent store
    ends with exactly the distinct canon set, first batch wins."""
    import os

    from frontier_engine.config import EngineConfig
    from frontier_engine.streaming import frontier_ingest_stream

    scfg = EngineConfig(n_seen_shards=4, bloom_bits_per_shard=1 << 14)
    slices = [
        ["https://a.example/p/1?x=1&y=2", "https://a.example/p/2", "https://a.example/p/1?x=1&y=2"],
        ["https://a.example/p/1?y=2&x=1", "https://b.example/q"],   # canon dup of slice-0 + new
        ["https://b.example/q", "https://c.example/r"],             # cross-batch dup + new
    ]
    src = _mk_url_slices(spark, tmp_path, slices)
    root = os.path.join(str(tmp_path), "ingest")
    q = frontier_ingest_stream(
        spark, src, root, os.path.join(str(tmp_path), "ck"), scfg
    )
    q.awaitTermination(120)

    out = spark.read.parquet(os.path.join(root, "unseen"))
    got = {(r.url, r.batch_id) for r in out.select("url", "batch_id").collect()}
    assert got == {
        ("https://a.example/p/1?x=1&y=2", 0),
        ("https://a.example/p/2", 0),
        ("https://b.example/q", 1),
        ("https://c.example/r", 2),
    }
    # the persistent store holds exactly the distinct canon set
    from frontier_engine.seen_store import SeenExactStore

    store = SeenExactStore(spark, os.path.join(root, "seen"), n_buckets=scfg.seen_exact_buckets)
    # the stream's store instance appended deltas under the same root
    import glob as g

    parts = g.glob(os.path.join(root, "seen", "*snap-*"))
    canon = {r.canon_url for r in spark.read.parquet(*parts).collect()}
    assert len(canon) == 4


def test_frontier_ingest_stream_resumes_from_checkpoint(spark, tmp_path):
    """Stop after the first batch set, drop MORE files, restart with the
    same checkpoint: only the new files process, the store keeps its
    earlier state, and cross-restart dups still collapse."""
    import os
    import time

    from frontier_engine.config import EngineConfig
    from frontier_engine.streaming import frontier_ingest_stream

    scfg = EngineConfig(n_seen_shards=4, bloom_bits_per_shard=1 << 14)
    src = _mk_url_slices(spark, tmp_path, [["https://a.example/1", "https://a.example/2"]])
    root = os.path.join(str(tmp_path), "ingest")
    ck = os.path.join(str(tmp_path), "ck")
    q = frontier_ingest_stream(spark, src, root, ck, scfg)
    q.awaitTermination(120)

    # second wave: one dup of wave 1, one new
    import glob, shutil
    df = spark.createDataFrame([("https://a.example/2",), ("https://b.example/3",)], "url string")
    d = os.path.join(str(tmp_path), "w-extra")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    dst = os.path.join(src, "slice-9.parquet")
    shutil.move(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
    os.utime(dst, (time.time() + 60, time.time() + 60))

    q2 = frontier_ingest_stream(spark, src, root, ck, scfg)
    q2.awaitTermination(120)

    out = spark.read.parquet(os.path.join(root, "unseen"))
    urls = sorted(r.url for r in out.select("url").collect())
    assert urls == ["https://a.example/1", "https://a.example/2", "https://b.example/3"]
    # the dup url appears exactly once, from the FIRST run's batch
    assert out.where("url = 'https://a.example/2'").select("batch_id").first()[0] == 0


def test_streaming_crawl_equals_batch_crawl(spark, tmp_path_factory):
    """Round-3 e2e: the FULL crawl driven through the Structured-
    Streaming face (self-feeding candidate micro-batches) must equal
    crawler.run_crawl — same batches in the same rounds, same parsed
    listings, same exact seen set."""
    from frontier_engine.config import EngineConfig
    from frontier_engine.crawler import run_crawl
    from frontier_engine.fixtures import WorldSpec, generate_world
    from frontier_engine.parse import CrawlArgs
    from frontier_engine.streaming import run_crawl_stream

    spec = WorldSpec(n_hosts=2, listings_total=12, max_reviews=40)
    world = generate_world(spec)
    args = CrawlArgs(spec.checkin, spec.checkout, spec.price_max)
    cfg = EngineConfig(n_seen_shards=4, bloom_bits_per_shard=1 << 14, salt_partitions=2)
    pages = spark.createDataFrame(world["pages"])
    seeds = spark.createDataFrame(world["seeds"][["url"]])

    batch_res = run_crawl(
        spark, pages, cfg, args, seeds=seeds, max_rounds=40,
        snapshot_dir=str(tmp_path_factory.mktemp("snap-batch")),
    )
    stream_res = run_crawl_stream(
        spark, pages, cfg, args, seeds,
        snapshot_dir=str(tmp_path_factory.mktemp("snap-stream")), max_rounds=40,
    )

    def batches(df):
        return sorted((r["round"], r.host, r.url, r["rank"]) for r in df.collect())

    assert stream_res["rounds"] == batch_res.rounds
    assert batches(stream_res["outputs"]["batches"]) == batches(batch_res.outputs["batches"])
    b_listings = sorted(
        (r["round"], r.listing_id) for r in batch_res.outputs["search_results"].collect()
    )
    s_listings = sorted(
        (r["round"], r.listing_id) for r in stream_res["outputs"]["search_results"].collect()
    )
    assert s_listings == b_listings
    b_pdp = sorted(r.listing_id for r in batch_res.outputs["pdp_rows"].collect())
    s_pdp = sorted(r.listing_id for r in stream_res["outputs"]["pdp_rows"].collect())
    assert s_pdp == b_pdp
    # metrics must be batch-IDENTICAL, not shifted one round (ADVICE r3):
    # every (round, host) row, every counter — including the final
    # round's new_candidates/robots_blocked, which the streaming face
    # only learns at the done path's ingest
    def metric_rows(df):
        return sorted(
            (r["round"], r.host, r.scheduled, r.fetched, r.missing,
             r.robots_blocked, r.bytes_fetched, r.new_candidates)
            for r in df.collect()
        )

    assert metric_rows(stream_res["outputs"]["metrics"]) == metric_rows(
        batch_res.outputs["metrics"]
    )
    assert (
        {r.canon_url for r in stream_res["seen_exact"].collect()}
        == {r.canon_url for r in batch_res.seen_exact.collect()}
    )


def test_streaming_crawl_compacts_state_chains(spark, tmp_path_factory, monkeypatch):
    """ADVICE r3: the streaming face must fold its shard/frontier chains
    like the batch driver — aggressive compaction settings both keep the
    manifest chains bounded AND leave the crawl's results unchanged."""
    from frontier_engine import crawler as C
    from frontier_engine.config import EngineConfig
    from frontier_engine.crawler import run_crawl
    from frontier_engine.fixtures import WorldSpec, generate_world
    from frontier_engine.parse import CrawlArgs
    from frontier_engine.snapshots import SnapshotStore
    from frontier_engine.streaming import run_crawl_stream

    monkeypatch.setattr(C._ShardState, "COMPACT_CHAIN", 2)
    spec = WorldSpec(n_hosts=2, listings_total=12, max_reviews=40)
    world = generate_world(spec)
    args = CrawlArgs(spec.checkin, spec.checkout, spec.price_max)
    cfg = EngineConfig(
        n_seen_shards=4, bloom_bits_per_shard=1 << 14, salt_partitions=2,
        frontier_compact_ratio=0.01,
    )
    pages = spark.createDataFrame(world["pages"])
    seeds = spark.createDataFrame(world["seeds"][["url"]])

    batch_res = run_crawl(
        spark, pages, cfg, args, seeds=seeds, max_rounds=40,
        snapshot_dir=str(tmp_path_factory.mktemp("snap-batch-compact")),
    )
    sdir = str(tmp_path_factory.mktemp("snap-stream-compact"))
    stream_res = run_crawl_stream(
        spark, pages, cfg, args, seeds, snapshot_dir=sdir, max_rounds=40,
    )
    assert stream_res["rounds"] == batch_res.rounds > 2

    def batches(df):
        return sorted((r["round"], r.host, r.url, r["rank"]) for r in df.collect())

    assert batches(stream_res["outputs"]["batches"]) == batches(batch_res.outputs["batches"])
    assert (
        {r.canon_url for r in stream_res["seen_exact"].collect()}
        == {r.canon_url for r in batch_res.seen_exact.collect()}
    )
    # chains in the final manifest are bounded by the fold triggers, not
    # O(rounds): shard deltas ≤ COMPACT_CHAIN, frontier folded at ratio
    store = SnapshotStore(sdir)
    meta = store.manifest(store.latest_id())["meta"]
    assert len(meta["shards"].get("delta_paths", [])) <= 2
    assert len(meta["frontier"]["delta_paths"]) + len(
        meta["frontier"]["status_paths"]
    ) < stream_res["rounds"]


def test_streaming_crawl_resume_equals_straight_through(spark, tmp_path_factory):
    """Round-3: an interrupted streaming crawl resumed from its
    checkpoint + snapshot manifests must equal the uninterrupted run
    (and therefore the batch crawler) — same batches, same seen set."""
    from frontier_engine.config import EngineConfig
    from frontier_engine.fixtures import WorldSpec, generate_world
    from frontier_engine.parse import CrawlArgs
    from frontier_engine.streaming import run_crawl_stream

    spec = WorldSpec(n_hosts=2, listings_total=12, max_reviews=40)
    world = generate_world(spec)
    args = CrawlArgs(spec.checkin, spec.checkout, spec.price_max)
    cfg = EngineConfig(n_seen_shards=4, bloom_bits_per_shard=1 << 14, salt_partitions=2)
    pages = spark.createDataFrame(world["pages"])
    seeds = spark.createDataFrame(world["seeds"][["url"]])

    full = run_crawl_stream(
        spark, pages, cfg, args, seeds,
        snapshot_dir=str(tmp_path_factory.mktemp("stream-full")), max_rounds=40,
    )
    part_dir = str(tmp_path_factory.mktemp("stream-part"))
    partial = run_crawl_stream(
        spark, pages, cfg, args, seeds, snapshot_dir=part_dir, max_rounds=3,
    )
    assert partial["rounds"] == 3 < full["rounds"]
    resumed = run_crawl_stream(
        spark, pages, cfg, args, snapshot_dir=part_dir, max_rounds=40, resume=True,
    )

    def batches(df):
        return sorted((r["round"], r.host, r.url, r["rank"]) for r in df.collect())

    assert resumed["rounds"] == full["rounds"]
    assert batches(resumed["outputs"]["batches"]) == batches(full["outputs"]["batches"])
    # the capped run leaves round-3's metrics row stashed; the resume's
    # first ingest completes it — resumed metrics equal the full run's
    def metric_rows(df):
        return sorted(
            (r["round"], r.host, r.scheduled, r.fetched, r.missing,
             r.robots_blocked, r.bytes_fetched, r.new_candidates)
            for r in df.collect()
        )

    assert metric_rows(resumed["outputs"]["metrics"]) == metric_rows(
        full["outputs"]["metrics"]
    )
    assert (
        {r.canon_url for r in resumed["seen_exact"].collect()}
        == {r.canon_url for r in full["seen_exact"].collect()}
    )


def test_document_ingest_stream_dedups_and_redacts(spark, tmp_path):
    """Continuous doc ingestion: PII is masked before storage, in-batch
    exact dups collapse first-seen, cross-batch exact AND near dups drop
    against the persisted band table, fresh docs append — and a resumed
    stream processes only new files with an identical final corpus."""
    import os

    from frontier_engine.streaming import document_ingest_stream

    base = " ".join(f"tok{i}" for i in range(30))
    # one token changed mid-document vs doc 1's REDACTED stored text
    # (same mail suffix, masked identically) → 3-shingle jaccard ≈ .83
    near = " ".join(
        ("tokX" if i == 15 else f"tok{i}") for i in range(30)
    ) + " mail me at carol@example.com please."
    fresh = " ".join(f"other{i}" for i in range(30))
    fresh2 = " ".join(f"late{i}" for i in range(30))
    src = os.path.join(str(tmp_path), "docs_in")
    os.makedirs(src)

    def put(name, rows, order=[0]):
        import glob
        import shutil
        import time

        d = os.path.join(str(tmp_path), "stage_" + name)
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (time.time() + order[0], time.time() + order[0]))
        order[0] += 1

    put("f0.parquet", [
        (1, base + " mail me at bob@example.com please."),
        (2, base + " mail me at bob@example.com please."),   # in-batch exact dup
        (3, "completely unrelated seed " + fresh),
    ])
    put("f1.parquet", [
        (10, base + " mail me at bob@example.com please."),  # cross-batch exact dup
        (11, near),                                          # cross-batch NEAR dup
        (12, "genuinely new content " + fresh2),
    ])
    root = os.path.join(str(tmp_path), "ingest")
    ck = os.path.join(str(tmp_path), "ck")
    q = document_ingest_stream(spark, src, root, ck)
    q.awaitTermination(180)

    corpus = spark.read.parquet(os.path.join(root, "corpus"))
    got = {r.doc_id for r in corpus.collect()}
    assert got == {1, 3, 12}, got
    texts = {r.doc_id: r.text for r in corpus.collect()}
    assert "<EMAIL>" in texts[1] and "bob@example.com" not in texts[1]
    # band table covers exactly the survivors
    bands = spark.read.parquet(os.path.join(root, "bands"))
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == got

    # resume: a third file arrives; same root + checkpoint processes ONLY it
    put("f2.parquet", [
        (20, near),                                          # still a near dup
        (21, "brand new " + " ".join(f"z{i}" for i in range(30))),
    ])
    q2 = document_ingest_stream(spark, src, root, ck)
    q2.awaitTermination(180)
    corpus2 = spark.read.parquet(os.path.join(root, "corpus"))
    assert {r.doc_id for r in corpus2.collect()} == {1, 3, 12, 21}
    # earlier partitions untouched by the resumed run (no rewrite)
    assert {r.doc_id for r in corpus2.where("batch_id = 0").collect()} == {1, 3}


def _doc_putter(spark, tmp_path, src):
    """Stage single-parquet doc files into *src* with increasing mtimes
    (maxFilesPerTrigger=1 ⇒ one micro-batch per file, in mtime order)."""
    import glob
    import os
    import shutil
    import time

    order = [0]

    def put(name, rows):
        d = os.path.join(str(tmp_path), "stage_" + name)
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (time.time() + order[0], time.time() + order[0]))
        order[0] += 1

    return put


def test_document_ingest_stream_intra_batch_near_dup(spark, tmp_path):
    """ADVICE r4: two NEAR-identical (non-identical) docs arriving in
    the SAME micro-batch both survived — the corpus join only compares
    against prior batches. The within-batch minhash pass must keep only
    the lower id."""
    import os

    from frontier_engine.streaming import document_ingest_stream

    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(("tokX" if i == 15 else f"tok{i}") for i in range(30))
    src = os.path.join(str(tmp_path), "docs_in")
    os.makedirs(src)
    put = _doc_putter(spark, tmp_path, src)
    put("f0.parquet", [
        (1, base),
        (2, near),   # same-batch NEAR dup of 1 (jaccard ≈ .83) — must drop
        (3, "completely different " + " ".join(f"q{i}" for i in range(30))),
    ])
    root = os.path.join(str(tmp_path), "ingest")
    q = document_ingest_stream(spark, src, root, os.path.join(str(tmp_path), "ck"))
    q.awaitTermination(180)
    corpus = spark.read.parquet(os.path.join(root, "corpus"))
    assert {r.doc_id for r in corpus.collect()} == {1, 3}
    bands = spark.read.parquet(os.path.join(root, "bands"))
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {1, 3}


def test_document_ingest_stream_compacts_state(spark, tmp_path):
    """VERDICT r4 ask #4: one batch_id= partition per micro-batch is a
    many-small-files scan after thousands of batches. With
    compact_every=4 the partition count must stay bounded across 10
    batches, the fold must preserve dedup behavior (a near dup of a
    COMPACTED doc still drops), and the final corpus must equal the
    never-compacting run's."""
    import os

    from frontier_engine.streaming import document_ingest_stream

    def corpus_words(k):
        return " ".join(f"c{k}w{i}" for i in range(30))

    files = []
    for b in range(9):
        files.append((f"f{b}.parquet", [(100 + b, corpus_words(b))]))
    # batch 9: near dup of batch 0's doc (long since folded) + a fresh doc
    near0 = " ".join(("XX" if i == 15 else f"c0w{i}") for i in range(30))
    files.append(("f9.parquet", [(900, near0), (901, corpus_words(99))]))

    def run(tag, compact_every):
        src = os.path.join(str(tmp_path), f"docs_{tag}")
        os.makedirs(src)
        put = _doc_putter(spark, tmp_path, src)
        for name, rows in files:
            put(tag + name, rows)
        root = os.path.join(str(tmp_path), f"ingest_{tag}")
        q = document_ingest_stream(
            spark, src, root, os.path.join(str(tmp_path), f"ck_{tag}"),
            compact_every=compact_every,
        )
        q.awaitTermination(300)
        return root

    root_c = run("c", compact_every=4)
    root_n = run("n", compact_every=10_000)

    for sub in ("corpus", "bands"):
        parts = [f for f in os.listdir(os.path.join(root_c, sub)) if f.startswith("batch_id=")]
        assert len(parts) <= 5, (sub, parts)   # fold keeps it under compact_every+1
        got_c = {r.doc_id for r in spark.read.parquet(os.path.join(root_c, sub)).select("doc_id").distinct().collect()}
        got_n = {r.doc_id for r in spark.read.parquet(os.path.join(root_n, sub)).select("doc_id").distinct().collect()}
        assert got_c == got_n, (sub, got_c, got_n)
    got = {r.doc_id for r in spark.read.parquet(os.path.join(root_c, "corpus")).collect()}
    assert 900 not in got and 901 in got and {100 + b for b in range(9)} <= got
