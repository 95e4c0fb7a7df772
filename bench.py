#!/usr/bin/env python
"""Benchmark harness (driver contract): prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

Components:

* headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1), each timed to full materialization
  (noop write — no collect, no driver funnel);
* ``schedule_round``: one full frontier scheduling round (canonicalize →
  bloom-seen dedupe against the BUCKETED seen store → salted priority
  rank → politeness cut → fetch-join) over a 1M-URL synthetic frontier
  with 2000 hosts and a hot host — the BASELINE.md "frontier-schedule"
  metric;
* ``parse_pages``: full 4-type parse (search/PDP/reviews/landing JSON
  extraction incl. the Arrow UDFs) over a generated fixture world —
  the "parse" half of the metric;
* scaling evidence (north rule, N → 4N): the same jobs re-run in
  subprocess-isolated sessions at local[2] / local[8] (the N→4N gate
  pair; 8→32 available via BENCH_SCALING_CORES=2,8,32 but off by
  default — it measures this box's shared-DRAM floor, not the engine),
  plus a Spark-free hardware probe. Protocol (round-2, for cold-run
  reproducibility): per child, one untimed warmup then
  $BENCH_SCALING_REPS (default 3) timed in-session repetitions, extra
  samples only when a rep lands in a steal-contended window; the child
  reports the median and the full list. Efficiency uses the medians.

Wall-budget contract (round-5, VERDICT r4 ask #1): the whole run must
finish inside $BENCH_WALL_BUDGET_S (default 2100 s). The budget is
checked between phases — main child → each scaling child → salt A/B —
and remaining phases are SKIPPED (recorded in the JSON) once it is
exceeded. The slim contract line is re-printed after EVERY phase, each
print superseding the last, so even an external kill mid-run leaves a
parseable final line with everything measured so far.

Retry phase (round-5): if a scaling pair's measurement WINDOW is
flagged (steal-contended rep shortfall, hardware-limited probe ratio,
or >15% CPU-ceiling drift between the pair's two children), ONE second
attempt runs if budget allows. Both attempts are always published
under ``attempts`` and the better WINDOW (never the better efficiency)
is selected — the criteria are deliberately blind to the measured
efficiency so the retry can't become retry-until-pass.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# a scaling rep counts as hypervisor-clean when the host stole ≤ this many
# jiffies (100 jiffies = 1 core-second) during the rep's wall window
STEAL_CLEAN_JIFFIES = int(os.environ.get("BENCH_STEAL_CLEAN_JIFFIES", "200"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FRONTIER_N = int(os.environ.get("BENCH_FRONTIER_N", 1_000_000))
SCALING_N = int(os.environ.get("BENCH_SCALING_N", 8_000_000))
N_HOSTS = 2000


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def synth_frontier(spark, n: int):
    """Deterministic n-URL frontier; host 0 holds ~30% of URLs (hot-host
    skew, the X13 case the salted rank must absorb)."""
    from pyspark.sql import functions as F

    base = spark.range(n)
    host_id = F.when(F.col("id") % 10 < 3, F.lit(0)).otherwise(F.col("id") % N_HOSTS)
    host = F.concat(F.lit("www.h"), host_id.cast("string"), F.lit(".example"))
    return base.select(
        F.concat(F.lit("https://"), host, F.lit("/Page/"), F.col("id"), F.lit("?b=2&a=1")).alias("url"),
        host.alias("host"),
        ((F.col("id") % 4) * 100 + (F.col("id") % 100)).cast("double").alias("priority"),
        F.col("id").alias("discovered_seq"),
        F.lit(10.0).alias("crawl_delay_s"),
        F.lit(10).alias("max_concurrency"),
    )


class ScheduleWorld:
    """Materialized inputs for a scheduling round: frontier + pages
    parquet, a seeded BUCKETED seen store (50% of the frontier already
    seen — steady-state), and the matching bloom shards. Setup is
    untimed; a steady-state crawl amortizes it."""

    def __init__(self, spark, n: int, workdir: str):
        import pyspark.sql.functions as F

        from frontier_engine import seen as S
        from frontier_engine.canon import with_canon_columns
        from frontier_engine.config import EngineConfig
        from frontier_engine.seen_store import SeenExactStore

        self.spark = spark
        self.n = n
        self.cfg = EngineConfig(
            n_seen_shards=64, bloom_bits_per_shard=1 << 23, salt_partitions=16,
            round_seconds=1000.0, concurrent_per_host=100,
        )
        fr_path = f"{workdir}/frontier"
        synth_frontier(spark, n).write.mode("overwrite").parquet(fr_path)
        self.frontier = spark.read.parquet(fr_path)
        pages_path = f"{workdir}/pages"
        self.frontier.where(F.col("discovered_seq") % 10 != 0).select(
            "url", F.lit("x").alias("text")
        ).write.mode("overwrite").parquet(pages_path)
        self.pages = spark.read.parquet(pages_path)

        t0 = time.time()
        seeded = with_canon_columns(self.frontier.where(F.col("discovered_seq") % 2 == 0))
        self.store = SeenExactStore(spark, f"{workdir}/seen_store", n_buckets=64)
        self.store.append(seeded, "seed", n_new=n // 2)  # → bucketed base
        shards = S.update_shards(
            self.spark.read.parquet(self.store.base_path), S.empty_shards(spark),
            self.cfg.n_seen_shards, self.cfg.bloom_bits_per_shard, self.cfg.bloom_num_hashes,
        )
        shards.write.mode("overwrite").parquet(f"{workdir}/shards")
        self.shards = spark.read.parquet(f"{workdir}/shards")
        self.t_seed_setup = round(time.time() - t0, 2)

    def pipeline_once(self) -> dict:
        """ONE end-to-end scheduling round as a single lazy plan driven by
        one terminal action — the fewest-stages shape (cold-run-stable)."""
        import pyspark.sql.functions as F

        from frontier_engine import seen as S
        from frontier_engine.canon import with_canon_columns
        from frontier_engine.schedule import rank_batch

        t0 = time.time()
        cand = with_canon_columns(self.frontier)
        unseen = S.filter_unseen(
            cand, self.shards, self.store.parts(),
            self.cfg.n_seen_shards, self.cfg.bloom_bits_per_shard, self.cfg.bloom_num_hashes,
        )
        batch = rank_batch(unseen, self.cfg)
        # fetch-join in the broadcastable decomposition (fetch.fetch_batch
        # shape): inner join lets AQE broadcast the politeness-bounded
        # batch — the pages table is scanned in place, never shuffled
        fetched = self.pages.join(batch, "url", "inner")
        n_missing = batch.join(fetched.select("url"), "url", "left_anti").count()
        dt = time.time() - t0
        return {"missing": n_missing, "sec": round(dt, 2),
                "urls_per_sec": round(self.n / dt, 1)}


def schedule_round(spark, n: int, workdir: str | None = None) -> dict:
    """Staged-timing variant (headline detail): each stage driven to a
    noop sink, inter-stage state re-fed from parquet like a real round."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from frontier_engine import seen as S
    from frontier_engine.canon import with_canon_columns
    from frontier_engine.schedule import rank_batch

    workdir = workdir or tempfile.mkdtemp(prefix="bench-round-")
    w = ScheduleWorld(spark, n, workdir)
    cfg = w.cfg

    # ---- stage 1: canonicalize + hash (ingest path)
    cand_path = f"{workdir}/cand"
    t0 = time.time()
    _noop(with_canon_columns(w.frontier))
    t_canon = time.time() - t0
    with_canon_columns(w.frontier).write.mode("overwrite").parquet(cand_path)
    cand = spark.read.parquet(cand_path)

    # ---- stage 2: dedupe (bloom prefilter + bucketed exact confirm)
    def mk_unseen():
        return S.filter_unseen(
            cand, w.shards, w.store.parts(),
            cfg.n_seen_shards, cfg.bloom_bits_per_shard, cfg.bloom_num_hashes,
        )

    t0 = time.time()
    _noop(mk_unseen())
    t_dedupe = time.time() - t0
    mk_unseen().write.mode("overwrite").parquet(f"{workdir}/unseen")
    unseen = spark.read.parquet(f"{workdir}/unseen")
    n_unseen = unseen.count()

    # ---- stage 3: salted priority rank + politeness cut
    t0 = time.time()
    _noop(rank_batch(unseen, cfg))
    t_rank = time.time() - t0
    rank_batch(unseen, cfg).write.mode("overwrite").parquet(f"{workdir}/batch")
    batch = spark.read.parquet(f"{workdir}/batch")
    n_batch = batch.count()

    # ---- stage 4: fetch-join vs stored pages (90% coverage); inner+anti
    # decomposition so the batch side is broadcastable (fetch.fetch_batch)
    t0 = time.time()
    fetched = w.pages.join(batch, "url", "inner")
    n_missing = batch.join(fetched.select("url"), "url", "left_anti").count()
    t_fetch = time.time() - t0

    total = t_canon + t_dedupe + t_rank + t_fetch
    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "n": n, "unseen": n_unseen, "batch": n_batch, "missing": n_missing,
        "t_canon": round(t_canon, 2), "t_seed_setup": w.t_seed_setup,
        "t_dedupe": round(t_dedupe, 2), "t_rank": round(t_rank, 2),
        "t_fetch": round(t_fetch, 2), "t_total": round(total, 2),
        "urls_per_sec": round(n / total, 1),
    }


PARSE_WORLD = dict(n_hosts=80, listings_total=12000, max_reviews=120)


def _parse_world_pages(spark):
    from pyspark.sql import functions as F

    from frontier_engine.fixtures import WorldSpec, write_world

    key = f"world_l{PARSE_WORLD['listings_total']}"
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", ".cache", key)
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        write_world(WorldSpec(**PARSE_WORLD), cache)
    pages = spark.read.parquet(os.path.join(cache, "pages.parquet"))
    replicate = int(os.environ.get("BENCH_PARSE_REPLICATE", "8"))
    if replicate > 1:
        # clone the corpus with distinct hosts/urls — identical per-page
        # parse work, corpus large enough to amortize per-job fixed cost
        copies = spark.range(replicate).select(F.col("id").alias("_copy"))
        pages = pages.crossJoin(copies).withColumn(
            "url",
            F.regexp_replace(
                "url", "^https://www\\.", F.concat(F.lit("https://w"), F.col("_copy"), F.lit("."))
            ),
        ).drop("_copy")
    # the base world is one pandas-written file (one row group = ONE
    # partition); spread it or the whole parse runs on a single core
    n_parts = spark.sparkContext.defaultParallelism * 3
    return pages.repartition(n_parts).withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    )


def parse_pages_bench(spark, pages=None, n=None) -> dict:
    """Full 4-type parse (from_json + HOF extraction + the html→text Arrow
    UDF) over a generated world — the parse half of the BASELINE metric.
    Embarrassingly parallel: no join, no shuffle, pure per-page work.

    Runs the engine's ``parse_round`` the way the crawl loop does: each
    type's extraction is persisted so rows + candidates share ONE
    tokenization per page, and the four types materialize CONCURRENTLY
    (one thread per type: rows first — populating the cache — then
    candidates). Concurrent driver actions keep cores busy across each
    job's scheduling gaps and straggler tails, which is exactly how a
    real pipeline submits independent sinks; sequential submission made
    the per-action fixed cost a visible share of an 8-core rep (r5
    run12: 0.733 raw 2→8 in a flag-free window)."""
    from concurrent.futures import ThreadPoolExecutor

    from frontier_engine import parse as P
    from frontier_engine.config import EngineConfig
    from frontier_engine.fixtures import WorldSpec

    if pages is None:
        pages = _parse_world_pages(spark).cache()
        n = pages.count()
    spec = WorldSpec(**PARSE_WORLD)
    args = P.CrawlArgs(spec.checkin, spec.checkout, spec.price_max)
    cfg = EngineConfig()
    t0 = time.time()
    pround = P.parse_round(pages, args, cfg)

    def run_type(ptype):
        rows, cands = pround.by_type[ptype]
        _noop(rows)   # materializes the persisted extraction
        _noop(cands)  # cache hit: projection only, no re-tokenization
        return ptype

    with ThreadPoolExecutor(max_workers=len(P.PARSE_TYPES)) as ex:
        list(ex.map(run_type, P.PARSE_TYPES))
    pround.unpersist()
    dt = time.time() - t0
    return {"pages": n, "sec": round(dt, 2), "pages_per_sec": round(n / dt, 1)}


def ingest_round_bench(spark, sf_dir: str, pages) -> dict:
    """One full training-data ingest round, stage-split (VERDICT r3 ask
    #6): the LLM-pipeline path benchmarked end-to-end the way schedule
    rounds are, so regressions in it are visible round-over-round.

    corpus_setup (amortized in deployment — the bands table is computed
    once and persisted, see textops.corpus_band_table) is timed but NOT
    part of the per-round total. The round itself:

      fetch_join   crawl batch (1/3 of page URLs) ⋈ pages (inner+anti)
      parse_text   html bytes → plaintext (the Arrow UDF) → batch docs
      exact_dedup  first-seen-wins on xxhash64(text)
      minhash_join batch bands ⋈ persisted corpus bands → near-dup drop
      quality      Gopher repetition + quality gates + GPT-3-style
                   benchmark decontamination (r4: the filter family a
                   real ingest applies between dedup and sampling)
      clean        PII redaction + C4 line metrics + corpus
                   repeated-line dedup (late r4: the cleaning chain —
                   metrics computed, text passed through redact+line
                   dedup; the html→text output is genuinely multi-line
                   so the line shuffles are real)
      sample       lang_id + salted stratified quota sampling
      pack         GPT-style sequence packing of the cleaned batch
                   (2048-token sequences, distributed prefix-sum)

    Stages hand off via parquet on /dev/shm (same discipline as
    schedule_round: each stage timed to full materialization)."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from frontier_engine.fetch import fetch_batch
    from frontier_engine.html_text import html_bytes_to_text_arrow
    from frontier_engine.textops import (
        corpus_band_table, lang_id, minhash_dedup_join, stratified_sample,
    )

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ingest-round-", dir=shm)
    out = {}

    def stage(name, f):
        t0 = time.time()
        r = f()
        out[name] = round(time.time() - t0, 2)
        return r

    # --- corpus side: computed ONCE, persisted (not in the round total)
    corpus = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def setup():
        corpus_band_table(corpus).write.mode("overwrite").parquet(
            os.path.join(work, "corpus_bands")
        )

    stage("corpus_setup", setup)
    bands = spark.read.parquet(os.path.join(work, "corpus_bands"))

    # --- the ingest round
    def fetch_join():
        batch = pages.select("url", "host").where(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
        fetched, missing = fetch_batch(batch.withColumn("rank", F.lit(1)), pages)
        fetched.select("url", "html").write.mode("overwrite").parquet(
            os.path.join(work, "fetched")
        )
        _noop(missing)

    stage("fetch_join", fetch_join)

    def parse_text():
        fetched = spark.read.parquet(os.path.join(work, "fetched"))
        html_bytes_to_text_arrow(
            fetched.select(F.xxhash64("url").alias("doc_id"), "html"),
            keep=("doc_id",),
        ).write.mode("overwrite").parquet(os.path.join(work, "batch_docs"))

    stage("parse_text", parse_text)

    def exact_dedup():
        docs = spark.read.parquet(os.path.join(work, "batch_docs"))
        w_first = F.row_number().over(
            Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
        )
        docs.withColumn("_rn", w_first).where(F.col("_rn") == 1).drop("_rn").write.mode(
            "overwrite"
        ).parquet(os.path.join(work, "uniq_docs"))

    stage("exact_dedup", exact_dedup)

    def minhash_join():
        uniq = spark.read.parquet(os.path.join(work, "uniq_docs"))
        matches = minhash_dedup_join(uniq, corpus, corpus_bands=bands).select(
            F.col("id_a").alias("doc_id")
        ).distinct()
        # spread the output files: AQE coalesces the small anti-join to
        # ONE partition, and a single-row-group parquet file makes every
        # downstream per-doc stage single-core (the 100 TB shape writes
        # many files per commit anyway)
        uniq.join(matches, "doc_id", "left_anti").repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(os.path.join(work, "survivors"))

    stage("minhash_join", minhash_join)

    def quality():
        from frontier_engine.textops import (
            decontaminate, quality_score, repetition_metrics,
        )

        surv = spark.read.parquet(os.path.join(work, "survivors"))
        # the gate keys on word_rep_frac only → n=1 explode (the full
        # 6-n family over full-page texts is ~6 corpus explodes — the
        # driver's text_metrics row times that; the gate doesn't need it)
        rep = repetition_metrics(surv, top_ns=(), dup_ns=()).select(
            "doc_id", "word_rep_frac"
        )
        qs = quality_score(surv).select("doc_id", "passes_quality")
        bmk = corpus.where(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
        dec = decontaminate(surv, bmk, n=8).select("doc_id", "contaminated")
        (
            surv.join(rep, "doc_id")
            .join(qs, "doc_id")
            .join(dec, "doc_id")
            .where(
                F.col("passes_quality")
                & ~F.col("contaminated")
                & (F.col("word_rep_frac") < 0.9)
            )
            .select("doc_id", "text")
            .write.mode("overwrite")
            .parquet(os.path.join(work, "kept"))
        )

    stage("quality", quality)

    def clean():
        from frontier_engine.textops import (
            c4_line_filter, pii_redact, repeated_line_dedup,
        )

        kept = spark.read.parquet(os.path.join(work, "kept"))
        pii = pii_redact(kept)
        redacted = pii.select("doc_id", F.col("clean_text").alias("text"))
        # C4 metrics are computed (the row-expression cost is real) but
        # the text is NOT gated on them here — boilerplate-line removal
        # is the transform this corpus actually needs; the quality stage
        # already applied the doc-level gates
        c4 = c4_line_filter(redacted).select("doc_id", "lines_kept", "doc_kept")
        rl = repeated_line_dedup(redacted, min_docs=3).select(
            "doc_id", F.col("dedup_text").alias("text")
        )
        pii.select("doc_id").join(c4, "doc_id").join(rl, "doc_id").select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(os.path.join(work, "cleaned"))

    stage("clean", clean)

    def sample():
        surv = spark.read.parquet(os.path.join(work, "cleaned"))
        labeled = lang_id(surv).select("doc_id", "pred_lang")
        quotas = {"en": 5000, "und": 5000, "es": 1000, "fr": 1000, "de": 1000}
        # sampling selects IDs; consumers join text back by doc_id
        _noop(stratified_sample(labeled, quotas, group_col="pred_lang"))

    stage("sample", sample)

    def pack():
        from frontier_engine.textops import pack_sequences_counted

        cleaned = spark.read.parquet(os.path.join(work, "cleaned"))
        packed, handle = pack_sequences_counted(cleaned, seq_len=2048)
        packed.write.mode("overwrite").parquet(os.path.join(work, "packed"))
        handle.unpersist()

    stage("pack", pack)

    n_docs = spark.read.parquet(os.path.join(work, "batch_docs")).count()
    round_stages = [
        "fetch_join", "parse_text", "exact_dedup", "minhash_join", "quality",
        "clean", "sample", "pack",
    ]
    out["t_round"] = round(sum(out[s] for s in round_stages), 2)
    out["docs"] = n_docs
    out["docs_per_sec"] = round(n_docs / out["t_round"], 1) if out["t_round"] else None
    import shutil as _sh

    _sh.rmtree(work, ignore_errors=True)
    return out


def operator_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as E

    headline = [
        "frontier_rank", "frontier_dedup", "robots_filter", "fetch_join_missing",
        "price_parse", "reviews_offsets", "pricing_summary", "cache_join",
        "topk_per_group", "events_windows", "dedup_exact",
        "text_metrics",  # r4 consolidated: lang_id + quality + tokens + fingerprint
        "minhash_dedup", "simhash_pairs",
        "ann_topk",  # r4 consolidated: brute + lsh + ivf
        "seen_bloom",
        # round-2 additions
        "duplicate_spans", "ttl_recrawl",
        # round-3 additions
        "ivf_topk_join", "minhash_dedup_join", "stratified_sample", "export_grid",
        # round-4 additions (consolidated rows: semantic_dedup =
        # corpus+ingest modes, media_near_dup = image+audio)
        "semantic_dedup", "media_near_dup",
        # late-r4 cleaning/packing rows
        "pii_clean", "pack_sequences",
        # r5 additions: crawl-trap admission cap (salted per-template
        # top-k) and HTML link extraction + RFC 3986 resolution
        "trap_filter", "link_extract",
    ]
    qs = E.queries()
    out = {}
    for name in headline:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 2)
    return out


def _probe_eff(procs: int) -> float:
    """Spark-free parallel-CPU ceiling at *procs* processes, measured in
    THIS process's window (single-proc baseline / pool wall). Cheap
    (~2.5 s) — each scaling child brackets its reps with it so
    efficiency can be normalized against the hardware available to THAT
    child, not the whole run's average."""
    import multiprocessing as mp

    # min-of-3 baseline and min-of-2 pool walls over ~1 s burns, with a
    # warmup map on the live pool first: the single-shot form put
    # ~0.1-0.2 s of fork cost inside a ~0.35 s timed wall and let one
    # scheduler hiccup swing the ratio either way (r5 run3 published a
    # nonsense 1.029 ceiling for the n2 parse child from exactly this;
    # back-to-back idle-window calls read 0.661 then 1.01 at 8p).
    # Timing noise on a shared host is one-sided — contention only ADDS
    # time — so min-of-N on both sides estimates true capacity.
    bases = []
    for _ in range(3):
        t0 = time.time()
        _cpu_burn(0)
        bases.append(time.time() - t0)
    with mp.Pool(procs) as p:
        p.map(_cpu_burn, range(procs))  # warm: forks + imports paid here
        walls = []
        for _ in range(2):
            t0 = time.time()
            p.map(_cpu_burn, range(procs))
            walls.append(time.time() - t0)
    return round(min(bases) / min(walls), 3)


def _scaling_setup(job: str, n_cores: int, n_urls: int):
    """Session + workload for one scaling child: the conf and warmup
    shared by the sequential child (`--scaling-child`) and the paired
    server (`--scaling-server`). Returns ``(spark, rep_fn)`` where
    ``rep_fn()`` runs ONE timed rep and returns its rate."""
    import tempfile

    from frontier_engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")  # 8–16g sweet spot
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    # schedule jobs move ONLY the 8-byte hash column through Arrow, so
    # 200k-row batches are ~1.6 MB — fewer per-batch Python round-trips.
    # Parse jobs carry whole html payloads per row: keep the default.
    extra = {"spark.sql.execution.arrow.maxRecordsPerBatch": "200000"} if job == "schedule" else None
    if job == "parse":
        # Amortize fixed per-job cost: one parse rep is EIGHT driver
        # actions (rows+cands × 4 types), each with ~constant
        # submission/scheduling overhead that does not shrink with
        # cores. After the r4 from_json fix tripled per-page speed, that
        # constant became a visible share of an 8-core rep (measured
        # per-job speedups 3.1-3.8×, whole-rep only ~2.5× in short
        # reps). Doubling the corpus for the scaling children keeps
        # per-rep compute dominant, so the pair measures the ENGINE's
        # scaling, not Spark's job-submission constant.
        os.environ.setdefault("BENCH_PARSE_REPLICATE", "16")
        # the doubled cached corpus needs headroom beyond 8g (GCLocker
        # alloc failures observed); 12g stays inside the 8-16g band that
        # benches well on this box (larger heaps measurably regress)
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = "12g"
    spark = get_spark(app_name=f"bench-scale-{n_cores}", master=f"local[{n_cores}]",
                      shuffle_partitions=max(n_cores * 2, 16), extra_conf=extra)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if job == "schedule":
        import atexit
        import shutil

        # /dev/shm is finite and shared: clean the world up when the
        # child exits (crash-orphaned dirs are swept by the next run's
        # _sweep_stale_tmpdirs — both paths keyed on the bench- prefix)
        workdir = tempfile.mkdtemp(prefix="bench-scale-", dir=shm)
        atexit.register(shutil.rmtree, workdir, ignore_errors=True)
        world = ScheduleWorld(spark, n_urls, workdir)
        world.pipeline_once()  # warmup: JIT + Python workers + broadcast
        return spark, lambda: world.pipeline_once()["urls_per_sec"]
    pages = _parse_world_pages(spark).cache()
    n = pages.count()
    parse_pages_bench(spark, pages, n)  # warmup
    return spark, lambda: parse_pages_bench(spark, pages, n)["pages_per_sec"]


def _child_summary(rates: list, steals: list, probes: list,
                   n_cores: int, n_urls: int, job: str) -> dict:
    """The per-child result block (same schema in sequential and paired
    modes): median + every rep's rate and steal delta, the steal-clean
    median, and the child's own Spark-free CPU ceiling."""
    med = statistics.median(rates)
    clean = [r for r, s in zip(rates, steals) if s is not None and s <= STEAL_CLEAN_JIFFIES]
    return {"rate": med, "rates": rates, "steal_jiffies": steals,
            "rate_clean": round(statistics.median(clean), 1) if clean else None,
            "clean_reps": len(clean),
            "cpu_ceiling": round(sum(probes) / len(probes), 3) if probes else None,
            "spread": round((max(rates) - min(rates)) / med, 3) if med else None,
            "cores": n_cores, "n": n_urls if job == "schedule" else None}


def _scaling_child(n_cores: int, n_urls: int, job: str, repeats: int | None = None) -> None:
    """One subprocess = one session at local[n_cores]: untimed warmup,
    then *repeats* timed in-session runs; report median + all (the
    cross-run variance on this box lives BETWEEN sessions — in-session
    repeats with a warm JVM are the reproducible estimator). Each rep is
    bracketed with /proc/stat steal jiffies so a host-contended rep is
    identifiable: ``rate_clean`` is the median over reps whose steal
    delta is ≤ STEAL_CLEAN_JIFFIES (absent when no rep qualifies)."""
    if repeats is None:
        repeats = int(os.environ.get("BENCH_SCALING_REPS", "3"))
    spark, rep_fn = _scaling_setup(job, n_cores, n_urls)
    probe_pre = _probe_eff(n_cores)
    rates, steals = [], []

    def timed():
        s0 = _read_steal_jiffies()
        rate = rep_fn()
        s1 = _read_steal_jiffies()
        rates.append(rate)
        steals.append((s1 - s0) if (s0 is not None and s1 is not None) else None)

    def _clean_count() -> int:
        return sum(1 for s in steals if s is not None and s <= STEAL_CLEAN_JIFFIES)

    # sample until `repeats` reps land in steal-clean windows, bounded at
    # repeats+2 total — a noisy host costs extra samples, never silently
    # biases the estimate (EVERY rep's rate + steal delta is published)
    max_reps = repeats + 2
    while len(rates) < max_reps and (len(rates) < repeats or _clean_count() < repeats):
        timed()
    r = _child_summary(rates, steals, [probe_pre, _probe_eff(n_cores)],
                       n_cores, n_urls, job)
    print("SCALING_RESULT " + json.dumps(r))
    spark.stop()


def _scaling_server(n_cores: int, n_urls: int, job: str) -> None:
    """Paired-mode child: same session + warmup as `_scaling_child`,
    but reps run ON DEMAND, one per REP line on stdin, so the parent
    can interleave the n2 and n8 children's reps in ONE shared window.
    The sequential protocol's efficiency is a ratio of two child
    sessions that run minutes apart — run15 showed a bandwidth-
    depressed stretch can cover one child and lift before the other
    with no steal/CPU-probe signature. Interleaved pairs make each
    efficiency sample a ratio of two ADJACENT ~10-30 s windows, so
    slow window drift cancels in the ratio instead of becoming the
    measurement."""
    spark, rep_fn = _scaling_setup(job, n_cores, n_urls)
    # second untimed warmup: paired-mode warmups run CONCURRENTLY
    # (lo+hi cores + two JVMs' GC in flight), so the setup warmup is
    # contended and under-warms — both published paired runs show the
    # pattern (first pair 0.338 / 0.369 from a first n8 rep at ~2.3×
    # under its own steady rate, all later pairs in band). This rep
    # also runs contended, but it absorbs the JIT/page-cache ramp so
    # rep 1 measures steady state like the rest. All timed reps are
    # still published.
    rep_fn()
    print("SERVER_READY", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "REP":
            s0 = _read_steal_jiffies()
            rate = rep_fn()
            s1 = _read_steal_jiffies()
            print("REP_RESULT " + json.dumps(
                {"rate": rate,
                 "steal": (s1 - s0) if (s0 is not None and s1 is not None) else None}),
                flush=True)
        elif cmd == "PROBE":
            print("PROBE_RESULT " + json.dumps({"eff": _probe_eff(n_cores)}), flush=True)
        elif cmd == "EXIT":
            break
    spark.stop()
    print("SERVER_DONE", flush=True)


class _PairChild:
    """Parent-side handle on one `--scaling-server` subprocess: line
    protocol over stdin/stdout with a reader thread (stderr drained to
    a bounded tail so Spark logs can't fill the pipe and deadlock)."""

    def __init__(self, job: str, cores: int, n_urls: int):
        import collections
        import queue
        import threading

        self.cores, self.n_urls, self.job = cores, n_urls, job
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--scaling-server",
             str(cores), str(n_urls), job],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, bufsize=1,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        self._q: "queue.Queue" = queue.Queue()
        self.stderr_tail: "collections.deque" = collections.deque(maxlen=40)
        threading.Thread(target=self._pump_out, daemon=True).start()
        threading.Thread(target=self._pump_err, daemon=True).start()

    def _pump_out(self) -> None:
        for line in self.proc.stdout:
            self._q.put(line.rstrip("\n"))
        self._q.put(None)

    def _pump_err(self) -> None:
        for line in self.proc.stderr:
            self.stderr_tail.append(line)

    def send(self, cmd: str) -> None:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()

    def expect(self, prefix: str, timeout: float):
        """Next stdout line starting with *prefix* (other lines — py4j
        noise, GC prints — are skipped); parsed JSON payload or None."""
        import queue

        deadline = time.time() + timeout
        while True:
            left = deadline - time.time()
            if left <= 0:
                raise TimeoutError(f"{self.job}:n{self.cores} waiting for {prefix}")
            try:
                line = self._q.get(timeout=min(left, 5.0))
            except queue.Empty:
                continue
            if line is None:
                raise RuntimeError(
                    f"{self.job}:n{self.cores} child exited rc={self.proc.poll()}: "
                    + "".join(self.stderr_tail)[-400:])
            if line.startswith(prefix):
                rest = line[len(prefix):].strip()
                return json.loads(rest) if rest else None

    def close(self) -> None:
        try:
            if self.proc.poll() is None:
                self.send("EXIT")
                self.proc.wait(timeout=60)
        except Exception:
            pass
        if self.proc.poll() is None:
            self.proc.kill()


def _run_pair(job: str, repeats: int | None = None,
              remaining=lambda: 1e9) -> dict:
    """Interleaved paired scaling measurement: both children warm up
    CONCURRENTLY (their own sessions at local[2] / local[8]), then the
    parent alternates single reps n2→n8→n2→n8 so each pair shares one
    ~adjacent window; efficiency is the MEDIAN OF PAIRWISE ratios
    (robust to drift BETWEEN pairs), with the ratio-of-medians kept
    beside it for continuity with runs 1–15. Probe and rep commands
    never overlap — exactly one child computes at any instant, same as
    the sequential protocol, so rates are comparable across modes.
    Returns the jout dict ({"_fail": ...} on any child failure, so the
    caller can fall back to the sequential path)."""
    cores = _scaling_cores()
    if len(cores) != 2:
        return {"_fail": f"paired mode needs exactly 2 core counts, got {cores}"}
    if repeats is None:
        repeats = int(os.environ.get("BENCH_SCALING_REPS", "3"))
    lo, hi = cores
    kids: dict[int, _PairChild] = {}
    probes: dict[int, list] = {c: [] for c in cores}
    rates: dict[int, list] = {c: [] for c in cores}
    steals: dict[int, list] = {c: [] for c in cores}

    def _pair_clean(i: int) -> bool:
        return all(steals[c][i] is not None
                   and steals[c][i] <= STEAL_CLEAN_JIFFIES for c in cores)

    def _clean_pairs() -> int:
        return sum(1 for i in range(len(rates[lo])) if _pair_clean(i))

    try:
        for c in cores:
            kids[c] = _PairChild(job, c, _child_n_urls(job, c, SCALING_N))
        # warmups overlap (lo+hi cores in flight — fine on this box and
        # saves wall); everything after READY is strictly sequential
        for c in cores:
            kids[c].expect("SERVER_READY", timeout=max(120, min(1200, remaining())))
        for c in cores:
            kids[c].send("PROBE")
            probes[c].append(kids[c].expect("PROBE_RESULT", 180)["eff"])
        max_pairs = repeats + 2
        while (len(rates[lo]) < max_pairs
               and (len(rates[lo]) < repeats or _clean_pairs() < repeats)):
            if remaining() < 180:
                break
            for c in cores:  # one pair: lo rep, then hi rep, back-to-back
                kids[c].send("REP")
                out = kids[c].expect("REP_RESULT", max(120, min(900, remaining())))
                rates[c].append(out["rate"])
                steals[c].append(out["steal"])
        for c in cores:
            kids[c].send("PROBE")
            probes[c].append(kids[c].expect("PROBE_RESULT", 180)["eff"])
    except Exception as e:  # noqa: BLE001 — salvage completed pairs, else fall back
        tails = {f"n{c}": "".join(k.stderr_tail)[-300:] for c, k in kids.items()}
        n_done = min(len(rates[lo]), len(rates[hi]))
        if n_done < 2:
            return {"_fail": f"{type(e).__name__}: {e}", "stderr_tails": tails}
        # a child died MID-window (run16: transient SparkContext
        # shutdown in the n2 schedule child) but ≥2 complete pairs
        # exist: publish them, annotated, instead of discarding the
        # whole shared-window measurement — the sequential fallback
        # costs ~8 min of wall and loses the adjacent-window property
        # the paired protocol exists for. Trim to complete pairs only.
        for c in cores:
            rates[c] = rates[c][:n_done]
            steals[c] = steals[c][:n_done]
        salvaged = {"error": f"{type(e).__name__}: {e}"[:300],
                    "stderr_tails": tails, "pairs_completed": n_done}
    else:
        salvaged = None
    finally:
        for k in kids.values():
            k.close()
    if not rates[lo] or len(rates[lo]) != len(rates[hi]):
        return {"_fail": "no complete pairs inside the wall budget"}
    ratio = hi / lo
    pair_effs = [round((rates[hi][i] / rates[lo][i]) / ratio, 3)
                 for i in range(len(rates[lo]))]
    clean_effs = [e for i, e in enumerate(pair_effs) if _pair_clean(i)]
    jout = {f"n{c}": _child_summary(rates[c], steals[c],
                                    [p for p in probes[c] if p is not None], c,
                                    _child_n_urls(job, c, SCALING_N), job)
            for c in cores}
    jout["pair_effs"] = pair_effs
    jout["pair_effs_clean"] = clean_effs or None
    jout["protocol"] = "paired-interleaved"
    if salvaged:
        jout["salvaged_after_child_failure"] = salvaged
    return jout


def _run_child(job: str, cores: int, n_urls: int, timeout_s: float = 2400) -> dict:
    """Run one scaling child. Always returns a dict: the parsed
    SCALING_RESULT on success, else {"_fail": reason[, stderr_tail]} so
    the artifact attributes a timeout to the wall budget and a crash
    (OOM, Spark init failure, unhandled exception) to the child — never
    the wrong cause (the published runs are self-explaining evidence)."""
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child",
             str(cores), str(n_urls), job],
            capture_output=True, text=True, timeout=max(60, timeout_s),
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return {"_fail": "timeout"}
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    return {
        "_fail": f"no SCALING_RESULT (rc={p.returncode})",
        "stderr_tail": (p.stderr or "")[-400:],
    }


def _scaling_eff(jout: dict) -> None:
    """Fill the efficiency fields computable from the children present
    in *jout* (idempotent — re-run after every child so each emitted
    contract line carries everything measured so far)."""
    # Headline `efficiency` is the north-rule N→4N pair at 2→8 cores:
    # below this box's DRAM-saturation point, so it measures the
    # ENGINE's scaling (shuffle/skew/plan), which is what transfers to
    # a cluster where each executor brings its own memory bandwidth.
    # 8→32 (opt-in) shares one DRAM bus 4 ways and is published
    # separately as the hardware floor (compare membw_eff_32p).
    if "n2" in jout and "n8" in jout:
        if jout.get("pair_effs"):
            # paired-interleaved protocol (run16+): the headline is the
            # MEDIAN OF PAIRWISE ratios — each pair's two reps ran
            # back-to-back in one ~adjacent window, so drift between
            # pairs cancels in each ratio; the sequential formula
            # (ratio of per-child medians) is kept beside it for
            # cross-run continuity
            jout["efficiency"] = round(statistics.median(jout["pair_effs"]), 3)
            jout["efficiency_medratio"] = round(
                (jout["n8"]["rate"] / jout["n2"]["rate"]) / 4.0, 3)
        else:
            jout["efficiency"] = round((jout["n8"]["rate"] / jout["n2"]["rate"]) / 4.0, 3)
        jout["efficiency_pair"] = "2->8 cores (N->4N)"
        # steal-filtered twin: same pair over the medians of reps whose
        # per-rep /proc/stat steal delta was ≤ STEAL_CLEAN_JIFFIES —
        # published BESIDE the raw number, never instead of it
        if jout.get("pair_effs"):
            ce = jout.get("pair_effs_clean")
            if ce:
                jout["efficiency_clean"] = round(statistics.median(ce), 3)
        else:
            c2, c8 = jout["n2"].get("rate_clean"), jout["n8"].get("rate_clean")
            if c2 and c8:
                jout["efficiency_clean"] = round((c8 / c2) / 4.0, 3)
        # per-child ceiling normalization: each child measured its own
        # Spark-free parallel-CPU ceiling (bracketing probes at ITS
        # core count, in ITS window) — the hardware-allowed 2→8
        # speedup is 4·(ceil8/ceil2), so divide it out
        h2, h8 = jout["n2"].get("cpu_ceiling"), jout["n8"].get("cpu_ceiling")
        if h2 and h8:
            jout["efficiency_vs_child_ceiling"] = round(
                jout["efficiency"] / (h8 / h2), 3
            )
            # when the hardware probe ITSELF scaled below the 0.8 gate
            # in this window (co-tenant memory-bandwidth pressure the
            # steal-jiffy gate can't see — steal counts CPU preemption
            # only), no engine can read ≥0.8 raw here; flag it so the
            # artifact is self-explaining rather than silently failing
            # the gate on a hardware-limited window
            jout["window_hardware_limited"] = bool((h8 / h2) < 0.8)
        # complementary flag for CPU-preemption windows: a child that
        # burned its extra-sample allowance and still couldn't collect
        # the requested number of steal-clean reps measured a window
        # where even the clean median rests on too few samples (run5
        # shape: n8 1/5 clean reps → schedule 0.58 raw on a box whose
        # clean windows read 0.84-0.95 on identical code)
        want = int(os.environ.get("BENCH_SCALING_REPS", "3"))
        if jout.get("pair_effs"):
            # paired mode: the unit of measurement is the PAIR — a pair
            # is clean only when BOTH its reps are steal-clean
            jout["window_steal_contended"] = bool(
                len(jout.get("pair_effs_clean") or []) < want)
        else:
            jout["window_steal_contended"] = bool(
                min(jout["n2"].get("clean_reps", want),
                    jout["n8"].get("clean_reps", want)) < want
            )
    if "n8" in jout and "n32" in jout:
        jout["efficiency_8_32"] = round((jout["n32"]["rate"] / jout["n8"]["rate"]) / 4.0, 3)


def _window_flagged(jout: dict) -> bool:
    """True when the pair's measurement WINDOW is suspect: a child ran
    short of clean reps, the probe ratio marked it hardware-limited, or
    the two children's own CPU ceilings drifted >15% apart (the
    children run minutes apart — drift means they measured different
    boxes). Window criteria only; the efficiency value plays no part."""
    if not ("n2" in jout and "n8" in jout):
        return False
    if jout.get("window_steal_contended") or jout.get("window_hardware_limited"):
        return True
    h2, h8 = jout["n2"].get("cpu_ceiling"), jout["n8"].get("cpu_ceiling")
    return bool(h2 and h8 and not (0.85 <= h8 / h2 <= 1.15))


def _window_rank(jout: dict) -> tuple:
    """Orderable window quality: fewer flags, then more clean reps in
    the weaker child, then the higher floor on the children's own CPU
    ceilings. Deliberately blind to the measured efficiency."""
    flags = int(bool(jout.get("window_steal_contended"))) + int(
        bool(jout.get("window_hardware_limited"))
    )
    if jout.get("pair_effs"):
        reps = len(jout.get("pair_effs_clean") or [])
    else:
        reps = min(jout.get("n2", {}).get("clean_reps") or 0,
                   jout.get("n8", {}).get("clean_reps") or 0)
    ceil = min(jout.get("n2", {}).get("cpu_ceiling") or 0.0,
               jout.get("n8", {}).get("cpu_ceiling") or 0.0)
    return (-flags, reps, ceil)


def _attempt_summary(jout: dict) -> dict:
    """Four-field projection of each scaling child plus the job-level
    scalars — the ONE slimming used both for `attempts` records and for
    the slim contract line (_slim), so the two can't drift apart."""
    out = {k: v for k, v in jout.items() if k not in ("n2", "n8", "n32", "attempts")}
    for nk in ("n2", "n8", "n32"):
        if nk not in jout:
            continue
        c = jout[nk] or {}
        out[nk] = {"rate": c.get("rate"), "rate_clean": c.get("rate_clean"),
                   "cpu_ceiling": c.get("cpu_ceiling"),
                   "clean_reps": c.get("clean_reps")}
    return out


def _scaling_cores() -> list[int]:
    raw = os.environ.get("BENCH_SCALING_CORES", "2,8")
    return [int(c) for c in raw.split(",") if c.strip()]


def _child_n_urls(job: str, cores: int, n_urls: int) -> int:
    """Schedule children scale the input with cores — 2M at 2 cores vs
    8M at 8 cores is 1M URLs/core either way, i.e. a WEAK-SCALING
    protocol (constant per-core work, Gustafson), which is the measure
    that actually transfers to a cluster growing data with executors.
    Stated plainly because it mixes a data-size axis into the ratio: a
    strong-scaling read (same input both sides) would confound the n2
    child with 27 min of wall (the r4 budget sink) or the n8 child with
    fixed-cost amortization at 2M. Throughput is a rate, so efficiency
    = (rate_8 / rate_2) / 4 is exact under either protocol when per-URL
    cost is size-invariant; the superlinear-artifact guard (window
    flags + retry) covers the cases where it isn't. Parse children
    share one cached corpus at BOTH core counts (the world generator is
    the expensive part), so parse is strong-scaling."""
    if job == "schedule" and cores <= 2:
        return max(n_urls // 4, 500_000)
    return n_urls


def _max_task_ms(spark, job_group: str) -> float | None:
    """Max single-task duration (ms) across all stages of *job_group*,
    via the status REST API (needs spark.ui.enabled). None on any
    failure — the A/B then reports wall-clock only."""
    import json as _json
    import urllib.request

    try:
        base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
        jobs = _json.load(urllib.request.urlopen(f"{base}/jobs", timeout=10))
        stage_ids = {
            sid for j in jobs if j.get("jobGroup") == job_group for sid in j["stageIds"]
        }
        worst = 0.0
        for sid in stage_ids:
            url = f"{base}/stages/{sid}/0/taskSummary?quantiles=1.0"
            try:
                summ = _json.load(urllib.request.urlopen(url, timeout=10))
            except Exception:
                continue  # skipped/pending stage attempt
            if summ.get("duration"):
                worst = max(worst, float(summ["duration"][0]))
        return worst or None
    except Exception:
        return None


def _salt_ab_child(n_urls: int) -> None:
    """Hot-host skew A/B (BASELINE evidence plan): the SAME 30%-hot-host
    frontier ranked with salted=False vs salted=True. Reports wall-clock
    and the max single-task time — the straggler the salting exists to
    kill. Own subprocess so the UI/REST status server can be enabled."""
    import tempfile

    from frontier_engine.schedule import rank_batch
    from frontier_engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="bench-salt-ab", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    from frontier_engine.config import EngineConfig

    cfg = EngineConfig(salt_partitions=16, round_seconds=1000.0, concurrent_per_host=100)
    import atexit
    import shutil

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="bench-salt-", dir=shm)
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    path = workdir + "/frontier"
    synth_frontier(spark, n_urls).write.mode("overwrite").parquet(path)
    fr = spark.read.parquet(path)
    out = {"n": n_urls, "hot_host_share": 0.3, "salt_partitions": cfg.salt_partitions}
    _noop(rank_batch(fr, cfg, salted=True))  # warmup both code paths
    for salted in (False, True):
        group = f"salt-ab-{salted}"
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.time()
        _noop(rank_batch(fr, cfg, salted=salted))
        wall = time.time() - t0
        spark.sparkContext.setJobGroup("", "")
        key = "salted" if salted else "unsalted"
        out[key] = {
            "wall_s": round(wall, 2),
            "max_task_ms": _max_task_ms(spark, group),
        }
    print("SALT_AB_RESULT " + json.dumps(out))
    spark.stop()


def _cpu_burn(_):
    # ~1 s of pure ALU work: long enough to average over the host's CPU
    # frequency ramps (10M iterations ≈ 0.35 s measured ±30% swings on
    # an IDLE box purely from turbo/vCPU-placement transients)
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x


def _mem_burn(_):
    import numpy as np

    for _ in range(4):
        a = np.arange(4_000_000, dtype="float64")
        b = a * 2.0 + a[::-1]
        b.sum()
    return 0


def hardware_probe() -> dict:
    """Spark-free parallel-scaling ceiling of this box: pure-CPU work vs
    memory-bandwidth-bound work at 8 and 32 processes. Published with
    every bench so the scaling efficiency can be read against what the
    hardware itself allows (this VM's memory bandwidth collapses under
    parallelism; a real cluster adds bandwidth with every executor)."""
    import multiprocessing as mp

    cpu_burn, mem_burn = _cpu_burn, _mem_burn
    out = {}
    for fn, name in ((cpu_burn, "cpu"), (mem_burn, "membw")):
        # min-of-3 baseline: the single-process denominator feeds EVERY
        # eff number for this probe, so one co-tenant hiccup in a
        # single-shot run skews them all the same direction (an r5 run
        # published membw_eff_8p=0.039 from exactly this). Mins, not
        # medians — shared-host timing noise is one-sided (it only adds
        # time), so the fastest observation is the capacity estimate.
        bases = []
        for _ in range(3):
            t0 = time.time()
            fn(0)
            bases.append(time.time() - t0)
        base = min(bases)
        for procs in (8, 32):
            with mp.Pool(procs) as p:
                p.map(fn, range(procs))  # warm: forks + imports paid here
                walls = []
                for _ in range(2):
                    t0 = time.time()
                    p.map(fn, range(procs))
                    walls.append(time.time() - t0)
            out[f"{name}_eff_{procs}p"] = round(base / min(walls), 3)
    return out


def _read_steal_jiffies() -> int | None:
    """Cumulative hypervisor steal time (jiffies) — a nonzero DELTA across
    a bench run means the host took CPU away mid-run and the numbers are
    contaminated by factors outside this VM."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])  # cpu  user nice system idle iowait irq softirq STEAL
    except Exception:
        return None


def _main_child() -> None:
    """The full-cores phase (operator queries + headline schedule/parse)
    in its OWN process. Critical for reproducible scaling numbers: a
    'stopped' SparkSession's JVM lives (and GC-churns several cores —
    measured ~4.5 cores for minutes) until the Python process exits, so
    the main phase must be fully dead before any scaling child runs."""
    from frontier_engine.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32))
    # headline jobs FIRST: the operator-query sweep (2 dozen unrelated
    # plans) inflates old-gen heap and drags the staged dedupe timings
    # when it runs before them — measured 6.5 s vs 22 s for the same
    # dedupe stage depending on order/window
    sched = schedule_round(spark, FRONTIER_N)
    pages = _parse_world_pages(spark).cache()
    n_pages = pages.count()
    parse = parse_pages_bench(spark, pages, n_pages)
    # BENCH_INGEST=0 skips the ingest round for quick verify passes
    # (the full round over the replicated parse world is minutes)
    if os.environ.get("BENCH_INGEST", "1") == "1":
        ingest = ingest_round_bench(spark, SF_DIR, pages)
    else:
        ingest = None
    queries = operator_queries(spark, SF_DIR)
    queries["schedule_round_1m"] = sched["t_total"]
    queries["parse_pages"] = parse["sec"]
    if ingest is not None:
        queries["ingest_round"] = ingest["t_round"]
    print("MAIN_RESULT " + json.dumps(
        {"queries": queries, "sched": sched, "parse": parse, "ingest": ingest}
    ))
    spark.stop()


def _slim(result: dict) -> dict:
    """Slim contract twin of *result*: same metric/value/unit/queries/sf,
    headline throughputs and efficiencies, per-rep arrays and stage
    details dropped (they live in BENCH_DETAIL + BENCH/last_run.json).
    The driver's bounded stdout-tail capture truncated r3's single huge
    line from the FRONT, losing the headline — hence the slim twin."""
    scaling = result.get("scaling") or {}
    sched = result["throughput"].get("schedule_detail") or {}
    parse = result["throughput"].get("parse_detail") or {}
    ingest = result["throughput"].get("ingest_detail")
    slim_scaling = {}
    for job in ("schedule", "parse"):
        j = scaling.get(job)
        if not j:
            continue
        slim_scaling[job] = _attempt_summary(j)
    for extra in ("steal_jiffies_delta", "skipped_budget", "child_failures"):
        if extra in scaling:
            slim_scaling[extra] = scaling[extra]
    slim = dict(result)
    slim["throughput"] = {
        "schedule_urls_per_sec": sched.get("urls_per_sec"),
        "parse_pages_per_sec": parse.get("pages_per_sec"),
        "ingest_docs_per_sec": (ingest or {}).get("docs_per_sec"),
        "ingest_stages": {k: v for k, v in (ingest or {}).items() if k != "docs"},
    }
    slim["scaling"] = slim_scaling
    if not result.get("salt_ab"):
        slim.pop("salt_ab", None)
    return slim


def _sweep_stale_tmpdirs() -> None:
    """Remove bench workdirs orphaned by crashed/killed earlier runs.

    Every bench tmpdir carries a ``bench-``/``ingest-round-`` prefix and
    is rmtree'd by its owner on clean exit; a kill mid-phase leaves it
    behind on the finite shared tmpfs (observed: 11 GB of orphans after
    the r4 timeout runs). One bench runs at a time (driver contract),
    so at start-of-run anything matching the prefixes is ours and dead.
    """
    import glob
    import shutil
    import tempfile

    for root in ("/dev/shm", tempfile.gettempdir()):
        for prefix in ("bench-scale-", "bench-salt-", "bench-round-", "ingest-round-"):
            for d in glob.glob(os.path.join(root, prefix + "*")):
                shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        job = sys.argv[4] if len(sys.argv) > 4 else "schedule"
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]), job)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-server":
        job = sys.argv[4] if len(sys.argv) > 4 else "schedule"
        _scaling_server(int(sys.argv[2]), int(sys.argv[3]), job)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--main-child":
        _main_child()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--salt-ab-child":
        _salt_ab_child(int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000)
        return

    t_start = time.time()
    _sweep_stale_tmpdirs()
    # 2,100 s default: r5 runs complete their core phases in 818-1,366 s
    # (contended brackets at the high end), and the driver demonstrably
    # tolerated r3's longer protocol (5 reps × 3 child sizes incl. n32
    # at 8M URLs — well past 2,500 s). The headroom over the core
    # phases is what lets the flagged-window retry fire in CONTENDED
    # runs — run10 showed 1,800 s leaves no room exactly when the
    # windows are bad enough to need a retry (slow children eat the
    # slack). Budget still checked between phases; killed-at-any-point
    # still leaves a parseable final line.
    wall_budget = float(os.environ.get("BENCH_WALL_BUDGET_S", "2100"))

    def remaining() -> float:
        return wall_budget - (time.time() - t_start)

    do_scaling = os.environ.get("BENCH_SCALING", "1") == "1"
    steal0 = _read_steal_jiffies()
    phase_walls: dict[str, float] = {}

    def _clock(name: str, t0: float) -> None:
        phase_walls[name] = round(time.time() - t0, 1)

    # bracket the run with Spark-free hardware probes: if the box's own
    # parallel-CPU ceiling moved between them, the run hit host-level
    # contention and its efficiencies must be read against probe_pre/post
    t_ph = time.time()
    probe_pre = hardware_probe() if do_scaling else {}
    _clock("probe_pre", t_ph)
    t_ph = time.time()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--main-child"],
        capture_output=True, text=True,
        timeout=max(300, min(3000, remaining())),
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    res = None
    for line in p.stdout.splitlines():
        if line.startswith("MAIN_RESULT "):
            res = json.loads(line[len("MAIN_RESULT "):])
    _clock("main", t_ph)
    if res is None:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise RuntimeError("main-child produced no result")
    queries, sched, parse = res["queries"], res["sched"], res["parse"]
    ingest = res.get("ingest")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    scaling: dict = {}
    result = {
        "metric": "frontier-schedule+parse throughput",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "throughput": {
            "schedule_urls_per_sec": sched["urls_per_sec"],
            "parse_pages_per_sec": parse["pages_per_sec"],
            "ingest_docs_per_sec": (ingest or {}).get("docs_per_sec"),
            "schedule_detail": sched,
            "parse_detail": parse,
            "ingest_detail": ingest,
        },
        "scaling": scaling,
        "salt_ab": None,
        "wall_budget_s": wall_budget,
        "phase_walls": phase_walls,
    }

    def emit() -> None:
        # one slim contract line per completed phase — each print
        # supersedes the last, so a kill at ANY point still leaves the
        # driver a parseable final line with everything measured so far
        print(json.dumps(_slim(result)), flush=True)

    emit()

    # ---- scaling phase: paired-interleaved by default (run16+ —
    # both children warm concurrently, reps alternate in one shared
    # window); any pair failure falls back to the sequential
    # one-child-at-a-time protocol of runs 1–15 for that job
    paired_mode = os.environ.get("BENCH_PAIRED", "1") == "1"
    if do_scaling:
        scaling["hardware_ceiling_pre"] = probe_pre
        for job in ("schedule", "parse"):
            jout = scaling.setdefault(job, {})
            if paired_mode and remaining() >= 240:
                t_ph = time.time()
                r = _run_pair(job, remaining=remaining)
                _clock(f"{job}:pair", t_ph)
                if "_fail" not in r:
                    jout.update(r)
                    _scaling_eff(jout)
                    emit()
                    continue
                scaling.setdefault("child_failures", []).append(
                    {"pair": f"{job}:paired", **r})
            for cores in _scaling_cores():
                if remaining() < 120:
                    scaling.setdefault("skipped_budget", []).append(f"{job}:n{cores}")
                    continue
                n_child = _child_n_urls(job, cores, SCALING_N)
                t_ph = time.time()
                r = _run_child(job, cores, n_child, timeout_s=remaining())
                _clock(f"{job}:n{cores}", t_ph)
                if "_fail" in r:
                    if r["_fail"] == "timeout":
                        # timeout_s == remaining(): genuinely the budget
                        scaling.setdefault("skipped_budget", []).append(
                            f"{job}:n{cores}")
                    else:
                        scaling.setdefault("child_failures", []).append(
                            {"pair": f"{job}:n{cores}", **r})
                    continue
                jout[f"n{cores}"] = r
                _scaling_eff(jout)
                result["value"] = round(sum(queries.values()), 2)
                emit()

    # ---- salt A/B phase
    salt_ab = None
    t_ph = time.time()
    if os.environ.get("BENCH_SALT_AB", "1") == "1" and remaining() > 120:
        try:
            p2 = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--salt-ab-child", "4000000"],
                capture_output=True, text=True,
                timeout=max(60, min(1200, remaining())),
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in p2.stdout.splitlines():
                if line.startswith("SALT_AB_RESULT "):
                    salt_ab = json.loads(line[len("SALT_AB_RESULT "):])
        except subprocess.TimeoutExpired:
            pass
    _clock("salt_ab", t_ph)
    result["salt_ab"] = salt_ab

    # ---- retry phase: one second attempt for a scaling pair whose
    # WINDOW was flagged (steal-contended, hardware-limited, or >15%
    # probe drift between the two children). The trigger and the
    # selection are window-quality criteria ONLY — never the efficiency
    # value — and BOTH attempts are always published under `attempts`,
    # so a retry can never quietly replace a clean-window miss.
    if do_scaling:
        flagged = [j for j in ("schedule", "parse")
                   if _window_flagged(scaling.get(j) or {})]
        # worst-ranked window first: one retry per run, so it should go
        # to the pair whose measurement was most degraded (still a
        # window-quality criterion — efficiency never enters)
        flagged.sort(key=lambda j: _window_rank(scaling[j]))
        for job in flagged:
            jout = scaling.get(job) or {}
            pair_wall = (phase_walls.get(f"{job}:pair")
                         or (phase_walls.get(f"{job}:n2", 0)
                             + phase_walls.get(f"{job}:n8", 0)))
            if not pair_wall or remaining() < pair_wall * 1.2 + 60:
                continue
            t_ph = time.time()
            retry: dict = {}
            if paired_mode and jout.get("protocol") == "paired-interleaved":
                r = _run_pair(job, remaining=remaining)
                if "_fail" not in r:
                    retry = r
                else:
                    scaling.setdefault("child_failures", []).append(
                        {"pair": f"{job}:retry:paired", **r})
            else:
                for cores in _scaling_cores():
                    if remaining() < 120:
                        break
                    r = _run_child(job, cores, _child_n_urls(job, cores, SCALING_N),
                                   timeout_s=remaining())
                    if "_fail" not in r:
                        retry[f"n{cores}"] = r
                    else:
                        scaling.setdefault("child_failures", []).append(
                            {"pair": f"{job}:retry:n{cores}", **r})
            _clock(f"{job}:retry", t_ph)
            if "n2" not in retry or "n8" not in retry:
                continue
            _scaling_eff(retry)
            chosen, which = ((retry, 2)
                             if _window_rank(retry) > _window_rank(jout)
                             else (jout, 1))
            chosen = dict(chosen)
            chosen["attempts"] = [_attempt_summary(jout), _attempt_summary(retry)]
            chosen["selected_attempt"] = which
            scaling[job] = chosen
            emit()
            break  # at most one retried pair per run — bounded wall cost

    if do_scaling:
        t_ph = time.time()
        scaling["hardware_ceiling"] = hardware_probe()
        _clock("probe_post", t_ph)
        steal1 = _read_steal_jiffies()
        if steal0 is not None and steal1 is not None:
            scaling["steal_jiffies_delta"] = steal1 - steal0
        # contention-normalized efficiency: the engine's N→4N efficiency
        # read against the box's own Spark-free pure-CPU parallel ceiling
        # in the same window (mean of the bracketing probes). Across cold
        # runs this ratio is ~1.0 even when host contention moves both —
        # the engine adds no scaling loss of its own.
        ceil8 = [
            pr["cpu_eff_8p"]
            for pr in (probe_pre, scaling["hardware_ceiling"])
            if pr.get("cpu_eff_8p")
        ]
        if ceil8:
            hw8 = sum(ceil8) / len(ceil8)
            for job in ("schedule", "parse"):
                if "efficiency" in scaling.get(job, {}):
                    scaling[job]["efficiency_vs_cpu_ceiling"] = round(
                        scaling[job]["efficiency"] / hw8, 3
                    )

    # Full result: one line for logs + the whole thing on disk.
    result["wall_s"] = round(time.time() - t_start, 1)
    print("BENCH_DETAIL " + json.dumps(result))
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open(os.path.join("BENCH", "last_run.json"), "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    # The FINAL printed line is the driver contract — the slim twin.
    emit()


if __name__ == "__main__":
    main()
