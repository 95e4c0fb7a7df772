"""Per-round scheduling: priority ranking + politeness budgets
(SURVEY §2.7 O1-O5 — the crawl-ordering core).

The reference relies on its framework scheduler: a priority queue where
equal priorities pop LIFO (depth-first order), bounded per host by
``DOWNLOAD_DELAY``/``CONCURRENT_REQUESTS_PER_DOMAIN``
(/root/reference/deepbnb/settings.py.dist:57-59). The reference never sets
an explicit priority (fan-out sites airbnb.py:109-112,147,163,175) ⇒ pure
DFO by discovery order. The engine makes that discipline explicit and
deterministic:

    priority = depth * 100 + listing_score          (deeper-first == DFO)
    order    = (priority DESC, discovered_seq DESC) (LIFO tie-break)
    batch    = top host_budget(crawl_delay, conc) per host

Skew (north rule X13): a hot host holding 40% of the frontier would make
one window-partition task the straggler. The ranking is therefore
two-phase: (1) rank within (host, salt) — ``salt = pmod(url_hash,
n_salts)`` spreads the hot host over n_salts tasks — keep the per-salt
top ``budget`` (a salt can contribute at most the whole budget); (2)
re-rank the ≤ n_salts × budget survivors per host. Phase 2 sees a
bounded, tiny row count per host regardless of frontier size, so the
final window is no longer skew-bound. Results are IDENTICAL to a naive
single window (phase 1 never drops a row the global top-k needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frontier_engine.config import EngineConfig


def priority_expr(depth: Column, listing_score: Column) -> Column:
    """f(depth, listing_score) per the north-star: deeper-first (DFO) with
    score as the within-depth preference."""
    return (depth.cast("double") * 100.0 + F.coalesce(listing_score, F.lit(0.0))).alias(
        "priority"
    )


def host_budget_col(cfg: EngineConfig) -> Column:
    """Vectorized twin of EngineConfig.host_budget over the joined
    crawl_delay_s / max_concurrency columns."""
    delay = F.coalesce(F.col("crawl_delay_s"), F.lit(cfg.download_delay_s))
    conc = F.coalesce(F.col("max_concurrency"), F.lit(cfg.concurrent_per_host))
    per_round = F.floor(F.lit(cfg.round_seconds) / delay)
    return F.greatest(F.lit(1), F.least(per_round, conc.cast("long"))).alias("host_budget")


def rank_batch(pending: DataFrame, cfg: EngineConfig, salted: bool = True) -> DataFrame:
    """Top-``host_budget`` pending URLs per host by (priority DESC,
    discovered_seq DESC). Input must carry: host, url, priority,
    discovered_seq, crawl_delay_s (nullable). Output adds ``rank``.
    """
    order = [F.desc("priority"), F.desc("discovered_seq")]
    budget = host_budget_col(cfg)
    df = pending.withColumn("host_budget", budget)

    if salted and cfg.salt_partitions > 1:
        # phase 1: per-(host, salt) pre-top-k — kills the hot-host straggler
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_partitions))
        w1 = Window.partitionBy("host", "salt").orderBy(*order)
        df = (
            df.withColumn("salt", salt)
            .withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= F.col("host_budget"))
            .drop("_r1", "salt")
        )

    # phase 2: exact per-host rank over the bounded survivors
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= F.col("host_budget"))
        .drop("host_budget")
    )


def assign_discovered_seq(
    candidates: DataFrame, seq_offset: int, n_parts: int | None = None
) -> DataFrame:
    """Deterministic global discovery sequence for a round's new candidates.

    Within a round, candidates are ordered by (depth, parent_url, url) —
    a stable, partition-independent total order (the triple is unique per
    row: canon-dedupe keeps one row per canon_url and equal urls share a
    canon) — and numbered from ``seq_offset``. Across rounds the offset
    grows monotonically, so (priority DESC, discovered_seq DESC) pops
    newest-round-first: the deterministic restatement of the framework's
    LIFO/DFO (SURVEY §7 "Deterministic ordering parity"). The simulator
    implements the identical rule, making round batches byte-comparable.

    Scale shape (VERDICT round-1 item #5 — no single-task global sort):
    global rank = range-partition on the key + sort within partitions +
    per-partition offset. ``monotonically_increasing_id`` encodes
    (partition_id << 33) + local position in iteration (= sorted) order,
    so rank falls out of pure JVM expressions; the only extra job is a
    map-side-aggregated per-partition count (``n_parts`` rows to the
    driver). A 10^7-candidate round runs as ``n_parts`` parallel sorts.

    RETENTION COST (ADVICE r3): this convenience wrapper eagerly
    ``localCheckpoint``s the result — the offsets were computed against
    the PERSISTED range partitioning, and a recompute after unpersist
    could re-sample different RangePartitioner boundaries (seeded by rdd
    id) and shift every seq. The checkpointed blocks stay resident in
    executor storage until the returned DataFrame is garbage-collected
    (callers get no release handle), and the truncated lineage is
    unrecoverable on executor loss. Fine for one-shot callers; ANY loop
    or long-lived caller must use :func:`assign_discovered_seq_counted`
    instead (as the crawler does), which returns the persisted handle so
    the caller controls exactly when storage is released — no
    checkpoint, no pinned blocks.
    """
    out, _n, handle = assign_discovered_seq_counted(candidates, seq_offset, n_parts)
    out = out.localCheckpoint(eager=True)
    handle.unpersist()
    return out


def assign_discovered_seq_counted(
    candidates: DataFrame, seq_offset: int, n_parts: int | None = None
) -> tuple[DataFrame, int, DataFrame]:
    """assign_discovered_seq + the round's candidate count for free (the
    per-partition count job already totals it — saves the crawler a
    separate count pass).

    Returns ``(out, total, persisted_handle)``. The THIRD element is the
    actually-persisted DataFrame: derived frames (withColumn/drop plans)
    do NOT uncache it — Spark's uncacheQuery matches the exact cached
    plan — so the caller must call ``handle.unpersist()`` once the
    round's outputs are materialized (ADVICE r2: the crawler's
    ``unseen.unpersist()`` was a silent no-op, leaking one cached frame
    per round)."""
    keys = ["depth", "parent_url", "url"]
    spark = candidates.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    ranged = (
        candidates.repartitionByRange(n_parts, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    # persist: the counts job and the consumer must see ONE partitioning
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy(
            F.shiftright(F.col("_mid"), 33).alias("_pid")
        ).agg(F.count("*").alias("cnt")).collect()
    }
    total = int(sum(counts.values()))
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        kv = []
        for pid, off in offsets.items():
            kv += [F.lit(int(pid)), F.lit(int(off))]
        # try_element_at: ANSI mode makes plain element_at throw on a
        # missing key; every pid is present, but don't couple to that
        off_expr = F.coalesce(
            F.try_element_at(F.create_map(*kv), F.shiftright(F.col("_mid"), 33).cast("int")),
            F.lit(0),
        ).cast("long")
    else:
        off_expr = F.lit(0).cast("long")
    out = ranged.withColumn(
        "discovered_seq",
        (
            F.lit(seq_offset).cast("long")
            + off_expr
            + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
            + F.lit(1)
        ),
    ).drop("_mid")
    return out, total, ranged
