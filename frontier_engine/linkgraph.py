"""Host-level link-graph analysis — PageRank as a frontier-priority
signal (beyond-reference, crawl-at-scale standard practice).

The reference crawls one site, so its scheduler never needs a global
importance signal. A web-scale tier-crawl does: crawl-ordering by
PageRank-family scores is the classic result (Cho, Garcia-Molina &
Page, "Efficient crawling through URL ordering", WWW 1998; Page et al.
1999). This module derives the HOST graph from the engine's own
discovery stream — every candidate row already carries
``(parent_url, url)`` — and runs a deterministic, fixed-iteration
power-iteration PageRank expressed entirely as DataFrame joins/aggs,
then folds the score into ``schedule.rank_batch``'s priority.

Scale shape (the part that must survive 100 TB):

* The graph is HOST-level, not URL-level: edges aggregate to
  ``(src_host, dst_host, weight)`` at extraction time, so a 10^11-URL
  crawl collapses to a ~10^8-host graph before any iteration starts.
* One power step = one shuffle: ``edges ⋈ ranks`` hash-partitioned on
  ``src`` + an agg on ``dst``. No cartesian, no windows, no driver
  collect of the graph — only two scalar aggregates (dangling mass,
  node count) come back per iteration, and the node count is computed
  once and reused.
* Lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` iterations — an iterative plan that re-derives
  iteration k from iteration 0 is exponential in the optimizer and
  re-executes everything on a lost stage; checkpointing keeps each
  step O(1) plans deep (persist alone does NOT bound the analyzed
  plan).  The previous iteration's blocks are released as soon as the
  next is materialized.
* Dangling mass (hosts with no out-edges) is redistributed uniformly —
  the standard stochastic-completion fix — so total rank stays 1.0 and
  scores are comparable across rounds/graphs.

``pagerank_py`` is the pure-Python twin (same fixed-point arithmetic
order) used by tests as the oracle, mirroring ``canon.py``'s
JVM-expression / Python-twin discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontier_engine.canon import host_expr

__all__ = [
    "host_edges",
    "pagerank",
    "pagerank_py",
    "apply_host_rank",
]


def host_edges(candidates: DataFrame) -> DataFrame:
    """Aggregate candidate discoveries ``(parent_url, url)`` into the
    weighted host graph ``(src, dst, weight)``.

    Self-loops (intra-host links — the overwhelming majority on any
    site) are dropped: they carry no cross-host endorsement and would
    otherwise dominate every host's out-weight. Rows with an empty
    parent (seeds) are dropped for the same reason. The output is the
    aggregated edge list — at most |hosts|² rows but in practice the
    sparse crawl graph — which is what every iteration re-reads, so
    callers should persist/write it once per scheduling epoch.
    """
    src = host_expr(F.col("parent_url")).alias("src")
    dst = host_expr(F.col("url")).alias("dst")
    return (
        candidates.where(F.coalesce(F.col("parent_url"), F.lit("")) != "")
        .select(src, dst)
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` by power iteration.

    Returns ``(host, pagerank)`` for every node that appears as a
    source or destination; ranks sum to 1.0 (dangling mass is
    redistributed uniformly each step). ``iters`` is FIXED — no
    float-compare convergence test — so results are deterministic and
    reproducible across partitionings, and a SQL/Python twin can run
    the identical recurrence.

    Per-iteration work: one hash join on ``src`` (edges ⋈ ranks), one
    agg on ``dst``, one broadcast-size scalar (dangling mass). The
    rank vector is |hosts| rows — kept distributed throughout.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")

    edges = edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    # out_w: total out-weight per source (the contribution denominator).
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    # One persisted copy of the static side; released in finally.
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    base = nodes.join(out_w, nodes.host == out_w.src, "left").select(
        "host", F.coalesce("out_w", F.lit(0.0)).alias("out_w")
    )
    base = base.localCheckpoint(eager=True)  # freeze the static side's plan
    nodes.unpersist()

    ranks = base.select("host", "out_w", F.lit(1.0 / n).alias("pagerank"))
    teleport = (1.0 - damping) / n

    try:
        for it in range(iters):
            # Mass sitting on dangling hosts (out_w == 0) — one scalar.
            dangling = (
                ranks.where(F.col("out_w") == 0.0)
                .agg(F.coalesce(F.sum("pagerank"), F.lit(0.0)))
                .first()[0]
            )
            contrib = (
                edges.join(
                    ranks.select("host", "pagerank", "out_w"),
                    edges.src == F.col("host"),
                )
                .select(
                    F.col("dst").alias("host"),
                    (F.col("pagerank") * F.col("weight") / F.col("out_w")).alias("c"),
                )
                .groupBy("host")
                .agg(F.sum("c").alias("in_mass"))
            )
            new = (
                base.join(contrib, "host", "left")
                .select(
                    "host",
                    "out_w",
                    (
                        F.lit(teleport)
                        + F.lit(damping)
                        * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dangling / n))
                    ).alias("pagerank"),
                )
            )
            if (it + 1) % checkpoint_every == 0 or it == iters - 1:
                prev = ranks
                new = new.localCheckpoint(eager=True)
                if prev is not base:
                    # Release the superseded checkpoint's blocks.
                    prev.unpersist()
            ranks = new
    finally:
        base.unpersist()
    return ranks.select("host", "pagerank")


def pagerank_py(
    edges: list[tuple[str, str, float]],
    damping: float = 0.85,
    iters: int = 10,
) -> dict[str, float]:
    """Pure-Python twin of :func:`pagerank` — same recurrence, same
    dangling handling, used as the test oracle (canon.py discipline:
    every distributed kernel has a sequential twin)."""
    out_w: dict[str, float] = {}
    nodes: set[str] = set()
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0.0) + float(w)
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    if n == 0:
        return {}
    ranks = {h: 1.0 / n for h in nodes}
    teleport = (1.0 - damping) / n
    for _ in range(iters):
        dangling = sum(r for h, r in ranks.items() if out_w.get(h, 0.0) == 0.0)
        in_mass = {h: 0.0 for h in nodes}
        for s, d, w in edges:
            in_mass[d] += ranks[s] * float(w) / out_w[s]
        ranks = {
            h: teleport + damping * (in_mass[h] + dangling / n) for h in nodes
        }
    return ranks


def apply_host_rank(
    pending: DataFrame, host_ranks: DataFrame, weight: float = 10.0
) -> DataFrame:
    """Fold the host PageRank into the frontier's priority column.

    ``priority += weight * pagerank / max(pagerank)`` — normalized to
    [0, weight] so the boost is comparable across graph sizes and sits
    below one depth step (priority = depth*100 + score, schedule.py:36):
    PageRank breaks ties WITHIN a depth level, it never overrides the
    DFO discipline. Hosts absent from the rank table get 0 boost.

    The rank table is broadcast: |hosts| ≪ |frontier| by construction
    (that is the point of the host-level graph), and a broadcast keeps
    the frontier's partitioning intact for the downstream
    ``rank_batch`` window.
    """
    mx = host_ranks.agg(F.max("pagerank")).first()[0]
    if not mx:
        return pending
    boost = F.broadcast(
        host_ranks.select(
            "host", (F.col("pagerank") * (weight / mx)).alias("_pr_boost")
        )
    )
    return (
        pending.join(boost, "host", "left")
        .withColumn(
            "priority",
            F.col("priority") + F.coalesce(F.col("_pr_boost"), F.lit(0.0)),
        )
        .drop("_pr_boost")
    )
