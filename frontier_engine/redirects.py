"""HTTP redirect-chain resolution — canonicalize 3xx chains BEFORE the
seen-set, so `/a → /b → /c` costs one frontier slot, not three.

The reference never faces redirects (its JSON API answers 200 or 403 —
deepbnb/spiders/airbnb.py:125-127 handles only the 403 errback), but a
general crawl over Common-Crawl-style pages must fold every URL through
its redirect chain before dedup/scheduling: treating each hop as a
distinct page triple-counts the document, splits its link-graph mass,
and re-fetches chains on every recrawl. Wget/Heritrix/BUbiNG all
resolve chains eagerly; this module does it as a *distributed* batch
op over a `(src_url, dst_url)` redirect-edge table (one row per
observed 301/302/303/307/308 Location, e.g. harvested from WARC
response records).

Algorithm: pointer doubling (path halving) — the classic
O(log max_chain) formulation. Round r composes the current mapping
with itself, so a non-terminal row has followed exactly ``2^r`` hops;
chains up to ``max_hops`` resolve in ``log2(max_hops)`` self-joins
(16-hop chains → 4 rounds — browsers cap around 20 redirects, Scrapy's
REDIRECT_MAX_TIMES is 20). Each round is ONE equi-join of the state
with itself on the url string (hash join; the redirect map is
functional — one Location per source — so no key explodes), followed by
an eager ``localCheckpoint`` to truncate lineage, exactly the
``components.connected_components`` discipline. Loops (self-redirects,
A↔B pairs — both common in the wild) never reach a terminal: they are
reported with ``resolved = false`` and the node sitting ``max_hops``
steps down the chain, giving callers a deterministic, cycle-safe
contract a naive WHILE loop would spin on.

Scale shape: state is one fixed-width row per distinct source URL and
never grows; every round shrinks the *live* (non-terminal) subset. No
collect, no SinglePartition, no cartesian — plan-guarded in
tests/test_redirects.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    max_hops: int = 16,
) -> DataFrame:
    """Follow redirect edges from every source URL to its final target.

    Input: ``edges`` with string columns ``src`` / ``dst`` (one row per
    observed redirect; exact duplicates tolerated; conflicting targets
    for one source — e.g. a flapping host observed twice — are resolved
    deterministically to ``min(dst)``, the same rule the SQL twin
    applies). Output: one row per distinct source URL with

    * ``url``      — the source,
    * ``out_url``  — the URL after following the chain,
    * ``n_hops``   — edges followed (exact when resolved),
    * ``resolved`` — true iff a terminal URL (no outgoing redirect) was
      reached within ``max_hops`` hops; false means the chain is longer
      than ``max_hops`` or cyclic, and ``out_url`` is the node exactly
      ``max_hops`` steps in (deterministic even for cycles).

    ``max_hops`` must be a power of two (it is realized as
    ``log2(max_hops)`` doubling rounds).
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    rounds = max_hops.bit_length() - 1

    # functional redirect map: one row per source, min(dst) on conflict
    state = (
        edges.select(F.col(src).alias("url"), F.col(dst).alias("cur"))
        .groupBy("url")
        .agg(F.min("cur").alias("cur"))
        .select(
            "url",
            "cur",
            F.lit(1).cast("long").alias("n_hops"),
            F.lit(False).alias("done"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        live = state.where(~F.col("done"))
        settled = state.where(F.col("done"))
        hop = state.select(
            F.col("url").alias("_m_url"),
            F.col("cur").alias("_m_cur"),
            F.col("n_hops").alias("_m_hops"),
            F.col("done").alias("_m_done"),
        )
        # cur with no mapping row ⇒ no outgoing redirect ⇒ terminal now
        stepped = live.join(hop, live["cur"] == hop["_m_url"], "left").select(
            "url",
            F.coalesce("_m_cur", "cur").alias("cur"),
            (F.col("n_hops") + F.coalesce("_m_hops", F.lit(0))).alias("n_hops"),
            F.when(F.col("_m_url").isNull(), F.lit(True))
            .otherwise(F.col("_m_done"))
            .alias("done"),
        )
        new_state = settled.unionByName(stepped).localCheckpoint(eager=True)
        state.unpersist()
        state = new_state

    # final terminal check: a chain of exactly max_hops ends on a node
    # whose lack of an outgoing edge the loop never got to test
    out = (
        state.join(
            state.select(F.col("url").alias("_t_url")),
            state["cur"] == F.col("_t_url"),
            "left",
        )
        .select(
            "url",
            F.col("cur").alias("out_url"),
            "n_hops",
            (F.col("done") | F.col("_t_url").isNull()).alias("resolved"),
        )
        .localCheckpoint(eager=True)
    )
    state.unpersist()
    return out
