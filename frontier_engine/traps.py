"""Crawl-trap / URL-explosion guards (r5).

A 10^10-URL frontier meets URL families the reference (a single-site,
bounded-API crawler) never sees: calendar traps, session-id explosions,
infinite pagination — one host emitting an unbounded family of URLs
that differ only in a parameter. The standard web-scale defenses
(Heritrix's pathological-path and too-many-segments rules; IRLbot's
budget-per-branch discipline, Lee et al. 2009 "IRLbot: Scaling to 6
Billion Pages and Beyond"; BUbiNG's per-host budgets) are admission
CAPS, not blocklists: a URL family is admitted up to a budget in
priority order, so organic parameterized families (e.g. ``/listing/D``)
pass untouched while a 10^7-URL calendar family is cut at the cap.

Spark-first shapes:

* :func:`url_template` — the family key: scheme+host stripped, long hex
  runs → ``H``, digit runs → ``D``, query values → ``=V``. A chain of
  four JVM ``regexp_replace`` calls (whole-stage codegen, no Python);
  the identical chain is ANSI-SQL-expressible, which is what makes the
  cap oracle-checkable in DuckDB.
* :func:`path_trap_flags` — Heritrix-style structural guards: path
  depth cap and the consecutive-repeated-segment rule
  (``(/[^/]+)\\1{k,}`` — Java regex backreference; pytest-pinned, not
  oracle-checked: DuckDB's RE2 has no backreferences).
* :func:`cap_per_template` — admit at most *cap* URLs per
  (host, template) in a deterministic priority order, two-phase salted
  (the ``schedule.rank_batch`` discipline): phase 1 ranks within
  (host, template, salt) so a 10^7-URL trap family spreads over
  ``n_salts`` tasks and never lands in one window partition; phase 2
  re-ranks the ≤ n_salts × cap survivors. The admitted set is exactly
  the global per-family top-*cap* (the true top-cap of a family is a
  subset of the union of its per-salt top-caps).
* :func:`template_report` — per-family (n_urls, n_admitted, n_blocked)
  from ONE map-side-combined count agg; the monitoring face (what a
  crawl operator alerts on). Keys are (host, template) strings — the
  template is a short bounded shape key (unlike n-gram text, which
  ships as hashes elsewhere), so fixed-width hashing buys nothing here.

The reference has no analog (cited for the contrast, not ported from:
its frontier is Scrapy's in-process queue, /root/reference/deepbnb/
airbnb.py:149-175, bounded by DEPTH_LIMIT alone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme://authority prefix (what url_template strips before shaping)
_AUTHORITY_RE = r"^[a-z][a-z0-9+.\-]*://[^/?#]*"


def url_template(url: Column) -> Column:
    """Shape key of *url*'s path+query: hex runs (>=8, uuid/session ids)
    -> ``H``, digit runs -> ``D``, query values -> ``=V``. Hex collapses
    before digits so an 8+-char hex run becomes one ``H``, not a D/text
    alternation. Fragments shape like query tails (URLs carrying them
    are already canonicalized away upstream, canon.canonicalize)."""
    pq = F.regexp_replace(url, _AUTHORITY_RE, "")
    t = F.regexp_replace(pq, r"[0-9a-fA-F]{8,}", "H")
    t = F.regexp_replace(t, r"[0-9]+", "D")
    return F.regexp_replace(t, r"=[^&#]*", "=V")


def path_trap_flags(
    url: Column, max_segments: int = 16, max_repeats: int = 3
) -> Column:
    """struct<too_deep, repeated_path>: structural trap signals on the
    PATH only (query excluded). ``repeated_path`` is Heritrix's
    pathological-path rule — the same segment *max_repeats*+ times in a
    row (``/a/b/b/b`` at the default 3). Pure JVM; the backreference
    keeps it out of the DuckDB oracle (RE2), pytest pins it instead."""
    if max_repeats < 2:
        raise ValueError("max_repeats must be >= 2")
    path = F.regexp_replace(F.regexp_replace(url, _AUTHORITY_RE, ""), r"[?#].*$", "")
    n_seg = F.size(F.split(path, "/")) - 1
    repeated = F.regexp_like(
        path, F.lit(r"(/[^/]+)\1{" + str(max_repeats - 1) + r",}")
    )
    return F.struct(
        (n_seg > F.lit(max_segments)).alias("too_deep"),
        repeated.alias("repeated_path"),
    )


def split_path_traps(
    candidates: DataFrame,
    url_col: str = "url",
    max_segments: int = 16,
    max_repeats: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """(clean, trapped) split by :func:`path_trap_flags` — a pure
    narrow filter, no shuffle."""
    flags = path_trap_flags(F.col(url_col), max_segments, max_repeats)
    trapped = flags["too_deep"] | flags["repeated_path"]
    return candidates.where(~trapped), candidates.where(trapped)


def cap_per_template(
    candidates: DataFrame,
    cap: int,
    order_cols: list[str],
    url_col: str = "url",
    host_col: str = "host",
    n_salts: int = 8,
) -> DataFrame:
    """Admit at most *cap* URLs per (host, url_template) family, keeping
    the lowest (*order_cols*, url) — deterministic; *url_col* breaks
    ties. Returns *candidates* filtered (original columns preserved).

    Skew shape: the whole point is that ONE family may hold 10^7 rows,
    so a naive window over (host, template) is a single-task straggler
    by construction. Phase 1 pre-cuts within (host, template, salt) —
    ``salt = pmod(xxhash64(url), n_salts)`` — bounding every phase-2
    partition at n_salts × cap rows regardless of family size."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    tpl = "__tpl"
    df = candidates.withColumn(tpl, url_template(F.col(url_col)))
    order = [F.col(c) for c in order_cols] + [F.col(url_col)]
    if n_salts > 1:
        w1 = Window.partitionBy(host_col, tpl, "__salt").orderBy(*order)
        df = (
            df.withColumn("__salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts)))
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= cap)
            .drop("__r1", "__salt")
        )
    w2 = Window.partitionBy(host_col, tpl).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= cap)
        .drop("__rn", tpl)
    )


def template_report(
    candidates: DataFrame,
    cap: int,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-family admission report: (host, template, n_urls, n_admitted,
    n_blocked). One count agg (map-side combined); what
    :func:`cap_per_template` admits/blocks without running it."""
    return (
        candidates.withColumn("template", url_template(F.col(url_col)))
        .groupBy(host_col, "template")
        .agg(F.count("*").cast("long").alias("n_urls"))
        .select(
            host_col,
            "template",
            "n_urls",
            F.least(F.col("n_urls"), F.lit(cap)).cast("long").alias("n_admitted"),
            F.greatest(F.col("n_urls") - F.lit(cap), F.lit(0)).cast("long").alias("n_blocked"),
        )
    )
