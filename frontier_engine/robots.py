"""robots.txt rules: parse + filter (SURVEY §2.1 S5, §2.3 F11).

The reference enables framework robots enforcement
(``ROBOTSTXT_OBEY = True``, /root/reference/deepbnb/settings.py.dist:45):
before any request to a host, robots.txt is fetched and disallowed URLs
are dropped. The engine expresses this as a per-host rules DIMENSION
table — tiny (one row per host), so it broadcast-joins to the frontier
and the prefix test is a higher-order-function filter, never a shuffle.

Rules table schema: (host, disallow_prefixes array<string>,
allow_prefixes array<string>, crawl_delay_s double, max_concurrency int).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frontier_engine.config import EngineConfig

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
        T.StructField("max_concurrency", T.IntegerType()),
    ]
)


def parse_robots_txt(text: str, default_delay: float, default_conc: int) -> dict:
    """Parse one robots.txt body (User-agent: * group only — the reference's
    framework matches its UA against * here). Returns a rules dict."""
    disallow, allow, delay = [], [], None
    active = False
    for line in (text or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key == "disallow" and val:
            disallow.append(val)
        elif active and key == "allow" and val:
            allow.append(val)
        elif active and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return {
        "disallow_prefixes": disallow,
        "allow_prefixes": allow,
        "crawl_delay_s": delay if delay is not None else default_delay,
        "max_concurrency": default_conc,
    }


def rules_from_pages(pages: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Build the rules table by parsing every ``*/robots.txt`` page in the
    stored-pages table (the framework's pre-fetch, replayed from storage).
    Hosts with no robots page get defaults (allow all)."""
    robots_pages = pages.where(F.col("url").endswith("/robots.txt")).select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"), "text"
    )

    def parse_batch(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for host, text in zip(pdf["host"], pdf["text"]):
                d = parse_robots_txt(text, cfg.download_delay_s, cfg.concurrent_per_host)
                d["host"] = host
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in RULES_SCHEMA.fields])

    return robots_pages.mapInPandas(parse_batch, RULES_SCHEMA)


def _path_of(url_col):
    return F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))


def split_allowed(candidates: DataFrame, rules: DataFrame, cfg: EngineConfig) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) partition of *candidates* by robots rules.

    Broadcast left join on host (rules is per-host — always tiny relative
    to the frontier) + prefix-match HOFs. Standard robots precedence:
    an Allow prefix overrides a Disallow prefix.
    """
    if not cfg.robots_obey:
        return candidates, candidates.limit(0)
    joined = candidates.join(F.broadcast(rules), "host", "left")
    path = _path_of(F.col("url"))
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()), lambda p: path.startswith(p)
    )
    allowed_override = F.exists(
        F.coalesce(F.col("allow_prefixes"), F.array()), lambda p: path.startswith(p)
    )
    is_blocked = disallowed & ~allowed_override
    rule_cols = ["disallow_prefixes", "allow_prefixes", "max_concurrency"]
    allowed = joined.where(~is_blocked).drop(*rule_cols)
    blocked = joined.where(is_blocked).drop(*rule_cols)
    return allowed, blocked
