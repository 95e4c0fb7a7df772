"""robots.txt rules: parse + filter (SURVEY §2.1 S5, §2.3 F11).

The reference enables framework robots enforcement
(``ROBOTSTXT_OBEY = True``, /root/reference/deepbnb/settings.py.dist:45);
its actual enforcement layer is Scrapy 2.6.3's default Protego parser
(/root/reference/requirements.txt:2), whose semantics are RFC 9309:

* ``*`` in a rule path matches any character run; a trailing ``$``
  anchors the end of the path.
* The rule that decides a URL is the MATCHING rule with the longest
  raw pattern (octet length, wildcards counted); on a length tie,
  Allow beats Disallow.
* User-agent groups: the group whose agent token is the longest
  case-insensitive substring of the crawler's UA wins; ``*`` is the
  fallback (score 1). Multiple groups with the same agent token merge.
* No matching rule → allowed. Empty Allow/Disallow values are inert.

The engine expresses enforcement as a per-host rules DIMENSION table —
tiny (one row per host), so it broadcast-joins to the frontier. Rule
patterns are compiled to anchored Java regexes and precedence-sorted
*inside Catalyst expressions* (escape → ``*``→``.*`` → trailing ``$``
anchor; sort by (-len, allow-first)), so the per-URL filter is a pure
JVM first-match over a broadcast array — never a shuffle, never Python.

Known simplification vs Protego: no percent-encoding normalization of
pattern/path octets (fixtures and the crawl universe are ASCII-clean).

Rules table schema: (host, rules array<struct<pattern,allow>>,
disallow_prefixes array<string>, allow_prefixes array<string>,
crawl_delay_s double, max_concurrency int). The two prefix arrays are
the legacy projection (raw patterns split by verdict) kept for
compatibility; ``split_allowed`` accepts tables with either shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frontier_engine.config import EngineConfig

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pattern", T.StringType()),
                        T.StructField("allow", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
        T.StructField("max_concurrency", T.IntegerType()),
    ]
)


# --------------------------------------------------------------------------
# Parsing (driver/dimension side — robots bodies are a per-host dimension)
# --------------------------------------------------------------------------

def parse_robots_groups(text: str) -> list[dict]:
    """Split one robots.txt body into UA groups.

    Returns ``[{agents: [str], rules: [(pattern, allow)], crawl_delay}]``.
    Consecutive ``User-agent`` lines share a group (RFC 9309 §2.1); a
    ``User-agent`` line after rule lines starts a new group. Agent
    tokens are lowercased. Groups are NOT merged here — ``select_group``
    merges same-token groups, mirroring Protego's per-UA rule sets.
    """
    groups: list[dict] = []
    cur: dict | None = None
    after_rules = True  # a UA line when True starts a fresh group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if after_rules or cur is None:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                after_rules = False
            cur["agents"].append(val.lower())
        elif cur is not None and key in ("allow", "disallow"):
            after_rules = True
            if val:  # empty value is inert (RFC: empty Disallow allows all)
                cur["rules"].append((val, key == "allow"))
        elif cur is not None and key == "crawl-delay":
            after_rules = True
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass
    return groups


def _agent_score(agent: str, user_agent: str) -> int:
    """Protego's RuleSet.applies_to: '*' scores 1; a token that is a
    case-insensitive substring of the crawler UA scores its length."""
    if agent == "*":
        return 1
    if agent in user_agent.lower():
        return len(agent)
    return 0


def select_group(groups: list[dict], user_agent: str) -> dict | None:
    """Pick (and merge) the groups whose agent token best matches *user_agent*.

    Longest-substring-match wins; ``*`` is the score-1 fallback. All
    groups containing the winning token merge (Protego keys rule sets by
    agent string, so repeated groups for one agent concatenate)."""
    best_agent, best_score = None, 0
    for g in groups:
        for a in g["agents"]:
            s = _agent_score(a, user_agent)
            if s > best_score:
                best_agent, best_score = a, s
    if best_agent is None:
        return None
    merged = {"rules": [], "crawl_delay": None}
    for g in groups:
        if best_agent in g["agents"]:
            merged["rules"].extend(g["rules"])
            if g["crawl_delay"] is not None:
                merged["crawl_delay"] = g["crawl_delay"]
    return merged


def parse_robots_txt(
    text: str,
    default_delay: float,
    default_conc: int,
    user_agent: str = "*",
) -> dict:
    """Parse one robots.txt body for *user_agent*. Returns a rules dict
    matching RULES_SCHEMA (minus host)."""
    grp = select_group(parse_robots_groups(text), user_agent)
    rules = grp["rules"] if grp else []
    delay = grp["crawl_delay"] if grp else None
    return {
        "rules": [{"pattern": p, "allow": a} for p, a in rules],
        "disallow_prefixes": [p for p, a in rules if not a],
        "allow_prefixes": [p for p, a in rules if a],
        "crawl_delay_s": delay if delay is not None else default_delay,
        "max_concurrency": default_conc,
    }


def match_path(rules: list[tuple[str, bool]], path: str) -> bool:
    """Pure-Python twin of the Spark verdict: True = allowed.

    Longest-raw-pattern match wins; tie → Allow. ``*`` = any run,
    trailing ``$`` = end anchor. Used by the simulator and as the
    oracle in property tests."""
    import re as _re

    best: tuple[int, int] | None = None  # (len, allow_rank) of winner
    verdict = True
    for pattern, allow in rules:
        if not pattern:
            continue
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "^" + ".*".join(_re.escape(seg) for seg in body.split("*"))
        if anchored:
            rx += "$"
        if _re.search(rx, path) is None:
            continue
        key = (-len(pattern), 0 if allow else 1)
        if best is None or key < best:
            best, verdict = key, allow
    return verdict


def rules_from_pages(pages: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Build the rules table by parsing every ``*/robots.txt`` page in the
    stored-pages table (the framework's pre-fetch, replayed from storage).
    Hosts with no robots page get defaults (allow all)."""
    robots_pages = pages.where(F.col("url").endswith("/robots.txt")).select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"), "text"
    )
    ua = cfg.user_agent

    def parse_batch(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for host, text in zip(pdf["host"], pdf["text"]):
                d = parse_robots_txt(text, cfg.download_delay_s, cfg.concurrent_per_host, ua)
                d["host"] = host
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in RULES_SCHEMA.fields])

    return robots_pages.mapInPandas(parse_batch, RULES_SCHEMA)


# --------------------------------------------------------------------------
# Matching (JVM side — compiled rules broadcast to the frontier)
# --------------------------------------------------------------------------

def _pattern_regex(p: Column) -> Column:
    """Robots pattern → anchored Java regex, entirely in Catalyst exprs:
    escape regex specials, un-escape ``*`` to ``.*``, honor a trailing
    raw ``$`` as an end anchor."""
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, 1, F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([\\^$.|?*+()\[\]{}])", r"\\$1")
    wild = F.regexp_replace(esc, r"\\\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def _compiled_rule_structs(patterns: Column, allow: bool) -> Column:
    # sort_array orders by fields left→right: longest pattern first,
    # Allow before Disallow on ties — RFC 9309 precedence as a sort key.
    #
    # kind classifies the match strategy: real robots files are mostly
    # wildcard-free, and Spark's RLike caches only the LAST compiled
    # pattern per expression instance — per-element regex evaluation
    # would Pattern.compile on every element of every frontier row. So
    # plain prefixes (kind 0) match via startswith and '$'-anchored
    # literals (kind 1) via equality — pure string ops — and only rules
    # actually containing '*' (kind 2) touch the regex engine.
    def kind_of(p: Column) -> Column:
        has_star = p.contains("*")
        anchored = p.endswith("$")
        return (
            F.when(has_star, F.lit(2))
            .when(anchored, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
        )

    def body_of(p: Column) -> Column:
        # the literal to prefix-match (kind 0) or equality-match (kind 1)
        return F.when(p.endswith("$") & ~p.contains("*"),
                      F.substring(p, 1, F.length(p) - 1)).otherwise(p)

    return F.transform(
        patterns,
        lambda p: F.struct(
            (-F.length(p)).alias("neg_len"),
            F.lit(0 if allow else 1).alias("allow_rank"),
            kind_of(p).alias("kind"),
            body_of(p).alias("body"),
            _pattern_regex(p).alias("regex"),
            F.lit(allow).alias("allow"),
        ),
    )


def compile_rules(rules: DataFrame) -> DataFrame:
    """Add ``__rules``: precedence-sorted array<struct<..., regex, allow>>.

    Prefers the ``rules`` struct column (full parser output); falls back
    to the legacy prefix arrays (which, compiled, reproduce plain
    startswith semantics exactly — a wildcard-free pattern's regex is an
    anchored literal prefix)."""
    if "rules" in rules.columns:
        dis = F.filter(F.col("rules"), lambda r: ~r["allow"]).getField("pattern")
        al = F.filter(F.col("rules"), lambda r: r["allow"]).getField("pattern")
    else:
        dis = F.coalesce(F.col("disallow_prefixes"), F.array())
        al = F.coalesce(F.col("allow_prefixes"), F.array())
    compiled = F.sort_array(
        F.concat(_compiled_rule_structs(dis, False), _compiled_rule_structs(al, True))
    )
    return rules.withColumn("__rules", compiled)


def _path_of(url_col):
    """Match target: path plus '?query' when present (RFC 9309 matches on
    the path-and-query; wildcard rules routinely span the '?')."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    q = F.parse_url(url_col, F.lit("QUERY"))
    return F.when(q.isNotNull(), F.concat(path, F.lit("?"), q)).otherwise(path)


def split_allowed(candidates: DataFrame, rules: DataFrame, cfg: EngineConfig) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) partition of *candidates* by robots rules.

    Broadcast left join on host (rules is per-host — always tiny relative
    to the frontier); verdict = allow-flag of the first matching compiled
    regex in precedence order (longest pattern, Allow on ties), default
    allowed. Pure JVM expression over the broadcast arrays."""
    if not cfg.robots_obey:
        return candidates, candidates.limit(0)
    joined = candidates.join(F.broadcast(compile_rules(rules)), "host", "left")
    # materialize the match target once — HOF lambdas re-evaluate free
    # expressions per element, a real cost at frontier scale
    joined = joined.withColumn("__path", _path_of(F.col("url")))
    path = F.col("__path")
    hits = F.filter(
        F.coalesce(F.col("__rules"), F.array().cast(
            "array<struct<neg_len:int,allow_rank:int,kind:int,body:string,"
            "regex:string,allow:boolean>>")),
        lambda r: F.when(r["kind"] == 0, path.startswith(r["body"]))
        .when(r["kind"] == 1, path == r["body"])
        .otherwise(F.regexp_like(path, r["regex"])),
    )
    is_blocked = ~F.coalesce(F.try_element_at(hits, F.lit(1))["allow"], F.lit(True))
    rule_cols = [c for c in ("rules", "disallow_prefixes", "allow_prefixes", "max_concurrency")
                 if c in joined.columns] + ["__rules", "__path"]
    allowed = joined.where(~is_blocked).drop(*rule_cols)
    blocked = joined.where(is_blocked).drop(*rule_cols)
    return allowed, blocked
