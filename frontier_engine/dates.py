"""Ranged-date search expansion (SURVEY §2.9 M1-M5;
/root/reference/deepbnb/api/ExploreSearch.py:96-160).

The reference parses ``+A-B`` / ``+-N`` range specs and loops a cartesian
product of checkin×checkout dates, yielding one search request per combo.
The engine materializes the combos as ROWS: ``sequence(start, end,
interval 1 day)`` + explode, crossJoin for the both-ranged case — the
UDTF-free Spark form (SURVEY U4).
"""

from __future__ import annotations

import re
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_range_spec(iso_date: str, range_spec: str | None) -> tuple[date, date]:
    """(start, end) dates for a spec — mirrors _build_date_range
    (ExploreSearch.py:145-160): '+-N' → base±N; '+A-B' → [base-B, base+A].
    No spec → [base, base]."""
    base = date.fromisoformat(iso_date)
    if not range_spec:
        return base, base
    if range_spec.startswith("+-"):
        days = int(re.match(r"\+-(\d+)", range_spec).group(1))
        return base - timedelta(days=days), base + timedelta(days=days)
    m = re.match(r"\+(\d+)-(\d+)", range_spec)
    post, pre = int(m.group(1)), int(m.group(2))
    return base - timedelta(days=pre), base + timedelta(days=post)


def split_spec(value: str) -> tuple[str, str | None]:
    """'2023-10-15+5-2' → ('2023-10-15', '+5-2') (airbnb.py:344-353)."""
    pos = value.find("+")
    return (value, None) if pos == -1 else (value[:pos], value[pos:])


def validate_dates(checkin: str, checkout: str, today: date) -> None:
    """airbnb.py:355-361 — raises ValueError exactly like the reference."""
    if date.fromisoformat(checkin) < today:
        raise ValueError("Checkin cannot be in past: {}".format(checkin))
    if date.fromisoformat(checkout) < today + timedelta(days=1):
        raise ValueError("Checkout must be tomorrow or later: {}".format(checkout))


def expand_date_ranges(
    spark: SparkSession, checkin: str, checkout: str
) -> DataFrame:
    """All (checkin, checkout) combos as rows — the four cases of
    perform_checkin_start_requests (ExploreSearch.py:114-143) collapse
    into one sequence×sequence crossJoin."""
    ci, ci_spec = split_spec(checkin)
    co, co_spec = split_spec(checkout)
    ci_start, ci_end = parse_range_spec(ci, ci_spec)
    co_start, co_end = parse_range_spec(co, co_spec)

    def seq_df(name: str, start: date, end: date) -> DataFrame:
        return spark.range(1).select(
            F.explode(
                F.sequence(
                    F.lit(str(start)).cast("date"),
                    F.lit(str(end)).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias(name)
        )

    return (
        seq_df("checkin", ci_start, ci_end)
        .crossJoin(seq_df("checkout", co_start, co_end))
        .select(
            F.col("checkin").cast("string").alias("checkin"),
            F.col("checkout").cast("string").alias("checkout"),
        )
    )
