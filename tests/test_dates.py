"""M1-M3: ranged-date expansion parity with the reference's four cases
(ExploreSearch.py:96-160) + validation errors (airbnb.py:355-361)."""

from datetime import date

import pytest

from frontier_engine.dates import expand_date_ranges, parse_range_spec, split_spec, validate_dates


def test_split_spec():
    assert split_spec("2023-10-15+5-2") == ("2023-10-15", "+5-2")
    assert split_spec("2023-10-15") == ("2023-10-15", None)


def test_parse_range_spec_plusminus():
    s, e = parse_range_spec("2023-10-15", "+-3")
    assert (str(s), str(e)) == ("2023-10-12", "2023-10-18")


def test_parse_range_spec_post_pre():
    # '+5-2' = plus five days, minus two days (README range semantics)
    s, e = parse_range_spec("2023-10-15", "+5-2")
    assert (str(s), str(e)) == ("2023-10-13", "2023-10-20")


def test_validate_dates_raises():
    today = date(2026, 8, 16)
    with pytest.raises(ValueError, match="Checkin cannot be in past"):
        validate_dates("2026-08-15", "2026-09-01", today)
    with pytest.raises(ValueError, match="Checkout must be tomorrow or later"):
        validate_dates("2026-08-16", "2026-08-16", today)


def test_expand_cartesian(spark):
    combos = expand_date_ranges(spark, "2026-09-01+1-1", "2026-09-29+-1").collect()
    # 3 checkins × 3 checkouts
    assert len(combos) == 9
    cis = {r.checkin for r in combos}
    assert cis == {"2026-08-31", "2026-09-01", "2026-09-02"}


def test_expand_fixed_dates(spark):
    combos = expand_date_ranges(spark, "2026-09-01", "2026-09-29").collect()
    assert [(r.checkin, r.checkout) for r in combos] == [("2026-09-01", "2026-09-29")]
