"""Driver-contract surface invariants (COVERAGE.md's consolidation
discipline): the correctness sweep records at most 50 rows, so the
queries() dict must stay at ≤50 entries with every oracle key matched —
new operators join an existing consolidated row (method/medium/mode
tag) instead of silently falling off the recorded sweep."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as E


def test_queries_within_sweep_cap():
    q = E.queries()
    assert len(q) <= 50, "driver records only 50 rows — consolidate, don't append"
    assert all(callable(f) for f in q.values())


def test_oracle_keys_match_queries_exactly():
    q, o = set(E.queries()), set(E.oracle_sql())
    assert q - o == set(), f"queries missing oracles: {sorted(q - o)}"
    assert o - q == set(), f"oracles without queries: {sorted(o - q)}"


def test_oracle_sql_strings_nonempty():
    assert all(isinstance(s, str) and s.strip() for s in E.oracle_sql().values())
