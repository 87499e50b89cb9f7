"""Regression tests for the driver contract (__spark_entry__) at sf0.001.

The heavyweight oracle comparison lives in scripts/check_oracle.py (run at
sf0.01); here we pin that every declared query executes and returns sane,
non-degenerate output at the smoke scale, and that queries()/oracle_sql()
stay consistent.
"""

from __future__ import annotations

import pytest

import bench as _bench
import __spark_entry__ as entry


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must stay a subset of queries() — a renamed
    query would otherwise only fail at driver bench time."""
    missing = [n for n in _bench.HEADLINE if n not in entry.queries()]
    assert not missing, f"bench.py HEADLINE not in queries(): {missing}"

SF_DIR = "/root/testdata/sf0.001"

# queries whose correct sf0.001 output may legitimately be empty
# (verified non-empty at sf0.01 by scripts/check_oracle.py)
_MAY_BE_EMPTY = {
    "q_ngram_dedup_pairs",
    "q_minhash_pairs",
    "q_embedding_dups",
    "q_except_nations",
    "q07_nation_volume",  # two-nation trade is sparse at sf0.001; 14 rows at sf0.01
}


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.columns == ["r_name", "n_name", "revenue", "n_items", "rank_in_region"]


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # the SQL-expressible core must all carry oracles
    assert len(oracles) >= 20


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_runs_at_smoke_scale(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    n = df.count()
    if name not in _MAY_BE_EMPTY:
        assert n > 0, f"{name} returned no rows"
    assert len(df.columns) > 0
