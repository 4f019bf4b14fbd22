"""Driver-contract guard: entry() + every queries() entry runs at
sf0.001 with a stable schema, and every oracle key has a query."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"window_start", "window_end", "codec", "n_clips", "mean_rms", "total_ms"}


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every driver query is oracle-checked (round-2: simhash got an
    # md5-derived mirror; the ANN gates inline their hyperplane/centroid
    # parameters as SQL literals)
    assert set(qs) == set(os_)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_smoke_scale(spark, name):
    df = entrymod.queries()[name](spark, SF)
    # schema resolvable + executable; row counts checked by the oracle gate
    assert df.columns
    df.limit(5).collect()
