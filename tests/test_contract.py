"""Driver-contract regression: every registered query runs at sf0.001,
oracles align with queries, and the entry smoke holds — the cheap local
stand-in for the driver's t1/t2 gates."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 51
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 44


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.schema == E.entry(spark).schema  # stable across calls


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_every_query_runs(spark, name):
    df = E.queries()[name](spark, SF)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
    assert len(set(df.columns)) == len(df.columns)  # no duplicate output names
