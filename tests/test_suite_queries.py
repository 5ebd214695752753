"""Smoke: every suite query runs at sf0.001 with a stable schema and the
entry() contract holds. (Full value-level oracle comparison runs via
tools/check_oracle.py — see .claude/skills/verify.)"""

import pytest

from melt_spark.plans.suite import SUITE

import __spark_entry__ as entrymod


@pytest.mark.parametrize("name", sorted(SUITE))
def test_query_runs(spark, sf_dir, name):
    fn, _sql = SUITE[name]
    df = fn(spark, sf_dir)
    assert df.columns, name
    df.limit(5).collect()  # forces execution


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {"topic", "key", "value"}
    assert len(df.collect()) > 0


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert qs, "queries() must not be empty"
