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


def test_attribution_hand_computed(spark, tmp_path):
    """u: view, click, purchase, purchase -> last-touch credit 'click'
    x2 (the first purchase is not a touch), first-touch 'view' x2;
    v: purchase with no prior touch -> 'none' bucket."""
    import datetime as dt

    from melt_spark.plans.analytics_suite import q_attribution

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "view", 1.0, ""),
        (2, dt.datetime(2024, 1, 1, 11), 1, "click", 1.0, ""),
        (3, dt.datetime(2024, 1, 1, 12), 1, "purchase", 5.0, ""),
        (4, dt.datetime(2024, 1, 1, 13), 1, "purchase", 5.0, ""),
        (5, dt.datetime(2024, 1, 1, 9), 2, "purchase", 5.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string")
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    out = {r.channel: (r.n_last_touch, r.n_first_touch)
           for r in q_attribution(spark, d).collect()}
    assert out == {"click": (2, 0), "view": (0, 2), "none": (1, 1)}
