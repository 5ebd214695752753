"""SCD2 intervals (operators/scd.py) + incremental aggregate maintenance
(operators/incremental.py): interval-chain invariants and the monoid-merge
equality."""

from pyspark.sql import functions as F

from melt_spark.operators.incremental import group_partials, merge_partials
from melt_spark.operators.scd import scd2_intervals


def _changes(spark):
    rows = [
        # key 1: I, U, U  -> 3 rows, last current
        (1, "I", 10), (1, "U", 20), (1, "U", 30),
        # key 2: I, D     -> 1 row, closed by the delete, no current
        (2, "I", 11), (2, "D", 21),
        # key 3: I, D, I  -> delete then re-insert: 2 rows, last current
        (3, "I", 12), (3, "D", 22), (3, "I", 32),
    ]
    return spark.createDataFrame(
        rows, "k long, sys_change_operation string,"
              " sys_change_version long")


def test_scd2_interval_chain(spark):
    out = scd2_intervals(_changes(spark), "k").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        for a, b in zip(rows, rows[1:]):
            # consecutive non-delete versions chain through the delete
            # edges: a's valid_to is SOME later version <= b's valid_from
            assert a.valid_to is not None and a.valid_to <= b.valid_from


def test_scd2_current_rules(spark):
    out = scd2_intervals(_changes(spark), "k").collect()
    current = {r.k for r in out if r.is_current == 1}
    assert current == {1, 3}          # key 2 ends in a delete
    assert all(r.valid_to is None for r in out if r.is_current == 1)
    # deletes never appear as rows
    assert all(r.sys_change_operation != "D" for r in out)
    # key 2's single row is CLOSED by its tombstone
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].valid_to == 21 and k2[0].is_current == 0


def test_incremental_merge_equals_direct(spark, sf_dir):
    from melt_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    for split in (0, 5000, 10 ** 9):   # empty base / mid / empty delta
        base = group_partials(ev.filter(F.col("event_id") <= split),
                              "user_id", "event_id", "value")
        delta = group_partials(ev.filter(F.col("event_id") > split),
                               "user_id", "event_id", "value")
        merged = merge_partials(base, delta, "user_id")
        direct = group_partials(ev, "user_id", "event_id", "value")
        m = {(r.user_id, r.n, r.last_version, r.total)
             for r in merged.collect()}
        d = {(r.user_id, r.n, r.last_version, r.total)
             for r in direct.collect()}
        assert m == d, f"split {split}"


def test_incremental_merge_commutes(spark, sf_dir):
    from melt_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    a = group_partials(ev.filter(F.col("event_id") % 2 == 0),
                       "user_id", "event_id", "value")
    b = group_partials(ev.filter(F.col("event_id") % 2 == 1),
                       "user_id", "event_id", "value")
    ab = {tuple(r) for r in merge_partials(a, b, "user_id").collect()}
    ba = {tuple(r) for r in merge_partials(b, a, "user_id").collect()}
    assert ab == ba
