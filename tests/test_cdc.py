"""CDC replay semantics (reference sql_server.clj): version windowing,
D→tombstone, tracking-field relocation, stats checkpoint, version chaining
across calls (integration_test.clj:203-226)."""

import pytest

from melt_spark.model import Source
from melt_spark.operators.cdc import (change_stats, changes_with_entity,
                                      replay_changes)

SRC = Source(name="users", schema="main", keys=("id",))

SCHEMA = ("id long, name string, sys_change_operation string,"
          " sys_change_version long")


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_version_window_and_tombstone(spark):
    ch = _changes(spark, [
        (1, "ann", "I", 1),
        (2, "bob", "I", 2),
        (1, "ann2", "U", 3),
        (2, None, "D", 4),
    ])
    msgs = replay_changes(ch, SRC, from_version=1)
    rows = {r["sys_change_version"]: r for r in msgs.collect()}
    assert set(rows) == {2, 3, 4}                      # version > 1 only
    assert rows[4]["value"] is None                     # D → tombstone
    assert rows[3]["value"] == '{"id":1,"name":"ann2"}'  # tracking relocated
    assert rows[3]["key"] == '{"id":1}'
    assert rows[3]["sys_change_operation"] == "U"


def test_stats_and_version_chaining(spark):
    """sync1 → sync2 → sync3: each call replays only past the checkpoint and
    returns the next one (sql_server.clj:134-153)."""
    ch = _changes(spark, [(1, "a", "I", 1), (1, "b", "U", 2),
                          (1, "c", "U", 3)])
    s1 = change_stats(replay_changes(ch, SRC, from_version=0))
    assert s1 == {"version": 3, "sent_count": 3}
    # new change arrives; replay from checkpoint sends exactly 1
    ch2 = _changes(spark, [(1, "a", "I", 1), (1, "b", "U", 2),
                           (1, "c", "U", 3), (1, "d", "U", 4)])
    s2 = change_stats(replay_changes(ch2, SRC, from_version=s1["version"]))
    assert s2 == {"version": 4, "sent_count": 1}
    # nothing new → zero sent, version floor is NULL → caller keeps old
    s3 = change_stats(replay_changes(ch2, SRC, from_version=s2["version"]))
    assert s3["sent_count"] == 0


def test_changes_with_entity_left_join(spark):
    """J1: deleted PKs get NULL base side (sql_server.clj:85-95)."""
    ch = spark.createDataFrame(
        [(1, "U", 1), (99, "D", 2)],
        "id long, sys_change_operation string, sys_change_version long")
    base = spark.createDataFrame([(1, "ann")], "id long, name string")
    out = {r["id"]: r["name"]
           for r in changes_with_entity(ch, base, ["id"]).collect()}
    assert out == {1: "ann", 99: None}


def test_missing_version_column_rejected(spark):
    ch = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        replay_changes(ch, SRC)
