"""Latest-state compaction semantics (reference merge-seq-entry,
melt.clj:307-323): last-write-wins by offset, tombstone removes, tombstone
then reinsert keeps the reinsert, per-[topic key] independence."""

from melt_spark.operators.latest_state import (incremental_refresh,
                                               latest_state,
                                               offset_watermarks)

COLS = ["topic", "key", "offset", "value"]


def _log(spark, rows):
    return spark.createDataFrame(rows, "topic string, key string,"
                                       " offset long, value string")


def test_last_write_wins(spark):
    log = _log(spark, [("t", "k1", 0, "v0"), ("t", "k1", 5, "v5"),
                       ("t", "k1", 3, "v3"), ("t", "k2", 1, "a")])
    out = {r["key"]: (r["offset"], r["value"])
           for r in latest_state(log).collect()}
    assert out == {"k1": (5, "v5"), "k2": (1, "a")}


def test_tombstone_removes_key(spark):
    log = _log(spark, [("t", "k1", 0, "v0"), ("t", "k1", 1, None),
                       ("t", "k2", 0, "x")])
    out = {r["key"] for r in latest_state(log).collect()}
    assert out == {"k2"}


def test_tombstone_then_reinsert(spark):
    log = _log(spark, [("t", "k1", 0, "v0"), ("t", "k1", 1, None),
                       ("t", "k1", 2, "v2")])
    rows = latest_state(log).collect()
    assert len(rows) == 1 and rows[0]["value"] == "v2"


def test_same_key_different_topics(spark):
    """Compound [topic key] grouping (melt.clj:403-407)."""
    log = _log(spark, [("t1", "k", 0, "a"), ("t2", "k", 9, "b")])
    out = {(r["topic"], r["value"]) for r in latest_state(log).collect()}
    assert out == {("t1", "a"), ("t2", "b")}


def test_offset_watermarks(spark):
    log = spark.createDataFrame(
        [("t", 0, 3), ("t", 0, 7), ("t", 1, 2)],
        "topic string, partition int, offset long")
    out = {(r["topic"], r["partition"]): r["max_offset"]
           for r in offset_watermarks(log).collect()}
    assert out == {("t", 0): 7, ("t", 1): 2}


def test_incremental_refresh(spark):
    """Reference refresh (melt.clj:511-523): prior state + delta records."""
    prior = latest_state(_log(spark, [("t", "k1", 0, "v0"),
                                      ("t", "k2", 1, "x")]))
    delta = _log(spark, [("t", "k1", 5, "v5"),   # update
                         ("t", "k2", 6, None),   # delete
                         ("t", "k3", 7, "new")])  # insert
    out = {r["key"]: r["value"]
           for r in incremental_refresh(prior, delta).collect()}
    assert out == {"k1": "v5", "k3": "new"}


def test_offset_gaps_detects_retention_holes(spark):
    from melt_spark.operators.latest_state import offset_gaps

    rows = [("t", 0, o) for o in [0, 1, 2, 4, 7]] + \
           [("t", 1, o) for o in [5, 6, 7]]
    log = spark.createDataFrame(
        rows, "topic string, partition int, offset long")
    got = {r.partition: (r.n_msgs, r.max_offset, r.n_gaps)
           for r in offset_gaps(log).collect()}
    assert got[0] == (5, 7, 3)   # missing 3, 5, 6
    assert got[1] == (3, 7, 0)   # dense
