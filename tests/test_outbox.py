"""Outbox sink: durable message log with the Kafka contract + compaction."""

from melt_spark.operators.outbox import (latest_outbox_state, read_outbox,
                                         write_outbox)
from melt_spark.streaming.cdc_tail import CdcTail, CdcTailSet
from melt_spark.model import Source


def _msgs(spark, rows):
    return spark.createDataFrame(rows, "topic string, key string, value string")


def test_outbox_roundtrip_and_compaction(spark, tmp_path):
    path = str(tmp_path / "outbox")
    write_outbox(_msgs(spark, [("t1", "k1", "v1"), ("t2", "k9", "w")]),
                 path, batch_id=1)
    write_outbox(_msgs(spark, [("t1", "k1", "v2"), ("t1", "k2", None)]),
                 path, batch_id=2)

    all_msgs = read_outbox(spark, path)
    assert all_msgs.count() == 4
    assert read_outbox(spark, path, topics=["t2"]).count() == 1

    state = {(r["topic"], r["key"]): r["value"]
             for r in latest_outbox_state(spark, path).collect()}
    # batch 2 wins for k1; k2 tombstone never had live state; t2 untouched
    assert state == {("t1", "k1"): "v2", ("t2", "k9"): "w"}


def test_outbox_same_key_in_batch_is_deterministic(spark, tmp_path):
    """Two records for the SAME key in ONE batch: the persisted write-time
    seq makes the later row win on every replay (a key-hash tiebreak gave
    both rows the same offset → nondeterministic winner)."""
    path = str(tmp_path / "outbox")
    write_outbox(_msgs(spark, [("t", "k", "first"), ("t", "k", "second")])
                 .coalesce(1), path, batch_id=1)
    for _ in range(3):
        state = {r["key"]: r["value"]
                 for r in latest_outbox_state(spark, path).collect()}
        assert state == {"k": "second"}


def test_streaming_sync_to_outbox(spark, tmp_path):
    """Streaming sync pipeline: custom CDC stream source → message
    projection → outbox (foreachBatch) → compacted state matches the full
    feed's last-write-wins expectation."""
    import pyspark.sql.functions as F
    from melt_spark.operators.outbox import latest_outbox_state, write_outbox
    from melt_spark.sources.python_datasource import register

    register(spark)
    stream = (spark.readStream.format("melt_changes")
              .option("batch_size", 30).option("max_version", 90).load())
    msgs = stream.select(
        F.lit("t").alias("topic"),
        F.col("c_custkey").cast("string").alias("key"),
        F.when(F.col("sys_change_operation") == "D", F.lit(None))
         .otherwise(F.concat(F.lit("v"), F.col("sys_change_version")))
         .cast("string").alias("value"),
        F.col("sys_change_version"))
    path = str(tmp_path / "outbox")

    def to_outbox(df, bid):
        # preserve intra-batch order via version-derived batch sequencing:
        # one outbox batch per micro-batch, rows keyed uniquely per version
        write_outbox(df.orderBy("sys_change_version"), path, batch_id=bid)

    q = (msgs.writeStream.foreachBatch(to_outbox)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = {r["key"]: r["value"]
             for r in latest_outbox_state(spark, path).collect()}
    expect = {}
    for v in range(1, 91):
        op = "I" if v % 5 == 0 else ("D" if v % 7 == 0 else "U")
        expect[str(v % 150 + 1)] = None if op == "D" else f"v{v}"
    expect = {k: x for k, x in expect.items() if x is not None}
    assert state == expect


def test_cdc_tail_set_version_vector(spark, tmp_path):
    schema = ("id long, name string, sys_change_operation string,"
              " sys_change_version long")
    data = {
        "users": [(1, "a", "I", 1), (2, "b", "I", 2)],
        "items": [(7, "x", "I", 5)],
    }
    sent = []

    def mk(name):
        return CdcTail(
            source=Source(name=name, schema="main", keys=("id",)),
            fetch_changes=lambda n=name: spark.createDataFrame(data[n], schema),
            send=lambda df: sent.extend(df.collect()),
            checkpoint_path=str(tmp_path / "vv.json"),
        )

    ts = CdcTailSet([mk("users"), mk("items")])
    s1 = ts.tick_all()
    assert s1["main.users"] == {"version": 2, "sent_count": 2}
    assert s1["main.items"] == {"version": 5, "sent_count": 1}
    assert ts.total_sent(s1) == 3

    data["users"].append((1, "a2", "U", 3))       # only users advances
    s2 = ts.tick_all()
    assert s2["main.users"] == {"version": 3, "sent_count": 1}
    assert s2["main.items"]["sent_count"] == 0
    # shared version-vector file holds both tables' checkpoints
    import json
    with open(tmp_path / "vv.json") as f:
        assert json.load(f) == {"main.users": 3, "main.items": 5}
