"""The Kafka-shaped I/O boundary, executed for real against the file-backed
mock broker (sources/mock_broker.py): produce → bounded read → incremental
refresh → compaction → tombstones → streaming tail → streaming sink.

Covers SURVEY §2 S8/S10/S14/S15/T1/T3/T5 as *running* code (round 1 could
only restate them — no broker in the sandbox)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.operators.latest_state import latest_state, offset_watermarks
from melt_spark.sources import mock_broker as mb
from melt_spark.sources.kafka import refresh_offsets_json


@pytest.fixture(scope="module")
def broker(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("broker"))
    mb.register(spark)
    mb.create_topic(root, "melt.t1", partitions=3)
    return root


def _msgs(spark, rows):
    return spark.createDataFrame(
        [Row(topic=t, key=k, value=v) for t, k, v in rows],
        "topic string, key string, value string")


def test_produce_then_bounded_read(spark, broker):
    batch1 = [("melt.t1", f"k{i}", json.dumps({"n": i})) for i in range(20)]
    mb.write_messages(_msgs(spark, batch1), broker)

    env = mb.read_topics(spark, broker, ["melt.t1"])
    assert env.columns == ["topic", "partition", "offset",
                           "timestamp", "key", "value"]
    rows = env.collect()
    assert len(rows) == 20
    assert mb.count_topic(spark, broker, "melt.t1") == 20

    # dense offsets per partition, starting at 0
    by_part = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append(r.offset)
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))

    # key -> partition is the deterministic hash (per-key ordering contract)
    for r in rows:
        assert r.partition == mb.key_partition(r.key, 3)


def test_incremental_refresh_watermarks(spark, broker):
    """T5 end-to-end: saved offset watermarks --refresh_offsets_json-->
    startingOffsets for the NEXT bounded read; the two reads tile the log."""
    first = mb.read_topics(spark, broker, ["melt.t1"])
    wm = offset_watermarks(first).collect()
    start_json = refresh_offsets_json([r.asDict() for r in wm])

    batch2 = [("melt.t1", f"k{i}", json.dumps({"n": i + 100}))
              for i in range(5, 25)]
    mb.write_messages(_msgs(spark, batch2), broker)

    delta = mb.read_topics(spark, broker, ["melt.t1"],
                           starting_offsets=start_json)
    assert delta.count() == 20  # exactly the second batch
    assert delta.agg(F.min("offset")).first()[0] >= 0
    total = mb.read_topics(spark, broker, ["melt.t1"]).count()
    assert total == 40


def test_compaction_and_tombstones(spark, broker):
    """Latest-state over the broker envelope: same-key updates collapse to
    the highest (partition, offset); a NULL value tombstone removes the key.
    A key lives on ONE partition, so (partition, offset) order is total
    per key."""
    mb.create_topic(broker, "melt.t2", partitions=2)
    mb.write_messages(_msgs(spark, [
        ("melt.t2", "a", '{"v":1}'), ("melt.t2", "b", '{"v":1}')]), broker)
    mb.write_messages(_msgs(spark, [
        ("melt.t2", "a", '{"v":2}')]), broker)
    mb.write_messages(_msgs(spark, [
        ("melt.t2", "b", None)]), broker)  # tombstone

    env = mb.read_topics(spark, broker, ["melt.t2"])
    state = latest_state(env.select("topic", "key", "value",
                                    "partition", "offset"),
                         key_cols=("topic", "key"),
                         order_col=("partition", "offset"))
    got = {r.key: r.value for r in state.collect()}
    assert got == {"a": '{"v":2}'}  # b tombstoned, a at latest version

    with_tombstones = latest_state(
        env.select("topic", "key", "value", "partition", "offset"),
        key_cols=("topic", "key"), order_col=("partition", "offset"),
        drop_tombstones=False)
    assert {r.key for r in with_tombstones.collect()} == {"a", "b"}


def test_offset_range_snapshot_is_bounded(spark, broker):
    """T1: endingOffsets resolved at planning time — a concurrent produce
    after planning does not leak into the read."""
    mb.create_topic(broker, "melt.t3", partitions=1)
    mb.write_messages(_msgs(spark, [("melt.t3", "x", "1")]), broker)
    ends = mb.end_offsets(broker, "melt.t3")
    end_json = json.dumps({"melt.t3": {str(p): e for p, e in ends.items()}})
    # produce MORE after capturing the end snapshot
    mb.write_messages(_msgs(spark, [("melt.t3", "y", "2")]), broker)
    bounded = mb.read_topics(spark, broker, ["melt.t3"],
                             ending_offsets=end_json)
    assert bounded.count() == 1
    assert mb.count_topic(spark, broker, "melt.t3") == 2


def test_streaming_tail_compacts_like_batch(spark, broker, tmp_path):
    """S9/T3: readStream over the broker, foreachBatch latest-state merge;
    final state == batch compaction of the same log."""
    from melt_spark.streaming.foreach_merge import KeyedStateSink

    sink = KeyedStateSink(spark, str(tmp_path / "state"),
                          key_cols=("topic", "key"), order_col="offset")

    stream = mb.tail_topics(spark, broker, ["melt.t2"])
    q = (stream.select("topic", "key", "value", "offset", "partition")
         .writeStream.foreachBatch(
             lambda df, bid: sink.merge_batch(
                 df.withColumn(
                     "offset",
                     F.col("partition").cast("long") * F.lit(1 << 40)
                     + F.col("offset"))
                 .drop("partition"), bid))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    state = sink.compacted_view()
    got = {r.key: r.value for r in state.collect()}
    assert got == {"a": '{"v":2}'}


def test_stream_writer_idempotent_batches(spark, broker, tmp_path):
    """writeStream INTO the broker (T3 producer side): a rate-limited file
    stream lands in the topic exactly once; batch-id ledger dedups replays."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    (src_dir / "a.json").write_text("\n".join(
        json.dumps({"topic": "melt.sink", "key": f"s{i}", "value": str(i)})
        for i in range(10)))

    stream = (spark.readStream.schema("topic string, key string, value string")
              .json(str(src_dir)))
    q = (stream.writeStream.format("melt_broker")
         .option("path", broker)
         .option("partitions", 2)
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    assert mb.count_topic(spark, broker, "melt.sink") == 10
    # replaying the same committed batch id appends nothing (ledger dedup)
    man_before = mb.end_offsets(broker, "melt.sink")
    msg = mb._write_segments(broker, 2, iter([
        Row(topic="melt.sink", key="s0", value="dup")]))
    mb._commit_segments(broker, [msg], 0)  # batch 0 already in ledger
    assert mb.end_offsets(broker, "melt.sink") == man_before
