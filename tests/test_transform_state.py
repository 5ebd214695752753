"""transformWithStateInPandas latest-state (streaming/transform_state.py):
the modern arbitrary-state API run end-to-end on the RocksDB state store,
checked against the batch latest_state operator on the same changelog.

ENVIRONMENT GATE: transformWithState's Python<->JVM state-server protocol is
protobuf-based (pyspark/sql/streaming/proto/StateMessage_pb2). This sandbox
has no google.protobuf and installs are disallowed, so the end-to-end run is
skipped here (verified failure mode: the TransformWithStateInPySpark driver
worker crashes on `import google.protobuf`). The plan construction itself is
still asserted below; on any protobuf-equipped cluster the full tests run."""

import os
import time

import pytest
from pyspark.sql import functions as F

from melt_spark.streaming.transform_state import (ROCKSDB_PROVIDER,
                                                  latest_state_transform)

try:
    import google.protobuf  # noqa: F401  (transformWithState wire protocol)
    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState state server requires google.protobuf "
           "(not installed in this sandbox; installs disallowed)")

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_provider(spark):
    old = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, old)


CHANGELOG = [
    # batch 0
    [("t", "a", 1, "v1"), ("t", "b", 2, "b1")],
    # batch 1: update a, tombstone b, new c
    [("t", "a", 3, "v3"), ("t", "b", 5, None), ("t", "c", 4, "c1")],
]
SCHEMA = "topic string, key string, offset long, value string"


def _stage_batches(spark, path):
    """One parquet file per changelog batch, mtimes increasing so the file
    stream source replays them in order."""
    os.makedirs(path)
    now = time.time() - 120
    for i, rows in enumerate(CHANGELOG):
        tmp = f"{path}_tmp{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(path, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (now + i * 30, now + i * 30))


def test_plan_constructs_without_execution(spark):
    """The transformWithStateInPandas plan must ANALYZE against a streaming
    changelog (schema, grouping, output struct all validated JVM-side) —
    runs in every environment; execution needs protobuf (gate above)."""
    stream = (spark.readStream.format("rate").load()
              .selectExpr("'t' AS topic", "CAST(value AS STRING) AS key",
                          "value AS offset", "'v' AS value"))
    out = latest_state_transform(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "topic", "key", "last_offset", "value", "deleted"]


@needs_protobuf
def test_latest_state_transform_matches_batch(spark, tmp_path,
                                              rocksdb_provider):
    stage = str(tmp_path / "changelog")
    _stage_batches(spark, stage)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(stage))
    out = latest_state_transform(stream)
    q = (out.writeStream.format("memory").queryName("tws_latest")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    # update mode appends one row per changed key per batch; the final
    # state is the row with the highest last_offset per key
    rows = (spark.table("tws_latest")
            .groupBy("key")
            .agg(F.max_by(F.struct("value", "deleted", "last_offset"),
                          "last_offset").alias("s"))
            .select("key", "s.value", "s.deleted", "s.last_offset")
            .collect())
    got = {r["key"]: (r["value"], r["deleted"], r["last_offset"])
           for r in rows}
    assert got == {
        "a": ("v3", False, 3),
        "b": (None, True, 5),   # tombstone observed, state cleared
        "c": ("c1", False, 4),
    }

    # cross-check against the batch operator on the flattened changelog
    from melt_spark.operators.latest_state import latest_state
    flat = spark.createDataFrame(
        [r for batch in CHANGELOG for r in batch], SCHEMA)
    batch_state = {r["key"]: r["value"]
                   for r in latest_state(flat, ("topic", "key"), "offset",
                                         drop_tombstones=True).collect()}
    stream_alive = {k: v for k, (v, deleted, _o) in got.items()
                    if not deleted}
    assert stream_alive == batch_state


@needs_protobuf
def test_latest_state_transform_with_ttl_runs(spark, tmp_path,
                                              rocksdb_provider):
    """TTL smoke: a generous TTL changes nothing functionally within one
    run; asserts the ProcessingTime + TTLConfig path executes."""
    stage = str(tmp_path / "changelog")
    _stage_batches(spark, stage)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(stage))
    out = latest_state_transform(stream, ttl_ms=24 * 3600 * 1000)
    q = (out.writeStream.format("memory").queryName("tws_ttl")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    assert spark.table("tws_ttl").count() >= 3
