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
# CHANGELOG plus a batch of out-of-order stragglers: a lower-offset record
# for the tombstoned key (must NOT resurrect — the state keeps the
# tombstone's high-water offset) and a stale update for a live key (must
# not regress it, and emit-on-change means no output row at all)
CHANGELOG_STRAGGLERS = CHANGELOG + [
    [("t", "b", 4, "zombie"), ("t", "a", 2, "stale")],
]
SCHEMA = "topic string, key string, offset long, value string"


def _stage_batches(spark, path, changelog=CHANGELOG):
    """One parquet file per changelog batch, mtimes increasing so the file
    stream source replays them in order."""
    os.makedirs(path)
    now = time.time() - 120
    for i, rows in enumerate(changelog):
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
        "b": (None, True, 5),   # tombstone observed; high-water marker kept
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


def test_merge_events_core_tombstone_keeps_high_water():
    """The shared merge core (used by BOTH operators): tombstones win on
    >= order, the high-water order survives them, and stale offsets never
    regress the winner."""
    from melt_spark.streaming.transform_state import merge_events

    changed, order, payload = merge_events(-1, None, [1, 3], ["v1", "v3"])
    assert (changed, order, payload) == (True, 3, "v3")
    # tombstone at 5 beats 3; payload None
    changed, order, payload = merge_events(order, payload, [5], [None])
    assert (changed, order, payload) == (True, 5, None)
    # straggler below the tombstone's offset: no resurrection, no change
    changed, order, payload = merge_events(order, payload, [4], ["zombie"])
    assert (changed, order, payload) == (False, 5, None)
    # a genuinely newer record revives the key
    changed, order, payload = merge_events(order, payload, [6], ["fresh"])
    assert (changed, order, payload) == (True, 6, "fresh")


def test_latest_state_apply_executes_and_ignores_stragglers(spark, tmp_path):
    """The applyInPandasWithState fallback EXECUTES here (no protobuf
    needed) with the full semantics: emit-on-change update output, tombstone
    high-water retention across micro-batches, batch-operator parity."""
    stage = str(tmp_path / "changelog")
    _stage_batches(spark, stage, CHANGELOG_STRAGGLERS)

    from melt_spark.streaming.transform_state import latest_state_apply

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(stage))
    out = latest_state_apply(stream)
    q = (out.writeStream.format("memory").queryName("apply_latest")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_apply"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    all_rows = spark.table("apply_latest").collect()
    # emit-on-change: the straggler batch changed nothing -> zero rows for
    # it; total = 2 (batch 0) + 3 (batch 1)
    assert len(all_rows) == 5
    got = {r["key"]: (r["value"], r["deleted"], r["last_offset"])
           for r in (spark.table("apply_latest")
                     .groupBy("key")
                     .agg(F.max_by(F.struct("value", "deleted",
                                            "last_offset"),
                                   "last_offset").alias("s"))
                     .select("key", "s.value", "s.deleted", "s.last_offset")
                     .collect())}
    assert got == {
        "a": ("v3", False, 3),   # stale offset-2 update ignored
        "b": (None, True, 5),    # offset-4 zombie did NOT resurrect
        "c": ("c1", False, 4),
    }

    # batch-operator parity on the flattened changelog
    from melt_spark.operators.latest_state import latest_state
    flat = spark.createDataFrame(
        [r for batch in CHANGELOG_STRAGGLERS for r in batch], SCHEMA)
    batch_state = {r["key"]: r["value"]
                   for r in latest_state(flat, ("topic", "key"), "offset",
                                         drop_tombstones=True).collect()}
    assert {k: v for k, (v, deleted, _o) in got.items()
            if not deleted} == batch_state


def test_latest_state_apply_ttl_expires_idle_keys(spark, tmp_path):
    """TTL on the fallback: a short processing-time timeout removes idle
    keys' state, so a later record for an expired key re-emits it from
    scratch (fresh state) rather than merging against dropped history."""
    from melt_spark.streaming.transform_state import latest_state_apply

    stage = str(tmp_path / "changelog")
    _stage_batches(spark, stage,
                   [[("t", "x", 10, "x1")], [("t", "y", 1, "y1")],
                    # x's state expired between micro-batches -> offset 2
                    # (below x's previous 10!) must WIN because the high
                    # water was TTL-dropped — proving expiry really removes
                    # state rather than just hiding it
                    [("t", "x", 2, "x2")]])
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(stage))
    out = latest_state_apply(stream, ttl_ms=1)  # expire almost immediately
    q = (out.writeStream.format("memory").queryName("apply_ttl")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_ttl2"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    rows = [(r["key"], r["value"], r["last_offset"])
            for r in spark.table("apply_ttl").collect()]
    assert ("x", "x1", 10) in rows
    assert ("x", "x2", 2) in rows  # re-admitted after TTL expiry


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
