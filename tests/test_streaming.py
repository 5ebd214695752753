"""Structured Streaming: continuous latest-state, stateful first-seen dedup,
windowed counts with watermark, CDC tail checkpoint loop."""

import pytest
from pyspark.sql import functions as F

from melt_spark.functions.text import fingerprint
from melt_spark.model import Source
from melt_spark.sources.parquet import read_table
from melt_spark.streaming.cdc_tail import CdcTail
from melt_spark.streaming.continuous import (run_to_memory,
                                             stream_from_parquet,
                                             stream_latest_state_query,
                                             windowed_event_counts)
from melt_spark.streaming.dedup_state import streaming_first_seen


def test_stream_latest_state_matches_batch(spark, sf_dir):
    from melt_spark.plans.suite import q_latest_state

    got = {(r["topic"], r["key"]): (r["last_offset"], r["last_value"])
           for r in stream_latest_state_query(spark, sf_dir).collect()}
    want = {(r["topic"], r["key"]): (r["last_offset"], r["last_value"])
            for r in q_latest_state(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_streaming_first_seen_dedup(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string")
    pq = str(tmp_path / "docs")
    docs.repartition(1).write.parquet(pq)

    stream = (spark.readStream.schema(docs.schema).parquet(pq)
              .withColumn("fingerprint", fingerprint("text")))
    out = streaming_first_seen(stream)
    q, name = run_to_memory(out, mode="append")
    try:
        rows = {r["doc_id"] for r in spark.table(name).collect()}
    finally:
        q.stop()
    assert rows == {1, 3}  # one emission per distinct fingerprint, min id


def test_windowed_counts_with_watermark(spark, sf_dir):
    stream = stream_from_parquet(spark, f"{sf_dir}/events.parquet")
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = windowed_event_counts(stream, window="1 day", watermark="1 day")
    q, name = run_to_memory(out, mode="append")
    try:
        # append mode only emits closed windows; force completion then check
        # against the batch equivalent on the closed-window subset
        got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    finally:
        q.stop()
    ev = read_table(spark, sf_dir, "events")
    total = ev.count()
    assert got is None or got <= total  # closed windows only, never over


def test_background_consumer_closeable(spark, tmp_path):
    """T3: live latest-state view + AutoCloseable handle."""
    from melt_spark.streaming.continuous import BackgroundConsumer

    log = spark.createDataFrame(
        [("t", "k1", 0, "v0"), ("t", "k1", 5, "v5"), ("t", "k2", 1, None)],
        "topic string, key string, offset long, value string")
    pq = str(tmp_path / "log")
    log.repartition(1).write.parquet(pq)
    stream = spark.readStream.schema(log.schema).parquet(pq)

    with BackgroundConsumer(stream) as bc:
        state = {r["key"]: r["value"] for r in bc.state().collect()}
        assert state == {"k1": "v5"}   # tombstoned k2 absent
        q = bc._query
        assert q.isActive
    assert not q.isActive              # closed on exit


def test_foreach_merge_sink_incremental(spark, tmp_path):
    """Production-path sink: two micro-batches merge incrementally; the
    snapshot pointer always names a complete state."""
    from melt_spark.streaming.foreach_merge import KeyedStateSink

    schema = "topic string, key string, offset long, value string"
    b1 = spark.createDataFrame(
        [("t", "k1", 0, "v0"), ("t", "k2", 1, "x")], schema)
    b2 = spark.createDataFrame(
        [("t", "k1", 5, "v5"), ("t", "k2", 6, None), ("t", "k3", 7, "n")],
        schema)
    # write two files so maxFilesPerTrigger=1 yields two real micro-batches
    src = str(tmp_path / "log")
    b1.repartition(1).write.mode("append").parquet(src)
    b2.repartition(1).write.mode("append").parquet(src)

    sink = KeyedStateSink(spark, str(tmp_path / "state"))
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = sink.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {r["key"]: r["value"] for r in sink.compacted_view().collect()}
    assert live == {"k1": "v5", "k3": "n"}   # k2 tombstoned
    full = {r["key"]: r["value"] for r in sink.state().collect()}
    assert full["k2"] is None                # tombstone retained in storage


def test_foreach_merge_sink_restart_recovery(spark, tmp_path):
    """Stop the stream, restart from the same checkpoint, add data: state
    resumes without double-applying old batches (merge is idempotent on
    (key, offset) but the checkpoint must prevent re-reading old files)."""
    from melt_spark.streaming.foreach_merge import KeyedStateSink

    schema = "topic string, key string, offset long, value string"
    src = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    sink = KeyedStateSink(spark, str(tmp_path / "state"))

    spark.createDataFrame([("t", "k1", 0, "v0")], schema) \
        .repartition(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = sink.attach(stream, ckpt)
    q.processAllAvailable()
    q.stop()
    v_after_first = sink._current_version()

    # restart from the same checkpoint; new data arrives
    spark.createDataFrame([("t", "k1", 9, "v9"), ("t", "k2", 1, "x")],
                          schema) \
        .repartition(1).write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(src))
    q2 = sink.attach(stream2, ckpt)
    q2.processAllAvailable()
    q2.stop()

    state = {r["key"]: r["value"] for r in sink.compacted_view().collect()}
    assert state == {"k1": "v9", "k2": "x"}
    # exactly one extra merge ran after restart (old batch not re-read)
    assert sink._current_version() == v_after_first + 1


def test_keyed_state_sink_backend_selection(spark, tmp_path):
    """auto picks Delta only when delta-spark + extension are present;
    requesting the missing backend fails loudly, never silently degrades."""
    import pytest
    from melt_spark.streaming.foreach_merge import (KeyedStateSink,
                                                    delta_available)

    sink = KeyedStateSink(spark, str(tmp_path / "s1"))
    assert sink.backend == ("delta" if delta_available(spark) else "parquet")
    explicit = KeyedStateSink(spark, str(tmp_path / "s2"), backend="parquet")
    assert explicit.backend == "parquet"
    if not delta_available(spark):
        with pytest.raises(RuntimeError, match="delta"):
            KeyedStateSink(spark, str(tmp_path / "s3"), backend="delta")
    with pytest.raises(ValueError):
        KeyedStateSink(spark, str(tmp_path / "s4"), backend="hudi")


def test_keyed_state_sink_delta_merge(spark, tmp_path):
    """Real MERGE INTO path — runs only where delta-spark is installed
    (skipped in this sandbox; the parquet fallback covers the contract)."""
    import pytest
    from melt_spark.streaming.foreach_merge import (KeyedStateSink,
                                                    delta_available)

    if not delta_available(spark):
        pytest.skip("delta-spark not available in this session")
    schema = "topic string, key string, offset long, value string"
    sink = KeyedStateSink(spark, str(tmp_path / "state"), backend="delta")
    sink.merge_batch(spark.createDataFrame(
        [("t", "k1", 0, "v0"), ("t", "k2", 1, "x")], schema), 0)
    sink.merge_batch(spark.createDataFrame(
        [("t", "k1", 2, "v2"), ("t", "k2", 1, "stale"),
         ("t", "k3", 3, None)], schema), 1)
    state = {r["key"]: (r["offset"], r["value"])
             for r in sink.state().collect()}
    assert state == {"k1": (2, "v2"), "k2": (1, "x"), "k3": (3, None)}
    live = {r["key"] for r in sink.compacted_view().collect()}
    assert live == {"k1", "k2"}


def test_foreach_merge_idempotent_replay(spark, tmp_path):
    """At-least-once tolerance: re-merging the SAME batch (failure replay)
    leaves the state unchanged — the merge is idempotent on (key, offset)."""
    from melt_spark.streaming.foreach_merge import KeyedStateSink

    schema = "topic string, key string, offset long, value string"
    batch = spark.createDataFrame(
        [("t", "k1", 5, "v5"), ("t", "k2", 6, None)], schema)
    sink = KeyedStateSink(spark, str(tmp_path / "state"))
    sink.merge_batch(batch, 0)
    first = sorted(map(tuple, sink.state().collect()))
    sink.merge_batch(batch, 0)   # replayed batch
    second = sorted(map(tuple, sink.state().collect()))
    assert first == second


def test_cdc_tail_version_chaining(spark, tmp_path):
    src = Source(name="users", schema="main", keys=("id",))
    schema = ("id long, name string, sys_change_operation string,"
              " sys_change_version long")
    state = {"rows": [(1, "a", "I", 1), (2, "b", "I", 2)]}
    sent = []

    tail = CdcTail(
        source=src,
        fetch_changes=lambda: spark.createDataFrame(state["rows"], schema),
        send=lambda df: sent.extend(df.collect()),
        checkpoint_path=str(tmp_path / "v.json"),
    )
    s1 = tail.tick()
    assert s1 == {"version": 2, "sent_count": 2}
    # no new changes → no send, version stays
    assert tail.tick() == {"version": 2, "sent_count": 0}
    # one new change → exactly 1 replayed (reference sent-count=1 scenario)
    state["rows"].append((1, "a2", "U", 3))
    s3 = tail.tick()
    assert s3 == {"version": 3, "sent_count": 1}
    assert len(sent) == 3
    assert tail.load_version() == 3


def test_cdc_full_sync_then_tail(spark, tmp_path):
    src = Source(name="users", schema="main", keys=("id",))
    schema = ("id long, name string, sys_change_operation string,"
              " sys_change_version long")
    rows = [(1, "a", "I", 1), (2, "b", "I", 2), (3, "c", "I", 3)]
    sent = []
    tail = CdcTail(
        source=src,
        fetch_changes=lambda: spark.createDataFrame(rows, schema),
        send=lambda df: sent.extend(df.collect()),
        checkpoint_path=str(tmp_path / "v.json"),
    )
    backfilled = []
    # version captured BEFORE backfill = 2; change v3 lands "during" backfill
    stats = tail.full_sync_then_tail(
        current_version=2, backfill=lambda: backfilled.append(True))
    assert backfilled and stats == {"version": 3, "sent_count": 1}
