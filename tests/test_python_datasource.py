"""Custom Python DataSource connector: partitioning, options, determinism,
and composition with the CDC replay operator."""

from melt_spark.model import Source
from melt_spark.operators.cdc import replay_changes
from melt_spark.sources.python_datasource import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("melt_changes")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_deterministic_and_partition_invariant(spark):
    a = sorted(map(tuple, _read(spark, count=100, partitions=4).collect()))
    b = sorted(map(tuple, _read(spark, count=100, partitions=7).collect()))
    assert a == b and len(a) == 100  # content independent of parallelism


def test_version_window_option(spark):
    df = _read(spark, from_version=50, count=10)
    versions = sorted(r["sys_change_version"] for r in df.collect())
    assert versions == list(range(51, 61))


def test_streaming_cdc_source_micro_batches(spark, tmp_path):
    """readStream over the custom source: version-windowed micro-batches,
    checkpointed offsets, full feed consumed exactly once."""
    register(spark)
    stream = (spark.readStream.format("melt_changes")
              .option("from_version", 0)
              .option("batch_size", 40)
              .option("max_version", 130).load())
    batches = []
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: batches.append(
             (bid, df.count(),
              df.agg({"sys_change_version": "max"}).collect()[0][0])))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    nonempty = [b for b in batches if b[1] > 0]
    assert sum(b[1] for b in nonempty) == 130        # every version once
    assert len(nonempty) >= 3                        # real micro-batching
    assert max(b[2] for b in nonempty) == 130        # reached feed end


def test_end_to_end_streaming_cdc_to_state(spark, tmp_path):
    """Capstone: streaming CDC source → message projection → KeyedStateSink
    merge; final compacted state == batch replay of the same feed."""
    import pyspark.sql.functions as F
    from melt_spark.streaming.foreach_merge import KeyedStateSink

    register(spark)
    stream = (spark.readStream.format("melt_changes")
              .option("batch_size", 50).option("max_version", 120).load())
    log = stream.select(
        F.lit("t").alias("topic"),
        F.col("c_custkey").cast("string").alias("key"),
        F.col("sys_change_version").alias("offset"),
        F.when(F.col("sys_change_operation") == "D", F.lit(None))
         .otherwise(F.concat(F.lit("v"), F.col("sys_change_version")))
         .cast("string").alias("value"))
    sink = KeyedStateSink(spark, str(tmp_path / "state"))
    q = sink.attach(log, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["key"]: r["value"] for r in sink.compacted_view().collect()}

    batch = _read(spark, count=120)
    expect = {}
    for r in sorted(batch.collect(), key=lambda r: r["sys_change_version"]):
        k = str(r["c_custkey"])
        if r["sys_change_operation"] == "D":
            expect[k] = None
        else:
            expect[k] = f"v{r['sys_change_version']}"
    expect = {k: v for k, v in expect.items() if v is not None}
    assert got == expect and len(got) > 0


def test_feeds_cdc_replay(spark):
    """The custom connector slots straight into the CDC pipeline."""
    changes = _read(spark, count=50)
    # add a value column so the replay has something to serialize
    changes = changes.withColumn("payload", changes.sys_change_version * 2)
    msgs = replay_changes(changes,
                          Source(name="feed", schema="main",
                                 keys=("c_custkey",)),
                          from_version=25)
    rows = msgs.collect()
    assert len(rows) == 25
    assert all(r["value"] is None for r in rows
               if r["sys_change_operation"] == "D")
