"""The reference's COMPLETE workflow executed end-to-end with real I/O:

    full load → produce to (mock) broker → streaming-tail compaction into
    the keyed state sink → diff clean → source drift (deletes + updates) →
    verify fails → verify_sync repairs THROUGH THE BROKER → streaming tail
    picks the repair up → diff clean again.

Reference: load-with-sync + verify loop (src/jdbc/melt.clj:456-571),
lagging-topic scenario (integration/jdbc/melt/integration_test.clj:102-112).
Round 1 could only restate the broker legs; this runs them."""

import pytest
from pyspark.sql import functions as F

from melt_spark.model import Source
from melt_spark.operators.diff import diff, diff_matches
from melt_spark.operators.latest_state import latest_state
from melt_spark.operators.verify import verify, verify_sync
from melt_spark.sources import mock_broker as mb
from melt_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"
TOPIC = "melt.main.customer"


@pytest.fixture(scope="module")
def broker(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loop_broker"))
    mb.register(spark)
    mb.create_topic(root, TOPIC, partitions=3)
    return root


def _source_msgs(spark, where=None):
    src = Source(name="customer", keys=("c_custkey",), topic=TOPIC)
    df = read_table(spark, SF, "customer").filter(F.col("c_custkey") < 300)
    if where is not None:
        df = df.filter(where)
    return src.messages(df)


def _topic_state(spark, broker):
    log = mb.read_topics(spark, broker, [TOPIC]).withColumn(
        "off", F.col("partition").cast("long") * F.lit(1 << 40)
        + F.col("offset"))
    return latest_state(log, key_cols=("topic", "key"), order_col="off",
                        payload_cols=["value"], tombstone_col="value")


def test_full_load_stream_verify_drift_repair(spark, broker):
    # 1. full load: table → message envelopes → broker
    msgs = _source_msgs(spark)
    n_loaded = msgs.count()
    assert n_loaded > 50
    mb.write_messages(msgs.select("topic", "key", "value"), broker)

    # 2. topic state == source: verify green on attempt 1
    res = verify(lambda: _source_msgs(spark),
                 lambda: _topic_state(spark, broker))
    assert res.matches and res.attempts == 1

    # 3. drift: source loses keys %7==0 and changes acctbal for %11==3
    #    (the topic is now stale on both counts)
    drifted = F.col("c_custkey") % 7 != 0
    def drifted_msgs():
        src = Source(name="customer", keys=("c_custkey",), topic=TOPIC)
        df = (read_table(spark, SF, "customer")
              .filter(F.col("c_custkey") < 300).filter(drifted)
              .withColumn("c_acctbal",
                          F.when(F.col("c_custkey") % 11 == 3,
                                 F.lit(0.0)).otherwise(F.col("c_acctbal"))))
        return src.messages(df)

    d = diff(drifted_msgs(), _topic_state(spark, broker))
    assert not diff_matches(d)
    sides = {r[0] for r in d.select("side").distinct().collect()}
    assert sides == {"table_only", "topic_only"}

    # 4. verify fails after retries, then verify_sync repairs THROUGH the
    #    broker producer (upserts + tombstones land in the topic)
    res = verify_sync(
        drifted_msgs,
        lambda: _topic_state(spark, broker),
        send_fn=lambda repair: mb.write_messages(
            repair.select("topic", "key", "value"), broker),
        retries=1, retry_delay_sec=0.0)
    assert res.synced and res.matches
    assert res.sync_count > 0

    # 5. the repaired topic compacts clean against the drifted source
    assert diff_matches(diff(drifted_msgs(), _topic_state(spark, broker)))

    # 6. deleted keys are tombstoned in the log (latest record value NULL),
    #    not merely absent
    log = mb.read_topics(spark, broker, [TOPIC]).withColumn(
        "off", F.col("partition").cast("long") * F.lit(1 << 40)
        + F.col("offset"))
    last = (log.groupBy("key")
            .agg(F.max_by("value", "off").alias("value")))
    n_tombstones = last.filter(F.col("value").isNull()).count()
    assert n_tombstones > 0


GOLDEN_TOPIC = "melt.main.appointments"


def test_iso_seconds_golden_topic_full_loop(spark, tmp_path):
    """Second-precision interop end-to-end (reference golden wire format,
    integration_test.clj:68 '2007-08-01T00:00:00Z'): a topic pre-seeded
    with HAND-RENDERED reference-style bytes (json built in Python — an
    independent encode path, not our encoder) must diff CLEAN against a
    timestamped source under Source(ts_format=ISO_SECONDS), stay dirty
    under the default millis format (sensitivity control), and after real
    drift the verify_sync repair messages must land in the same golden
    byte format."""
    import datetime as dt
    import json
    import re

    from melt_spark.canonical import ISO_SECONDS

    broker = str(tmp_path / "golden_broker")
    mb.register(spark)
    mb.create_topic(broker, GOLDEN_TOPIC, partitions=2)

    t0 = dt.datetime(2007, 8, 1, 0, 0, 0)
    rows = [(i, t0 + dt.timedelta(seconds=90 * i), f"who{i}")
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "appt_id int, starttime timestamp, who string")

    # reference-style golden messages: sorted keys, second-precision Z
    golden = [(GOLDEN_TOPIC,
               json.dumps({"appt_id": i}, separators=(",", ":")),
               json.dumps({"appt_id": i,
                           "starttime": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                           "who": who},
                          separators=(",", ":"), sort_keys=True))
              for i, ts, who in rows]
    mb.write_messages(
        spark.createDataFrame(golden, "topic string, key string, "
                                      "value string"), broker)

    def topic_state():
        log = mb.read_topics(spark, broker, [GOLDEN_TOPIC]).withColumn(
            "off", F.col("partition").cast("long") * F.lit(1 << 40)
            + F.col("offset"))
        return latest_state(log, key_cols=("topic", "key"), order_col="off",
                            payload_cols=["value"], tombstone_col="value")

    # 1. ISO_SECONDS source == golden topic, byte for byte
    src = Source(name="appointments", keys=("appt_id",),
                 ts_format=ISO_SECONDS)
    assert diff_matches(diff(src.messages(df), topic_state()))

    # 2. sensitivity control: the default (millis) format must NOT match —
    #    every golden row shows as drift on both sides of the diff
    src_ms = Source(name="appointments", keys=("appt_id",))
    d = diff(src_ms.messages(df), topic_state())
    assert not diff_matches(d)
    assert d.filter(F.col("side") == "table_only").count() == len(rows)

    # 3. real drift (drop %5==0, rename %7==1), repair through the broker,
    #    diff clean again — still under ISO_SECONDS
    drifted = (df.filter(F.col("appt_id") % 5 != 0)
               .withColumn("who", F.when(F.col("appt_id") % 7 == 1,
                                         F.lit("renamed"))
                           .otherwise(F.col("who"))))
    res = verify_sync(
        lambda: src.messages(drifted), topic_state,
        send_fn=lambda repair: mb.write_messages(
            repair.select("topic", "key", "value"), broker),
        retries=1, retry_delay_sec=0.0)
    assert res.synced and res.sync_count > 0
    assert diff_matches(diff(src.messages(drifted), topic_state()))

    # 4. EVERY live value in the repaired topic — pre-seeded and repair
    #    messages alike — carries golden second-precision bytes
    vals = [r["value"] for r in topic_state().collect()
            if r["value"] is not None]
    pat = re.compile(r'"starttime":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"')
    assert vals and all(pat.search(v) for v in vals)
    assert not any("." in v.split('"starttime":"')[1][:30] for v in vals)
