"""LIVE JDBC integration tier against embedded Derby (ships in Spark's
jars) — the reference's scenario suite against a real database: discover
schema from DatabaseMetaData, partitioned scan, load → diff clean → mutate
via SQL → diff dirty → sync → verify clean → delete → tombstone.
"""

import pytest
from pyspark.sql import functions as F

from melt_spark.catalog.discovery import trackable
from melt_spark.model import Source
from melt_spark.operators.diff import (TOPIC_ONLY, deleted_keys, diff,
                                       diff_matches)
from melt_spark.operators.latest_state import latest_state
from melt_spark.operators.sync import sync_plan
from melt_spark.sources.jdbc_metadata import (discover_live_schema,
                                              execute_sql)

URL_TMPL = "jdbc:derby:{dir}/meltdb;create=true"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    url = URL_TMPL.format(dir=tmp_path_factory.mktemp("derby"))
    execute_sql(
        spark, url,
        "CREATE TABLE ACCOUNTS (ID BIGINT PRIMARY KEY,"
        " NAME VARCHAR(40), BAL DOUBLE)",
        "CREATE TABLE NOTES (BODY VARCHAR(100))",  # PK-less
        "INSERT INTO ACCOUNTS VALUES (1, 'ann', 10.5), (2, 'bob', 20.0),"
        " (3, 'cyd', 30.25)",
    )
    return url


def _read(spark, url, query=None, table="ACCOUNTS", **opts):
    r = (spark.read.format("jdbc").option("url", url)
         .option("query" if query else "dbtable", query or table))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_live_schema_discovery(spark, derby):
    desc = discover_live_schema(spark, derby, schema_pattern="APP")
    by_name = {r["table_name"]: r for r in desc.collect()}
    assert by_name["ACCOUNTS"]["columns"] == ["bal", "id", "name"]
    assert by_name["ACCOUNTS"]["keys"] == ["id"]
    assert by_name["NOTES"]["keys"] == []           # PK-less
    tr = {r["table_name"] for r in trackable(desc).collect()}
    assert tr == {"ACCOUNTS"}                        # P9 on live metadata


def test_live_partitioned_scan_and_custom_sql(spark, derby):
    full = _read(spark, derby)
    assert full.count() == 3
    part = _read(spark, derby, partitionColumn="ID", lowerBound="1",
                 upperBound="4", numPartitions="2")
    assert part.rdd.getNumPartitions() == 2          # real range-partitioned read
    assert sorted(r["ID"] for r in part.collect()) == [1, 2, 3]
    # S6: arbitrary-SQL source (reference melt_test.clj:58-84)
    two = _read(spark, derby, query="SELECT * FROM ACCOUNTS WHERE ID IN (1, 3)")
    assert sorted(r["ID"] for r in two.collect()) == [1, 3]


def test_live_scenario_load_diff_sync(spark, derby):
    """The reference integration scenario against a real DB."""
    src = Source(name="accounts", schema="app", keys=("id",))
    read = lambda: src.messages(_read(spark, derby))

    # load: topic = compacted changelog of produced messages
    records = []

    def produce(msgs):
        base = len(records)
        records.extend((r["topic"], r["key"], r["value"], base + i)
                       for i, r in enumerate(
                           msgs.select("topic", "key", "value").collect()))

    def topic_state():
        df = spark.createDataFrame(
            records, "topic string, key string, value string, offset long")
        return latest_state(df).select("topic", "key", "value")

    produce(read())
    assert diff_matches(diff(read(), topic_state()))   # clean after load

    # mutate through the DATABASE (the reference updates postalcode)
    execute_sql(spark, derby,
                "UPDATE ACCOUNTS SET BAL = 99.75 WHERE ID = 2",
                "DELETE FROM ACCOUNTS WHERE ID = 3",
                "INSERT INTO ACCOUNTS VALUES (4, 'dee', 40.0)")
    d = diff(read(), topic_state())
    sides = {(r["key"], r["side"]) for r in d.select("key", "side").collect()}
    assert ('{"id":2}', "table_only") in sides          # stale
    assert ('{"id":4}', "table_only") in sides          # new row
    assert ('{"id":3}', TOPIC_ONLY) in sides            # deleted in DB
    assert {r["key"] for r in deleted_keys(d).collect()} == {'{"id":3}'}

    # sync repairs; verify clean; tombstoned key gone from compacted state
    produce(sync_plan(d))
    assert diff_matches(diff(read(), topic_state()))
    assert '{"id":3}' not in {r["key"] for r in topic_state().collect()}


def test_live_cdc_full_sync_then_tail_chains_versions(spark, derby,
                                                      tmp_path):
    """T6/T7 as ONE RUNNING LOOP against live Derby (round-6 verdict
    item 5; reference sql_server.clj:155-162 capture-version-then-
    backfill and integration_test.clj:203-226 version chaining):

    Derby has no change tracking, so the test maintains the CHANGETABLE
    analogue itself (ACC_CHANGES — exactly what a trigger would write);
    every fetch is a REAL JDBC read, every mutation a REAL SQL execute.

    Proves at-least-once with NO GAP: a change that lands between
    version capture and backfill completion replays AGAIN in the first
    tick (overlap, not gap) and the compacted topic still converges;
    then three more chained micro-batches (update+delete / insert /
    idle) each verify topic == database via diff."""
    from melt_spark.streaming.cdc_tail import CdcTail

    execute_sql(
        spark, derby,
        "CREATE TABLE ACC_T (ID BIGINT PRIMARY KEY,"
        " NAME VARCHAR(40), BAL DOUBLE)",
        "CREATE TABLE ACC_CHANGES (SYS_CHANGE_VERSION BIGINT,"
        " SYS_CHANGE_OPERATION VARCHAR(1), ID BIGINT)",
        "INSERT INTO ACC_T VALUES (1, 'ann', 10.5), (2, 'bob', 20.0),"
        " (3, 'cyd', 30.25)",
    )
    src = Source(name="acc_t", schema="app", keys=("id",))

    def lower(df):
        return df.select(*[F.col(c).alias(c.lower()) for c in df.columns])

    def read_base():
        return lower(_read(spark, derby, table="ACC_T"))

    def fetch_changes():
        from melt_spark.operators.cdc import changes_with_entity

        ch = lower(_read(spark, derby, table="ACC_CHANGES"))
        return changes_with_entity(ch, read_base(), ["id"])

    records = []

    def produce(msgs):
        # version order within a batch — the reference replays ordered
        rows = (msgs.orderBy("sys_change_version")
                .select("topic", "key", "value").collect()
                if "sys_change_version" in msgs.columns
                else msgs.select("topic", "key", "value").collect())
        base = len(records)
        records.extend((r["topic"], r["key"], r["value"], base + i)
                       for i, r in enumerate(rows))

    def topic_state():
        df = spark.createDataFrame(
            records, "topic string, key string, value string, offset long")
        return latest_state(df).select("topic", "key", "value")

    def clean():
        return diff_matches(diff(src.messages(read_base()), topic_state()))

    tail = CdcTail(source=src, fetch_changes=fetch_changes, send=produce,
                   checkpoint_path=str(tmp_path / "cdc_version.json"))

    # T7 handoff: capture version BEFORE backfill; a change lands while
    # the backfill "runs" (between capture and tail start)
    v0 = 0
    execute_sql(spark, derby,
                "UPDATE ACC_T SET BAL = 11.0 WHERE ID = 1",
                "INSERT INTO ACC_CHANGES VALUES (1, 'U', 1)")
    stats = tail.full_sync_then_tail(
        v0, backfill=lambda: produce(src.messages(read_base())))
    # the in-flight change replays AGAIN (overlap, not gap) and the
    # compacted state still converges — at-least-once is idempotent here
    assert stats == {"version": 1, "sent_count": 1}
    assert clean()

    # micro-batch 2: update + delete, chained from version 1
    execute_sql(spark, derby,
                "UPDATE ACC_T SET BAL = 21.0 WHERE ID = 2",
                "INSERT INTO ACC_CHANGES VALUES (2, 'U', 2)",
                "DELETE FROM ACC_T WHERE ID = 3",
                "INSERT INTO ACC_CHANGES VALUES (3, 'D', 3)")
    s2 = tail.tick()
    assert s2 == {"version": 3, "sent_count": 2}
    assert clean()
    assert '{"id":3}' not in {r["key"] for r in topic_state().collect()}

    # micro-batch 3: insert, chained from version 3
    execute_sql(spark, derby,
                "INSERT INTO ACC_T VALUES (4, 'dee', 40.0)",
                "INSERT INTO ACC_CHANGES VALUES (4, 'I', 4)")
    s3 = tail.tick()
    assert s3 == {"version": 4, "sent_count": 1}
    assert clean()

    # idle micro-batch: checkpoint holds, nothing re-sent
    assert tail.tick() == {"version": 4, "sent_count": 0}
    # and the checkpoint survives a process "restart" (fresh CdcTail)
    tail2 = CdcTail(source=src, fetch_changes=fetch_changes, send=produce,
                    checkpoint_path=str(tmp_path / "cdc_version.json"))
    assert tail2.tick() == {"version": 4, "sent_count": 0}


def test_live_jdbc_write_roundtrip(spark, derby):
    """S14-analogue via JDBC sink: write a DataFrame to a new table, read
    it back through the same connector."""
    df = spark.createDataFrame([(10, "out", 1.5)],
                               "ID long, NAME string, BAL double")
    (df.write.format("jdbc").option("url", derby)
       .option("dbtable", "OUTBOUND").mode("overwrite").save())
    back = _read(spark, derby, table="OUTBOUND")
    assert [tuple(r) for r in back.collect()] == [(10, "out", 1.5)]
