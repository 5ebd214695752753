"""Range join (bucketized interval join) and cascade time-bucket rollup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from melt_spark.operators.range_join import range_join
from melt_spark.operators.rollup import cascade_rollup, time_bucket

PTS = "pid long, k string, p long"
IVS = "k string, lo long, hi long, tag string"


def _pts(spark, rows):
    return spark.createDataFrame(rows, PTS)


def _ivs(spark, rows):
    return spark.createDataFrame(rows, IVS)


def _pairs(df):
    return sorted((r["pid"], r["tag"]) for r in df.collect())


def test_range_join_basic(spark):
    pts = _pts(spark, [(1, "a", 5), (2, "a", 15), (3, "a", 99)])
    ivs = _ivs(spark, [("a", 0, 10, "w1"), ("a", 10, 20, "w2")])
    out = range_join(pts, ivs, "p", "lo", "hi", on=["k"], bucket_width=7)
    # boundaries inclusive on both ends; point 10 would match both
    assert _pairs(out) == [(1, "w1"), (2, "w2")]


def test_range_join_overlapping_intervals_multi_match(spark):
    pts = _pts(spark, [(1, "a", 10)])
    ivs = _ivs(spark, [("a", 0, 10, "w1"), ("a", 10, 20, "w2")])
    out = range_join(pts, ivs, "p", "lo", "hi", on=["k"], bucket_width=4)
    assert _pairs(out) == [(1, "w1"), (1, "w2")]


def test_range_join_no_dup_when_interval_spans_buckets(spark):
    # interval spans many buckets; each (point, interval) pair must appear
    # exactly once (they meet only in the point's own bucket)
    pts = _pts(spark, [(1, "a", 50)])
    ivs = _ivs(spark, [("a", 0, 100, "wide")])
    out = range_join(pts, ivs, "p", "lo", "hi", on=["k"], bucket_width=3)
    assert _pairs(out) == [(1, "wide")]


def test_range_join_key_isolation_and_degenerate(spark):
    pts = _pts(spark, [(1, "a", 5), (2, "b", 5)])
    # b's interval is degenerate (hi < lo): matches nothing, and must not
    # fabricate buckets via Spark's descending sequence()
    ivs = _ivs(spark, [("a", 0, 10, "w1"), ("b", 10, 0, "bad")])
    out = range_join(pts, ivs, "p", "lo", "hi", on=["k"], bucket_width=100)
    assert _pairs(out) == [(1, "w1")]


def test_range_join_left_keeps_unmatched(spark):
    pts = _pts(spark, [(1, "a", 5), (2, "a", 999), (3, "zzz", 5)])
    ivs = _ivs(spark, [("a", 0, 10, "w1")])
    out = range_join(pts, ivs, "p", "lo", "hi", on=["k"],
                     bucket_width=8, how="left")
    rows = {r["pid"]: r["tag"] for r in out.collect()}
    assert rows == {1: "w1", 2: None, 3: None}


def test_range_join_rejects_collisions_and_bad_width(spark):
    pts = _pts(spark, [(1, "a", 5)])
    ivs = pts.select("k", F.col("p").alias("lo"), F.col("p").alias("hi"),
                     F.col("pid"))  # pid collides
    with pytest.raises(ValueError, match="collide"):
        range_join(pts, ivs, "p", "lo", "hi", on=["k"])
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, _ivs(spark, []), "p", "lo", "hi", bucket_width=0)


def test_range_join_no_nested_loop_in_plan(spark):
    pts = _pts(spark, [(1, "a", 5)])
    ivs = _ivs(spark, [("a", 0, 10, "w1")])
    plan = range_join(pts, ivs, "p", "lo", "hi", on=["k"],
                      bucket_width=8)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# cascade rollup


def _events(spark):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(minutes=37 * i), "t%d" % (i % 2), float(i))
            for i in range(100)]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def test_time_bucket_floors_to_width(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 13, 59, 59),)], "ts timestamp")
    got = df.select(time_bucket("ts", 3600).alias("b")).first()["b"]
    assert got == dt.datetime(2024, 3, 1, 13, 0, 0)


def test_cascade_equals_direct_aggregation(spark):
    ev = _events(spark)
    levels = cascade_rollup(ev, "ts", ["k"],
                            {"s": ("v", "sum"), "n": ("v", "count"),
                             "mx": ("v", "max"), "mn": ("v", "min")},
                            widths=[3600, 86400])
    # daily-from-hourly must equal daily-from-raw
    direct = (ev.groupBy("k", time_bucket("ts", 86400).alias("bucket_ts"))
              .agg(F.sum("v").alias("s"), F.count("v").alias("n"),
                   F.max("v").alias("mx"), F.min("v").alias("mn")))
    got = sorted(map(tuple, levels[86400].collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want
    # hourly level: bucket count sanity (100 events * 37min ≈ 62h span)
    n_hours = levels[3600].count()
    assert 50 <= n_hours <= 124


def test_cascade_rejects_bad_specs(spark):
    ev = _events(spark)
    with pytest.raises(ValueError, match="divide"):
        cascade_rollup(ev, "ts", ["k"], {"s": ("v", "sum")}, [3600, 5000])
    with pytest.raises(ValueError, match="unsupported"):
        cascade_rollup(ev, "ts", ["k"], {"a": ("v", "avg")}, [3600])
    with pytest.raises(ValueError, match="at least one"):
        cascade_rollup(ev, "ts", ["k"], {"s": ("v", "sum")}, [])
