"""Skew helpers: two-phase salted aggregates must equal their plain
equivalents exactly; salting must be deterministic."""

from pyspark.sql import functions as F

from melt_spark.operators.skew import (salt_column, salted_broadcast_join,
                                       salted_count, salted_sum)
from melt_spark.sources.parquet import read_table


def test_salted_count_equals_plain(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    plain = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["event_type"]: r["n"] for r in
              salted_count(ev, ["event_type"], "event_id", buckets=8).collect()}
    assert salted == plain


def test_salted_sum_exact_decimal(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events") \
        .withColumn("v", F.col("value").cast("decimal(18,2)"))
    plain = {r["event_type"]: r["t"] for r in
             ev.groupBy("event_type").agg(F.sum("v").alias("t")).collect()}
    salted = {r["event_type"]: r["total"] for r in
              salted_sum(ev, ["event_type"], "v", "event_id").collect()}
    assert salted == plain


def test_salt_deterministic(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").limit(100)
    a = ev.select("event_id", salt_column("event_id", 16).alias("s")).collect()
    b = ev.select("event_id", salt_column("event_id", 16).alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["s"] < 16 for r in a)


def test_salted_broadcast_join(spark):
    skewed = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k long, v long")
    small = spark.createDataFrame([(1, "hot"), (2, "cold")],
                                  "k long, name string")
    out = salted_broadcast_join(skewed, small, ["k"])
    assert out.count() == 101
    assert out.filter("name = 'hot'").count() == 100
