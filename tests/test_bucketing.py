"""Bucketed storage removes the shuffle from steady-state diff joins."""

from pyspark.sql import functions as F

from melt_spark.operators.diff import diff
from melt_spark.sources.bucketing import (exchange_count, read_bucketed,
                                          write_bucketed)


def _msgs(spark, n, stale_every=50):
    return spark.range(n).select(
        F.lit("t").alias("topic"),
        F.concat(F.lit('{"id":'), F.col("id"), F.lit("}")).alias("key"),
        F.when((F.col("id") % stale_every == 0) & (F.col("id") > 0),
               F.lit("stale"))
         .otherwise(F.concat(F.lit("v"), F.col("id"))).alias("value"))


def test_bucketed_diff_is_shuffle_free(spark):
    import shutil

    src = _msgs(spark, 1000, stale_every=10**9)   # clean source
    top = _msgs(spark, 1000, stale_every=50)      # 20 stale entries
    for t in ("b_src", "b_top"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/melt_spark_warehouse/{t}", ignore_errors=True)
    # bucket columns must EQUAL the join keys for exchange elimination
    write_bucketed(src, "b_src", ["topic", "key"], buckets=4)
    write_bucketed(top, "b_top", ["topic", "key"], buckets=4)

    d_plain = diff(src, top)
    d_bucketed = diff(read_bucketed(spark, "b_src"),
                      read_bucketed(spark, "b_top"))

    assert d_bucketed.count() == d_plain.count() == 19  # ids 50..950
    n_plain = exchange_count(d_plain)
    n_bucketed = exchange_count(d_bucketed)
    assert n_plain >= 2          # both sides shuffle on (topic, key)
    assert n_bucketed < n_plain  # bucketed sides read co-located

    spark.sql("DROP TABLE IF EXISTS b_src")
    spark.sql("DROP TABLE IF EXISTS b_top")
