"""Skew mitigation — salting helpers for hot keys at 100 TB.

AQE's skew-join splitting (enabled in melt_spark.session) handles most join
skew at runtime; these helpers cover the cases AQE can't: skewed
AGGREGATIONS (one giant key floods one reducer) and pre-planned salted joins
when the skew is known ahead of time.

Pattern: two-phase aggregation — salt the key with a deterministic bucket
derived from a high-cardinality column (never rand(): retries/speculative
tasks must agree), partially aggregate on (key, salt), then finish on key.
Works for any algebraic aggregate (sum/count/min/max — the partial results
merge exactly).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.util import one_partition
from pyspark.sql.window import Window


def salt_column(entropy_col: str | Column, buckets: int = 32) -> Column:
    """Deterministic salt in [0, buckets): hash of a high-cardinality column
    (e.g. the row's unique id / offset). Deterministic ⇒ identical under
    task retry, unlike rand()-based salting."""
    return F.pmod(F.xxhash64(entropy_col), F.lit(buckets)).cast("int")


def salted_count(df: DataFrame, key_cols: Sequence[str], entropy_col: str,
                 buckets: int = 32, out: str = "n") -> DataFrame:
    """Two-phase count per key: shuffle 1 spreads each hot key over
    `buckets` reducers; shuffle 2 merges `buckets` tiny partials per key."""
    key_cols = list(key_cols)
    phase1 = (df.withColumn("__salt", salt_column(entropy_col, buckets))
              .groupBy(*key_cols, "__salt")
              .agg(F.count(F.lit(1)).alias("__partial")))
    return (phase1.groupBy(*key_cols)
            .agg(F.sum("__partial").cast("long").alias(out)))


def salted_sum(df: DataFrame, key_cols: Sequence[str], value_col: str,
               entropy_col: str, buckets: int = 32,
               out: str = "total") -> DataFrame:
    """Two-phase sum (use DECIMAL input for exact, order-free merges)."""
    key_cols = list(key_cols)
    phase1 = (df.withColumn("__salt", salt_column(entropy_col, buckets))
              .groupBy(*key_cols, "__salt")
              .agg(F.sum(value_col).alias("__partial")))
    return (phase1.groupBy(*key_cols)
            .agg(F.sum("__partial").alias(out)))


def salted_broadcast_join(skewed: DataFrame, small: DataFrame,
                          on: Sequence[str]) -> DataFrame:
    """Skewed-side join strategy when the other side fits in memory: just
    broadcast it — no shuffle touches the skewed side at all. (Explicit
    helper so call sites document WHY the hint is there.)"""
    return skewed.join(F.broadcast(small), on=list(on))


def skew_report(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """ONE-row key-skew diagnostic for a prospective shuffle key — the
    measurement that decides whether a join/agg needs salting (the
    operators above) before the job runs at 100 TB:

        (n_keys, total_rows, max_key_rows,
         top1_share_e6, top10_share_e6, top100_share_e6)

    top-k share = rows owned by the k heaviest keys, ppm of total —
    integer floor division, bit-deterministic. A top1_share_e6 of
    300000 (30%) means one task owns a third of the shuffle.

    Deliberately NOT a Gini/Lorenz integral: that needs a global sort of
    the full key-count table (single-partition window at high
    cardinality — the exact hazard this report exists to predict). The
    head-of-distribution shares need only a TakeOrdered(100) (per-
    partition heaps + driver merge of 100 rows) plus one aggregate, so
    the report itself is safe at any key cardinality.
    """
    keys = [F.col(c) for c in key_cols]
    counts = (df.groupBy(*key_cols)
              .agg(F.count(F.lit(1)).alias("c")))
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("bigint").alias("total_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"))
    top = (counts.orderBy(F.desc("c"), *keys).limit(100)
           .withColumn("rn", F.row_number().over(
               Window.partitionBy(one_partition(F.col("c")))
               .orderBy(F.desc("c"), *keys))))
    shares = top.agg(
        *[F.sum(F.when(F.col("rn") <= k, F.col("c")))
          .cast("bigint").alias(f"top{k}")
          for k in (1, 10, 100)])

    share = [F.expr(f"CAST(coalesce(top{k}, 0) * 1000000"
                    f" div total_rows AS BIGINT) AS top{k}_share_e6")
             for k in (1, 10, 100)]
    return (totals.crossJoin(F.broadcast(shares))
            .select("n_keys", "total_rows", "max_key_rows", *share))
