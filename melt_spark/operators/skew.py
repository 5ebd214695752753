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
