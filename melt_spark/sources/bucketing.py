"""Bucketing — co-located storage so repeated diff/verify cycles never
re-shuffle.

The diff/sync/verify loop (§3.2/3.3) joins the same two relations on
(topic, key) every cycle. At 100 TB, re-shuffling both sides each verify is
the dominant cost; persisting both sides BUCKETED on the join key makes the
full-outer join exchange-free (Spark reads matching buckets pairwise), and
`sortBy` on the same key upgrades it to a zero-sort merge join.

The same applies to the CDC entity join (changes ⋈ base on PK) and the
latest-state groupBy (bucketed on key ⇒ partial aggregation is already
co-located).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist df as a bucketed (and bucket-sorted) parquet table in the
    session catalog. Bucket count should be sized so one bucket of the
    LARGER relation fits an executor's memory at target scale."""
    keys = list(keys)
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(buckets, keys[0], *keys[1:]))
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the metric
    bucketing is meant to drive to zero for the steady-state joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
