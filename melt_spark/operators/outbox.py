"""Message outbox — a file-backed sink with the Kafka sink's contract.

Two uses: (1) environments without a broker (this one) still get a durable,
replayable record of every message a load/sync produced; (2) the classic
outbox pattern — write messages transactionally next to the data, ship to
Kafka asynchronously.

Layout: parquet partitioned by topic (partition pruning on re-read), with a
monotone batch_id column so replay order is explicit. NULL values
(tombstones) are preserved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_outbox(messages: DataFrame, path: str, batch_id: int,
                 mode: str = "append") -> None:
    """Append one batch of (topic, key, value) messages."""
    (messages.select("topic", "key", "value")
     .withColumn("batch_id", F.lit(batch_id).cast("long"))
     .write.mode(mode).partitionBy("topic").parquet(path))


def read_outbox(spark: SparkSession, path: str,
                topics: list[str] | None = None) -> DataFrame:
    """Read back messages; topic filter prunes partitions at the scan."""
    df = spark.read.parquet(path)
    if topics:
        df = df.filter(F.col("topic").isin(*topics))
    return df


def outbox_as_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Expose the outbox as a changelog consumable by latest_state:
    offset = (batch_id, intra-batch hash order surrogate). Batch id is the
    coarse order (matches produce order); within a batch the Kafka contract
    itself gives no order across keys, so any deterministic tiebreak works."""
    df = read_outbox(spark, path)
    return df.select(
        "topic", "key", "value",
        (F.col("batch_id") * F.lit(1_000_000_000)
         + F.pmod(F.xxhash64("key"), F.lit(1_000_000_000)))
        .alias("offset"))


def latest_outbox_state(spark: SparkSession, path: str) -> DataFrame:
    """Compacted latest-state view of the outbox (tombstones applied)."""
    from .latest_state import latest_state

    return latest_state(outbox_as_changelog(spark, path)) \
        .select("topic", "key", "value")


def outbox_exists(path: str) -> bool:
    return os.path.exists(path)
