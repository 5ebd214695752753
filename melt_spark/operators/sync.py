"""Sync — turn a diff into the message batch that repairs the topic.

Reference sync-kafka (src/jdbc/melt.clj:495-509): produce every :table-only
row (upsert) and a nil-value tombstone for every `deleted` key, return the
total messages sent. Upserts carry the ORIGINAL values (unfuzz-keys,
melt.clj:415-416) — diffing happened in lossy space but what's sent is the
source row's canonical serialization, which for us is the same `value` string
(our canonical form IS the wire form, so no unfuzz step is needed).

Spark restatement: two projections of the diff output unioned into one
Kafka-sink-shaped DataFrame (topic, key, value) — a single write, tombstones
included as value=NULL rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .diff import SIDE, TABLE_ONLY, TOPIC_ONLY


def sync_plan(diff_df: DataFrame,
              on: Sequence[str] = ("topic", "key")) -> DataFrame:
    """Diff rows → repair messages: upserts (side=table_only, send source
    value) + tombstones (side=topic_only, value=NULL). Output matches the
    Kafka sink contract exactly.

    Single CASE projection rather than union-of-filters: a union would
    recompute the diff join once per branch (Spark does not dedup common
    subplans) — at 100 TB that doubles the dominant shuffle."""
    return diff_df.select(
        *on,
        F.when(F.col(SIDE) == TABLE_ONLY, F.col("src_value"))
         .otherwise(F.lit(None).cast("string")).alias("value"))


def sync_count(sync_df: DataFrame) -> int:
    """Total repair messages (reference returns the sum, melt.clj:504-508)."""
    return sync_df.count()
