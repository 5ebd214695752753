"""Latest-state-per-key — topic compaction as one aggregation.

Reference: consuming a topic folds records into {key → value} where a non-nil
value upserts and a nil value (tombstone) removes the key, in offset order
(merge-seq-entry, src/jdbc/melt.clj:307-323); the DB side folds scan rows
last-write-wins (merge-by-key, melt.clj:392-401).

Spark restatement: `groupBy(topic, key).agg(max_by(payload, order))` —
max_by has a partial-merge implementation, so this is ONE shuffle with
map-side combine; at 100 TB each mapper pre-reduces its partition to unique
keys before shuffling. (A window row_number()==1 would sort every partition —
strictly worse; the reference's fold order itself cannot be reproduced in a
distributed engine, so order MUST come from an explicit column: Kafka offset
or CDC version — SURVEY.md §7 risks.)

Tombstone semantics: the max_by keeps the LAST record; if that record is a
tombstone the key is dead and is dropped (matching the reference's dissoc) —
crucially a tombstone followed by a reinsert keeps the reinsert.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state(changelog: DataFrame,
                 key_cols: Sequence[str] = ("topic", "key"),
                 order_col: str | Sequence[str] = "offset",
                 payload_cols: Sequence[str] | None = None,
                 tombstone_col: str = "value",
                 drop_tombstones: bool = True) -> DataFrame:
    """Compact a changelog to latest state per key.

    changelog: one row per record with key_cols + order column(s) (monotone
    per key) + payload. Returns key_cols + order + payload columns of the
    winning record.

    Ordering caveat (SURVEY §7 risks): a raw Kafka offset is only comparable
    WITHIN a partition. If a key's records can span partitions (e.g. after a
    partition-count change), pass a compound order — order_col accepts a
    sequence like ("partition", "offset") or ("ts", "offset"), compared
    lexicographically via struct ordering. A single CDC version / outbox
    sequence is globally monotone and fine alone.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    payload_cols = list(payload_cols) if payload_cols is not None else [
        c for c in changelog.columns
        if c not in set(key_cols) and c not in order_cols
    ]
    order_key = (F.col(order_cols[0]) if len(order_cols) == 1
                 else F.struct(*[F.col(c) for c in order_cols]))
    packed = F.struct(*[F.col(c).alias(c) for c in order_cols],
                      *[F.col(c).alias(c) for c in payload_cols])
    winner = F.max_by(packed, order_key).alias("__w")

    out = (changelog
           .groupBy(*key_cols)
           .agg(winner)
           .select(*key_cols,
                   *[F.col(f"__w.{c}").alias(c) for c in order_cols],
                   *[F.col(f"__w.{c}").alias(c) for c in payload_cols]))
    if drop_tombstones and tombstone_col in payload_cols:
        out = out.filter(F.col(tombstone_col).isNotNull())
    return out


def offset_watermarks(changelog: DataFrame,
                      topic_col: str = "topic",
                      partition_col: str = "partition",
                      offset_col: str = "offset") -> DataFrame:
    """High-watermark offset per (topic, partition) — the reference's
    :offsets checkpoint map (assoc-offset, melt.clj:237,278-279). Feeds
    incremental refresh (read only records past these offsets)."""
    return (changelog
            .groupBy(topic_col, partition_col)
            .agg(F.max(offset_col).alias("max_offset")))


def offset_gaps(changelog: DataFrame,
                topic_col: str = "topic",
                partition_col: str = "partition",
                offset_col: str = "offset") -> DataFrame:
    """Log-integrity check per (topic, partition): how many offsets in
    [min, max] are MISSING from the read — nonzero means retention holes,
    compaction, or a lossy read, and an incremental consumer relying on
    dense offsets must resync. One map-side-combined aggregation."""
    return (changelog
            .groupBy(topic_col, partition_col)
            .agg(F.count(F.lit(1)).alias("n_msgs"),
                 F.min(offset_col).alias("min_offset"),
                 F.max(offset_col).alias("max_offset"))
            .select(topic_col, partition_col, "n_msgs", "max_offset",
                    (F.col("max_offset") - F.col("min_offset") + 1
                     - F.col("n_msgs")).alias("n_gaps")))


def incremental_refresh(prior_state: DataFrame, new_records: DataFrame,
                        key_cols: Sequence[str] = ("topic", "key"),
                        order_col: str = "offset",
                        tombstone_col: str = "value") -> DataFrame:
    """Reference `refresh` (melt.clj:511-523): keep prior topic state and
    fold in only newly-read records. prior_state is a previous latest_state
    output; new_records are raw changelog rows with offsets strictly greater
    than the prior watermarks. Union + re-compact: the winning record per key
    is still max_by(order)."""
    cols = [*key_cols, order_col,
            *[c for c in prior_state.columns
              if c not in set(key_cols) and c != order_col]]
    unioned = prior_state.select(*cols).unionByName(
        new_records.select(*cols), allowMissingColumns=False
    )
    return latest_state(unioned, key_cols, order_col,
                        tombstone_col=tombstone_col)
