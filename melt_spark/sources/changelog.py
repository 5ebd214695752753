"""Deterministic changelog / CDC fixtures derived from the `events` table.

The reference tests against a live Kafka topic per table; the driver gives us
a deterministic `events` parquet instead (FIXTURES.md F5/F6). These
projections derive, with NO randomness:

- events_changelog: the Kafka record envelope of reference melt.clj:256-262
  (topic, partition, offset, timestamp, key, value) — multiple versions per
  key (150 users × ~N events), tombstones, ≥2 topics for compound
  [topic key] grouping (melt.clj:403-407).
- cdc_changes_from_events: the CHANGETABLE(CHANGES …) shape of reference
  sql_server.clj:70-95 (PK + sys_change_* + left-joined current row, NULL
  for deletes).

Fixture conventions (documented so the DuckDB oracle states the same):
- topic: 'melt.main.users_even' / 'users_odd' by user_id parity
- partition = user_id % 4, offset = event_id (globally monotone)
- key = canonical JSON {"user_id": N}
- tombstone: event_type = 'error' ⇒ value NULL
- CDC: operation I/U/D from event_type (signup→I, error→D, else U),
  version = event_id + 1 (strictly positive, monotone)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canonical import canonical_json

TOMBSTONE_EVENT = "error"


def events_changelog(events: DataFrame) -> DataFrame:
    value_cols = ["event_type", "ts", "user_id", "value"]
    is_tombstone = F.col("event_type") == F.lit(TOMBSTONE_EVENT)
    return events.select(
        F.when(F.col("user_id") % 2 == 0, F.lit("melt.main.users_even"))
         .otherwise(F.lit("melt.main.users_odd")).alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        canonical_json(["user_id"]).alias("key"),
        F.when(is_tombstone, F.lit(None).cast("string"))
         .otherwise(canonical_json(value_cols)).alias("value"),
    )


def cdc_changes_from_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """CHANGETABLE-shaped rows: PK (c_custkey = user_id + 1) + tracking
    fields + current customer values, NULLed for deletes (the reference's
    left join finds no base row for a deleted PK, sql_server.clj:85-95)."""
    op = (F.when(F.col("event_type") == "signup", F.lit("I"))
           .when(F.col("event_type") == TOMBSTONE_EVENT, F.lit("D"))
           .otherwise(F.lit("U")))
    changes = events.select(
        (F.col("user_id") + 1).alias("c_custkey"),
        op.alias("sys_change_operation"),
        (F.col("event_id") + 1).alias("sys_change_version"),
        F.lit(1).cast("long").alias("sys_change_creation_version"),
    )
    # tiny dim side → Catalyst broadcasts; changes stream side stays put
    joined = changes.join(customer, "c_custkey", "left")
    is_del = F.col("sys_change_operation") == "D"
    base_cols = [c for c in customer.columns if c != "c_custkey"]
    return joined.select(
        "c_custkey", "sys_change_operation", "sys_change_version",
        "sys_change_creation_version",
        *[F.when(is_del, F.lit(None)).otherwise(F.col(c))
          .cast(dict(customer.dtypes)[c]).alias(c) for c in base_cols],
    )
