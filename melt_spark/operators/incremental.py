"""Incremental aggregate maintenance — merge a delta's partial aggregates
into a base aggregate instead of recomputing from scratch.

The reference's refresh loop re-reads a topic from the last checkpoint
and folds new messages into existing state (SURVEY §2.8 T5,
src/jdbc/melt.clj incremental refresh); the same algebra generalizes to
any commutative-monoid aggregate: count, sum (DECIMAL — exact and
order-independent), max. Maintaining a 10^9-group aggregate over a 100 TB
fact table then costs one scan of the DELTA plus a co-partitioned merge
join — not a full recompute.

Correctness is the interesting claim, and the suite makes the oracle
prove it: the Spark side computes base(≤ V0) ⊎ delta(V0..V1]
incrementally, the DuckDB oracle aggregates the full range ≤ V1 directly
— a value-hash match IS the monoid-merge proof.

Scale shape: both sides aggregate BEFORE the merge (map-side combined),
the merge is a full-outer join on the group key — co-partitioned if base
state is stored bucketed by key (operators/outbox.py pattern), in which
case the merge is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_partials(df: DataFrame, key_col: str, version_col: str,
                   value_col: str) -> DataFrame:
    """(key, n, last_version, total) — the mergeable summary of a slice.
    total is DECIMAL(18,2): exact, so merge order can never change it."""
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(version_col).alias("last_version"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"))


def merge_partials(base: DataFrame, delta: DataFrame,
                   key_col: str) -> DataFrame:
    """base ⊎ delta by the monoid ops: n adds, last_version maxes,
    total adds (DECIMAL). Full-outer so keys new in the delta appear and
    keys absent from it pass through."""
    d = delta.select(F.col(key_col),
                     F.col("n").alias("d_n"),
                     F.col("last_version").alias("d_last"),
                     F.col("total").alias("d_total"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (base.join(d, key_col, "full_outer")
            .select(
                key_col,
                (F.coalesce("n", F.lit(0))
                 + F.coalesce("d_n", F.lit(0))).alias("n"),
                F.greatest(
                    F.coalesce("last_version", F.lit(-1)),
                    F.coalesce("d_last", F.lit(-1))).alias("last_version"),
                (F.coalesce(F.col("total"), zero)
                 + F.coalesce(F.col("d_total"), zero))
                .cast("decimal(18,2)").alias("total")))
