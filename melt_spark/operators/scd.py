"""SCD Type 2 — build a versioned dimension (validity intervals) from a
CDC change stream.

The reference (reifying/melt) compacts a change stream to LATEST state
per key (src/jdbc/melt.clj latest-state reduction; SURVEY §2.5); a
warehouse consumer of the same stream usually wants the OTHER standard
projection too: every historical version with its validity window
(Kimball's slowly-changing-dimension type 2). Same input contract as
operators/cdc.py (key, sys_change_operation I/U/D, sys_change_version).

Spark-first: one window per key ordered by change version —
    valid_from = this change's version
    valid_to   = next change's version for the key (NULL = still open)
    is_current = open AND the change wasn't a delete
Delete rows close the previous interval (they are the `lead` that bounds
it) and are then dropped — a tombstone contributes an edge, not a row,
mirroring how the reference's compaction treats nil-value messages.

One shuffle (the window partitioning), no joins; at 100 TB partition
count follows the key hash like every other keyed operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(changes: DataFrame, key_col: str,
                   version_col: str = "sys_change_version",
                   op_col: str = "sys_change_operation") -> DataFrame:
    """(key, op, valid_from, valid_to, is_current) — one row per non-delete
    change; valid_to is NULL while the version is still current."""
    w = Window.partitionBy(key_col).orderBy(version_col)
    out = (changes
           .withColumn("valid_from", F.col(version_col))
           .withColumn("valid_to", F.lead(version_col).over(w))
           .withColumn(
               "is_current",
               (F.col("valid_to").isNull()
                & (F.col(op_col) != F.lit("D"))).cast("int"))
           .filter(F.col(op_col) != F.lit("D")))
    return out.select(key_col, op_col, "valid_from", "valid_to",
                      "is_current")


def pit_join(facts: DataFrame, dim: DataFrame, key_col: str,
             at_col: str, valid_from: str = "valid_from",
             valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time join — the feature-store correctness join (public
    lineage: Kimball SCD2 lookup; 'point-in-time correct join' in the
    Feast/Hopsworks feature-store literature): each fact row is joined to
    the dimension version whose [valid_from, valid_to) interval contains
    the fact's version/timestamp, and NEVER to a later version — the
    label-leakage guard a training-set builder needs.

    Spark-first shape, graded for 100 TB: an equi-join on the key carries
    the interval predicate as a join residual, so the join shuffles on
    the KEY hash exactly like any other keyed join (both sides compact).
    Per-key cost is |facts_k| x |versions_k|; SCD dimension version
    counts are small and bounded by churn, which is what makes this the
    right plan versus a global as-of sort-merge. An open interval
    (valid_to NULL) matches everything from valid_from on.

    Output: fact columns + (valid_from, valid_to, is_current) of the
    matched version; facts before the first version drop out (inner) —
    the standard PIT contract.
    """
    d = dim.select(F.col(key_col).alias("_k"),
                   F.col(valid_from).alias("valid_from"),
                   F.col(valid_to).alias("valid_to"),
                   F.col("is_current"))
    cond = ((facts[at_col] >= d["valid_from"])
            & (d["valid_to"].isNull() | (facts[at_col] < d["valid_to"])))
    return (facts.join(d, (facts[key_col] == d["_k"]) & cond)
            .drop("_k"))
