"""Deterministic Bloom filter as a DataFrame — the join-pruning /
membership primitive (Bloom, "Space/time trade-offs in hash coding with
allowable errors", CACM 1970; the runtime-filter idea behind Spark's own
`spark.sql.optimizer.runtime.bloomFilter` and every warehouse's
semi-join pushdown).

Why a DataFrame bloom and not `DataFrameStatFunctions.bloomFilter`: the
built-in collects a JVM sketch to the driver with engine-private hashing
— unusable as a checkpointable artifact and unverifiable by the DuckDB
oracle. This one is a <= n_bits/32 row table of integer words built with
ONE map-side-combined bit_or aggregation: mergeable (bit_or of two
filters = filter of the union), persistable as parquet, broadcastable,
and bit-identical across engines (md5-derived positions, the cms_cell
pattern).

Packing: 32 bits per BIGINT word — staying below bit 31 keeps every
shift/mask in positive-signed territory on BOTH engines (1 << 63 wraps
negative in Java and DuckDB alike; not worth the sign-semantics risk
for 2x table size on an already-tiny table).

Scale shape, graded for 100 TB: the build shuffles at most
depth * n_bits/32 words TOTAL (fixed-size, like the count-min build);
membership probes join the BROADCAST filter on word index and verdict
per item with an all-positions conjunction — the probed corpus never
reshuffles. False-positive rate follows the standard (1-e^{-dn/m})^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 4096
BLOOM_DEPTH = 3
_WORD = 32


def _position(item: F.Column, row: F.Column) -> F.Column:
    """md5-derived bit position of `item` under hash row `row` (48-bit
    fold mod n_bits) — cross-engine identical (cms_cell discipline)."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", row.cast("string"), item.cast("string"))),
        1, 12), 16, 10).cast("bigint")
    return h % BLOOM_BITS


def bloom_build(df: DataFrame, item_col: str,
                depth: int = BLOOM_DEPTH) -> DataFrame:
    """(word, bits): the filter as <= BLOOM_BITS/32 BIGINT words. ONE
    groupBy with bit_or — map-side combined, fixed-size shuffle."""
    rows = (df.select(F.col(item_col).alias("item"))
            .select("item", F.explode(
                F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")))
    return (rows.select(_position(F.col("item"), F.col("row"))
                        .alias("pos"))
            # SQL shiftleft (python F.shiftleft wants a literal count)
            .select(F.expr(f"cast(pos div {_WORD} as int)").alias("word"),
                    F.expr(f"shiftleft(cast(1 as bigint),"
                           f" cast(pos % {_WORD} as int))").alias("mask"))
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """bit_or of two filters == the filter of the union of their inputs
    (property-tested)."""
    return (a.unionByName(b).groupBy("word")
            .agg(F.bit_or("bits").alias("bits")))


def bloom_might_contain(bloom: DataFrame, probes: DataFrame,
                        item_col: str,
                        depth: int = BLOOM_DEPTH) -> DataFrame:
    """(item, might_contain): TRUE iff every one of the item's depth bit
    positions is set. Missing words are empty (the filter table is
    sparse) — a left join with bits coalesced to 0, the same contract
    fix cms_estimate carries."""
    p = (probes.select(F.col(item_col).alias("item")).distinct()
         .select("item", F.explode(
             F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")))
    probed = (p.select("item", _position(F.col("item"), F.col("row"))
                       .alias("pos"))
              .select("item",
                      F.expr(f"cast(pos div {_WORD} as int)")
                      .alias("word"),
                      F.expr(f"shiftleft(cast(1 as bigint),"
                             f" cast(pos % {_WORD} as int))")
                      .alias("mask")))
    hit = (F.coalesce(F.col("bits"), F.lit(0).cast("bigint"))
           .bitwiseAND(F.col("mask")) != 0).cast("int")
    return (probed.join(F.broadcast(bloom), "word", "left")
            .select("item", hit.alias("hit"))
            .groupBy("item")
            .agg((F.sum("hit") == depth).alias("might_contain")))
