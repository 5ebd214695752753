"""Exact heavy hitters at scale: per-partition Misra-Gries candidates +
exact recount — the two-pass pattern that finds every item above a
frequency threshold WITHOUT a full groupBy over the long tail.

Background (public): Misra & Gries, "Finding repeated elements" (Sci.
Comput. Program. 1982); the merge/candidate analysis follows the
SpaceSaving line (Metwally et al., ICDE 2005). The pigeonhole guarantee:
if an item's global count exceeds N/m, its count must exceed n_p/m in at
least one partition p (else summing the per-partition bounds caps it at
N/m) — and per-partition Misra-Gries with m counters surfaces every item
whose partition count exceeds n_p/m. So the UNION of per-partition
candidate sets is a SUPERSET of all items with global frequency > N/m;
an exact recount restricted to candidates then yields the TRUE heavy
hitters and exact counts — deterministic output, so it oracle-checks
against a plain GROUP BY ... HAVING, while touching only
O(partitions * m) candidate state instead of one counter per distinct
item.

Why this shape at 100 TB: a token-frequency groupBy over a web corpus
keys on BILLIONS of distinct rare tokens — the shuffle is dominated by
the long tail you are about to discard. Here pass 1 is mapInPandas
(Arrow-batched, zero shuffle) emitting <= m candidates per partition;
pass 2 re-scans with a BROADCAST semi-join on the (tiny) candidate union
and aggregates only surviving rows. The tail never enters a shuffle.

The candidate pass is per-partition imperative state — exactly the seam
the driver brief reserves for Pandas-backed execution (mapInPandas); the
recount stays pure Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_partition(m: int, col: str):
    """Batched Misra-Gries over one partition's Arrow batches: each batch
    is counted VECTORIZED (value_counts), merged into the summary, then
    the summary is reduced back to <= m counters by subtracting the
    (m+1)-th largest count from everything (the mergeable-summaries merge
    step — Agarwal et al., PODS 2012 — which preserves the N/(m+1) error
    bound, hence the candidate-superset guarantee). Python cost is
    O(distinct-per-batch + m log m) per batch, not O(rows)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > m:
                d = sorted(counters.values(), reverse=True)[m]
                counters = {k: c - d for k, c in counters.items()
                            if c - d > 0}
        yield pd.DataFrame({"candidate": list(counters.keys())},
                           dtype="object")
    return run


def heavy_hitters(df: DataFrame, col: str, phi: float = 0.01) -> DataFrame:
    """(item, n) for every item with count > phi * N, exactly.
    m = ceil(1/phi) counters per partition (the pigeonhole bound)."""
    import math

    m = math.ceil(1.0 / phi)
    src = df.select(F.col(col).cast("string").alias(col))
    cands = (src.mapInPandas(_mg_partition(m, col), "candidate string")
             .distinct())
    n_total = src.count()
    exact = (src.join(F.broadcast(cands),
                      src[col] == F.col("candidate"), "left_semi")
             .groupBy(col).agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > phi * n_total))
    return exact.select(F.col(col).alias("item"), "n")


def gini_concentration(df: DataFrame, key_cols: list[str],
                       id_col: str, value_col: str) -> DataFrame:
    """Per-key Gini coefficient of the per-entity value distribution
    (Gini 1912; the Lorenz-curve summary) — the concentration readout
    behind "what share of revenue comes from how few users" and the
    skew diagnostic's distributional complement.

    Entities aggregate first (one map-side-combined groupBy on
    (keys, id)); the sorted-order statistic uses the standard
    G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) with r the per-key row_number
    over (value, id) — ties carry equal values, so the arbitrary order
    within a tie cannot change Σ r·x + its mirror; the (value, id)
    total order just makes the plan deterministic. Rank-weighted sums
    ride DECIMAL(38) (r·x overflows BIGINT at replication scale).

    Returns (keys..., n_entities, total, gini_ppm): exact counts/sums,
    the coefficient in ppm rounded once. Degenerate keys (zero total)
    emit gini_ppm = 0.

    Scale shape: entity aggregate + one per-key rank window
    (distributes; skewed keys pay their own sort, the exact-rank
    floor) + one map-side-combined fold."""
    per = (df.groupBy(*key_cols, F.col(id_col).alias("__id"))
           .agg(F.sum(value_col).cast("long").alias("__x")))
    w = Window.partitionBy(*key_cols).orderBy("__x", "__id")
    ranked = per.withColumn("__r", F.row_number().over(w))
    dec = "decimal(38,0)"
    agg = (ranked.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_entities"),
                F.sum("__x").cast("bigint").alias("total"),
                F.sum((F.col("__r") * F.col("__x")).cast(dec))
                .alias("__srx")))
    nd = F.col("n_entities").cast("double")
    tot = F.col("total").cast("double")
    g = ((F.lit(2.0) * F.col("__srx").cast("double")
          - (nd + F.lit(1.0)) * tot) / (nd * tot))
    return agg.select(
        *key_cols, "n_entities", "total",
        F.when(F.col("total") > 0,
               F.round(g * F.lit(1_000_000.0))).otherwise(F.lit(0))
        .cast("bigint").alias("gini_ppm"))
