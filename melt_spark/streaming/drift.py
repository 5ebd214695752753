"""Streaming PSI drift monitor — per-micro-batch population-stability
monitoring against a fixed baseline.

Background (public): PSI is the standard production drift gate
(credit-scoring lineage; < 0.1 stable, > 0.25 shifted) — the batch
variant is plans/analytics_suite.q_psi_drift. The streaming insight is
that PSI's sufficient statistic is the per-bin INTEGER count vector, a
commutative monoid under addition: per-micro-batch bin counts merge by
summation into exactly the counts a batch scan of the same data yields,
so the streaming monitor is bit-identical to the batch monitor at every
trigger (tests/test_streaming_drift.py proves it with foreachBatch).

Spark-first shape, graded for 100 TB/day streams:
  * each micro-batch computes its own fixed-size (<= n_bins rows) count
    vector with one map-side-combined groupBy — the only state that ever
    leaves an executor is n_bins integers per batch;
  * the accumulated state is n_bins integers TOTAL, so driver-side
    accumulation is the intended fixed-memory pattern (same argument as
    the count-min foreachBatch merge in test_streaming_sketch.py), and
    the baseline is a broadcast-sized constant;
  * the PSI fold itself is O(n_bins) arithmetic — monitoring cost is
    independent of stream volume by construction.

Determinism: counts are exact integers; the PSI restatement here follows
the batch query's ln discipline (per-bin contributions rounded to 9
decimals, folded in bin order, total rounded again) so streaming and
batch totals compare exactly, not approximately.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_counts(df: DataFrame, value_col: str, bin_width: float,
               n_bins: int) -> DataFrame:
    """(bin, n): fixed-width histogram counts with the final bin catching
    the right tail — the mergeable sufficient statistic of PSI. Same
    binning expression as q_psi_drift.

    Both tails clamp (r5 ADVICE fix): negative values floor into bin 0
    just as the right tail folds into the last bin. Without the lower
    clamp, bin < 0 rows Python-wrapped into the LAST bin in
    merge_into's acc[r.bin] while counts_vector silently dropped them —
    the streaming and batch vectors diverged exactly where this module
    claims bit-identical equality."""
    b = (F.greatest(F.lit(0),
                    F.least(F.floor(F.col(value_col) / bin_width),
                            F.lit(n_bins - 1))).cast("int"))
    return (df.select(b.alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))


def counts_vector(df: DataFrame, value_col: str, bin_width: float,
                  n_bins: int) -> list[int]:
    """Dense n_bins-length count list (driver-side; n_bins is small by
    contract)."""
    got = {r.bin: r.n for r in
           bin_counts(df, value_col, bin_width, n_bins).collect()}
    return [int(got.get(i, 0)) for i in range(n_bins)]


def merge_into(acc: list[int], batch_df: DataFrame, value_col: str,
               bin_width: float, n_bins: int) -> list[int]:
    """foreachBatch body: add one micro-batch's bin counts into the
    accumulated vector (in place; returns it for convenience)."""
    for r in bin_counts(batch_df, value_col, bin_width, n_bins).collect():
        acc[r.bin] += int(r.n)
    return acc


def psi_total(baseline: list[int], current: list[int]) -> float:
    """PSI between two dense integer count vectors with +0.5 smoothing —
    the exact arithmetic of q_psi_drift's total row (per-bin round(9),
    bin-order fold, final round(9)), restated driver-side where the
    n_bins-sized vectors already live."""
    if len(baseline) != len(current):
        raise ValueError("bin vectors differ in length")
    n_bins = len(baseline)
    ta = sum(baseline) + n_bins * 0.5
    tb = sum(current) + n_bins * 0.5
    total = 0.0
    for a, b in zip(baseline, current):
        p = (a + 0.5) / ta
        q = (b + 0.5) / tb
        total += round((p - q) * math.log(p / q), 9)
    return round(total, 9)


class PsiMonitor:
    """Accumulating streaming monitor: feed micro-batches, read the PSI
    against the fixed baseline after any trigger.

        mon = PsiMonitor(baseline_vec, bin_width=500.0)
        stream.writeStream.foreachBatch(
            lambda df, _id: mon.update(df, "o_totalprice")).start()
        ...
        mon.psi()   # current drift, exact vs a batch recompute
    """

    def __init__(self, baseline: list[int], bin_width: float):
        self.baseline = list(baseline)
        self.bin_width = bin_width
        self.counts = [0] * len(baseline)
        self.batches = 0

    def update(self, batch_df: DataFrame, value_col: str) -> None:
        merge_into(self.counts, batch_df, value_col,
                   self.bin_width, len(self.baseline))
        self.batches += 1

    def psi(self) -> float:
        return psi_total(self.baseline, self.counts)
