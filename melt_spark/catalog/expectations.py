"""Data-quality expectation checks — the dbt-test / Great-Expectations
battery as engine-native operators, each returning a violation COUNT (0 =
pass) so a sync pipeline can gate promotion on data content, not just row
counts (the natural extension of the reference's verify loop, which stops
at count/checksum parity — src/jdbc/melt.clj:525-571).

Every check is one aggregation or one join — no row-level materialization
of violations on the happy path; `sample` variants exist for debugging
but the GATE is the count.

Scale notes: uniqueness is a groupBy on the key (map-side combined);
referential integrity is a left-anti join (broadcast when the parent is
a dimension); accepted-values is a scan-side filter. All shapes hold at
any fact-table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations: rows beyond the first per key (Σ (cnt − 1) over
    duplicated keys)."""
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
            .agg(F.coalesce(F.sum(F.when(F.col("c") > 1,
                                         F.col("c") - 1)), F.lit(0))
                 .cast("bigint").alias("n_violations")))


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.agg((F.count(F.lit(1)) - F.count(col))
                  .cast("bigint").alias("n_violations"))


def expect_accepted_values(df: DataFrame, col: str,
                           values: list) -> DataFrame:
    """Violations: non-null values outside the accepted set."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(values)
    return df.agg(F.coalesce(F.sum(F.when(bad, 1)), F.lit(0))
                  .cast("bigint").alias("n_violations"))


def expect_references(child: DataFrame, child_col: str,
                      parent: DataFrame, parent_col: str) -> DataFrame:
    """Referential integrity: NON-NULL child keys with no parent row.
    Null keys are excluded (they are expect_not_null's finding — and a
    left-anti join would otherwise count every null as an orphan, since
    null never equi-matches)."""
    orphans = (child.select(F.col(child_col).alias("k"))
               .filter(F.col("k").isNotNull())
               .join(parent.select(F.col(parent_col).alias("k"))
                     .distinct(), "k", "left_anti"))
    return orphans.agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_violations"))


def expect_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Violations: non-null values outside [lo, hi]."""
    c = F.col(col)
    bad = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    return df.agg(F.coalesce(F.sum(F.when(bad, 1)), F.lit(0))
                  .cast("bigint").alias("n_violations"))


def run_battery(checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union named single-row check results into one report:
    (check, n_violations, passed)."""
    out = None
    for name, res in checks:
        row = res.select(F.lit(name).alias("check"), "n_violations",
                         (F.col("n_violations") == 0).alias("passed"))
        out = row if out is None else out.unionByName(row)
    return out
