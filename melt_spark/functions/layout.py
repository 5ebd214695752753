"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning, the technique behind Delta Lake's OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite (both public implementations).

Why it matters at 100 TB: parquet readers skip row groups via min/max
stats, but sorting by ONE key only prunes predicates on that key. Mapping
k keys onto one dimension with bit interleaving keeps rows that are close
in ANY key close in the file order, so min/max pruning works for
predicates on EITHER key — the classic space-filling-curve trade.

Everything here is integer bit arithmetic (shift/mask/or), so z-values
are bit-exact in any engine and the suite's oracle restates them in
DuckDB SQL directly.

    zvalue(x, y, bits)   -- interleave the low `bits` of two non-negative
                            ints: x in even positions, y in odd
    zorder_by(df, cols)  -- range-partition + sort by the z-value: the
                            write-side layout pass (repartitionByRange
                            samples quantiles, so output files tile the
                            curve); drop the helper column before write

tests/test_layout.py proves the pruning claim mechanically: after
zorder_by, a filter on either dimension touches a strict subset of files
(via input_file_name), and z-values round-trip bit-for-bit against a
Python reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns into one BIGINT (x -> even bit positions, y -> odd).
    2*bits <= 62 keeps the result positive in a signed 64-bit long."""
    if not 0 < bits <= 31:
        raise ValueError("bits must be in 1..31")
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)),
                           2 * i + 1))
    return z


def zvalue_py(x: int, y: int, bits: int = 16) -> int:
    """Driver-side reference of zvalue for tests."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_by(df: DataFrame, x: str, y: str, bits: int = 16,
              num_partitions: int | None = None) -> DataFrame:
    """Cluster rows along the Morton curve of (x, y): range-partition by
    z-value (Spark samples the distribution, so partitions tile the curve
    evenly) and sort within partitions — exactly what a layout-rewrite
    job does before writing parquet. The helper column is dropped; the
    ordering is carried by the partitioning."""
    with_z = df.withColumn("__z", zvalue(x, y, bits))
    parts = [num_partitions] if num_partitions else []
    return (with_z.repartitionByRange(*parts, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z"))


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB restatement: same interleave as an integer fold."""
    return ("list_reduce(list_transform(generate_series(0, "
            f"{bits - 1}), i -> ((({x} >> i) & 1) << (2*i)) + "
            f"((({y} >> i) & 1) << (2*i + 1))), (a, b) -> a + b)")
