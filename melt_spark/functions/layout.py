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


# ---------------------------------------------------------------------------
# Hilbert curve — the better-locality space-filling curve. Z-order keeps
# bit-interleaved neighbors close but takes long diagonal jumps between
# quadrants; the Hilbert curve is fully contiguous (every step moves one
# cell), so range predicates touch strictly fewer curve ranges — the
# reason Databricks moved liquid clustering from Morton to Hilbert.
# Algorithm: the classic quadrant-rotation walk (Hilbert 1891; the
# iterative xy2d formulation popularized by Warren's "Hacker's Delight"
# / Wikipedia's convert-to-d loop).


def hilbert_value(x: Column | str, y: Column | str,
                  bits: int = 15) -> Column:
    """Hilbert d-index of a (x, y) cell on the 2^bits grid.

    The rotation state makes this a genuine FOLD (unlike zvalue's
    independent per-bit OR): state (x, y, d) packs into ONE BIGINT
    (x<<45 | y<<30 | d) and folds over the s = 2^(bits-1)..1 quadrant
    sizes with F.aggregate, so the expression tree stays constant-size
    instead of doubling per unrolled round, and DuckDB restates the
    identical fold as list_reduce over the same packed encoding
    (hilbert_sql). bits <= 15 keeps the packed state (15+15+30 bits)
    inside a signed 64-bit long — the same headroom rule as zvalue's
    2*bits <= 62. Pure integer shift/mask/xor — bit exact anywhere.
    """
    if not 0 < bits <= 15:
        raise ValueError("bits must be in 1..15 (packed state headroom)")
    mask = (1 << bits) - 1
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint") \
        .bitwiseAND(F.lit(mask))
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint") \
        .bitwiseAND(F.lit(mask))
    init = F.shiftleft(xc, 45) + F.shiftleft(yc, 30)
    ss = F.array(*[F.lit(1 << i).cast("bigint")
                   for i in range(bits - 1, -1, -1)])
    xy_m, d_m = F.lit(32767), F.lit((1 << 30) - 1)
    nm1 = F.lit((1 << bits) - 1).cast("bigint")  # the canonical n-1 flip

    def step(acc, s):
        xx = F.shiftright(acc, 45).bitwiseAND(xy_m)
        yy = F.shiftright(acc, 30).bitwiseAND(xy_m)
        d = acc.bitwiseAND(d_m)
        rx = F.when(xx.bitwiseAND(s) > 0, F.lit(1).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
        ry = F.when(yy.bitwiseAND(s) > 0, F.lit(1).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        xf = F.when(rx == 1, nm1 - xx).otherwise(xx)
        yf = F.when(rx == 1, nm1 - yy).otherwise(yy)
        nx = F.when(ry == 0, yf).otherwise(xx)
        ny = F.when(ry == 0, xf).otherwise(yy)
        return F.shiftleft(nx, 45) + F.shiftleft(ny, 30) + d2

    return F.aggregate(ss, init, step).bitwiseAND(d_m)


def hilbert_py(x: int, y: int, bits: int = 15) -> int:
    """Driver-side reference (the Wikipedia xy2d loop) for tests."""
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = ((1 << bits) - 1) - x
                y = ((1 << bits) - 1) - y
            x, y = y, x
        s //= 2
    return d


def hilbert_sql(x: str, y: str, bits: int = 15) -> str:
    """DuckDB restatement: the identical packed-BIGINT fold."""
    mask = (1 << bits) - 1
    init = (f"((({x}) & {mask}) << 45) + ((({y}) & {mask}) << 30)")
    ss = ", ".join(f"CAST({1 << i} AS BIGINT)"
                   for i in range(bits - 1, -1, -1))
    gx, gy = "((a >> 45) & 32767)", "((a >> 30) & 32767)"
    nm1 = mask  # the canonical n-1 flip (intermediates stay in [0, n))
    lam = (
        "(a, s) -> "
        f"((CASE WHEN ({gy} & s) = 0 "
        f" THEN (CASE WHEN ({gx} & s) > 0"
        f"  THEN {nm1} - {gy}"
        f"  ELSE {gy} END)"
        f" ELSE {gx} END) << 45)"
        f" + ((CASE WHEN ({gy} & s) = 0 "
        f" THEN (CASE WHEN ({gx} & s) > 0"
        f"  THEN {nm1} - {gx}"
        f"  ELSE {gx} END)"
        f" ELSE {gy} END) << 30)"
        " + (a & 1073741823)"
        f" + s * s * xor((CASE WHEN ({gx} & s) > 0"
        "  THEN 1 ELSE 0 END) * 3,"
        f" CASE WHEN ({gy} & s) > 0 THEN 1 ELSE 0 END)")
    return (f"(list_reduce(list_prepend(CAST({init} AS BIGINT), "
            f"[{ss}]), {lam}) & 1073741823)")
