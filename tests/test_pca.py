"""PCA top component (functions/pca.py): exact-integer covariance,
pinned power iteration, anisotropy readout."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.functions.pca import pca_top_component


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])


def test_dominant_direction_recovered(spark):
    """Variance concentrated on an axis pair: the 8-round iterate must
    align with the true top direction and report a dominant share."""
    vecs = []
    for i in range(60):
        a = (i % 7) - 3                      # strong spread
        b = ((i % 3) - 1) * 0.01             # weak spread
        vecs.append([a, a, b, 0.0])          # top dir = (1,1,0,0)/sqrt(2)
    out = pca_top_component(_emb(spark, vecs)).collect()
    v = {r.dim: r.v_e6 for r in out if r.dim >= 0}
    share = [r.v_e6 for r in out if r.dim == -1][0]
    vv = [v[i] / 1e6 for i in sorted(v)]
    n = math.sqrt(sum(x * x for x in vv))
    cos = abs((vv[0] + vv[1]) / math.sqrt(2) / n)
    assert cos > 0.999, vv
    assert share > 900_000          # >90% of variance on the top axis
    assert abs(n - 1.0) < 1e-6      # unit eigenvector


def test_summary_row_and_schema(spark):
    out = pca_top_component(_emb(spark, [[1.0, 2.0], [3.0, 4.0],
                                         [5.0, 6.5]])).collect()
    dims = sorted(r.dim for r in out)
    assert dims == [-1, 1, 2]
    assert all(r.n == 3 for r in out)
    # diagonal variances are nonnegative exact integers
    assert all(r.cdiag >= 0 for r in out if r.dim >= 0)


def test_degenerate_constant_cloud(spark):
    """All-identical vectors: zero covariance — no NaNs, share 0."""
    out = pca_top_component(_emb(spark, [[1.0, 1.0]] * 5)).collect()
    share = [r.v_e6 for r in out if r.dim == -1][0]
    assert share == 0
    assert all(r.cdiag == 0.0 for r in out if r.dim >= 0)


def test_null_and_empty_vectors_are_skipped(spark):
    """A malformed row must not abort the job (r9 review finding):
    null/empty embeddings are skipped; n counts only valid rows."""
    from pyspark.sql import Row as R

    df = spark.createDataFrame(
        [R(vec_id=0, embedding=[1.0, 2.0]),
         R(vec_id=1, embedding=[3.0, 5.0]),
         R(vec_id=2, embedding=[]),
         R(vec_id=3, embedding=None)],
        "vec_id long, embedding array<double>")
    out = pca_top_component(df).collect()
    assert all(r.n == 2 for r in out)
    assert sorted(r.dim for r in out) == [-1, 1, 2]


def test_ragged_widths_are_excluded(spark):
    """r10 ADVICE fix: rows at a non-contract width must not leak mixed
    dimensions into the moments. With dim pinned, only pinned-width rows
    count; with dim unset, the MODAL width wins (tie -> smaller)."""
    from pyspark.sql import Row

    from melt_spark.functions.pca import pca_top_component

    rows = [Row(vec_id=i, embedding=[float(i + 1), float(2 * i + 1)])
            for i in range(6)]
    rows += [Row(vec_id=10, embedding=[1.0, 2.0, 3.0]),   # ragged: d=3
             Row(vec_id=11, embedding=[9.0]),             # ragged: d=1
             Row(vec_id=12, embedding=None)]
    df = spark.createDataFrame(rows)

    pinned = pca_top_component(df, dim=2).collect()
    assert {r.dim for r in pinned} == {-1, 1, 2}
    assert all(r.n == 6 for r in pinned)

    modal = pca_top_component(df).collect()       # modal width is 2
    assert {(r.dim, r.n) for r in modal} == {(r.dim, r.n) for r in pinned}


def test_abtt_overlap_flags_and_contract(spark):
    """abtt_ann_overlap: k rows per query, in_raw is 0/1, and on a cloud
    DOMINATED by a common offset (the Mu & Viswanath regime) the
    corrected-space neighborhood genuinely differs from the raw one —
    raw cosines are all ~1 against the shared mean, corrected cosines
    re-rank by the residual structure."""
    from pyspark.sql import Row

    from melt_spark.functions.pca import abtt_ann_overlap

    # x_i = M + s_i*B + r_i: a dominant +/-B swing on dims 0-1 (the top
    # PC — deliberately NOT orthogonal to the all-ones power-iteration
    # start) drives RAW cosine grouping by sign(s); a small class
    # residual on dims 2-3 cross-cuts it and decides the CORRECTED
    # ranking once B is projected out
    rows = []
    for i in range(20):
        s = 1.0 if i % 2 == 0 else -1.0
        v = [5.0 + s * 40.0, 5.0 + s * 12.0, 5.0, 5.0]
        if i in (0, 7):               # a residual class crossing signs
            v[2] += 2.0
        else:                         # strictly-ordered dim-3 jitter:
            v[3] += 0.3 + 0.01 * i    # no exact corrected-space ties
        rows.append(Row(vec_id=i, embedding=v))
    out = abtt_ann_overlap(spark.createDataFrame(rows), dim=4, k=3,
                           n_queries=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.in_raw in (0, 1)
        assert -1.0 - 1e-9 <= r.cos <= 1.0 + 1e-9
    assert set(by_q) == {0, 1}
    assert all(len(v) == 3 for v in by_q.values())
    assert all(sorted(r.rank for r in v) == [1, 2, 3]
               for v in by_q.values())
    # the offset dominates raw cosines; after correction at least one
    # query's top-3 set changes (residuals disagree with the mean)
    assert any(r.in_raw == 0 for r in out)
