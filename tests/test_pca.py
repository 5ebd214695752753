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
