"""JL random projection (functions/projection.py) and count-min sketch
(functions/sketches.py cms_*): the statistical guarantees as assertions."""

from pyspark.sql import functions as F

from melt_spark.functions.projection import jl_distortion, jl_matrix, jl_sign
from melt_spark.functions.sketches import (cms_build, cms_estimate,
                                           cms_merge)
from melt_spark.sources.parquet import read_table


def test_sign_matrix_is_pm_one_and_balanced():
    m = jl_matrix(16, 64)
    flat = [s for row in m for s in row]
    assert set(flat) <= {-1, 1}
    # md5 parity is unbiased: the 1024-entry matrix can't be degenerate
    pos = sum(1 for s in flat if s == 1)
    assert 400 < pos < 624
    # deterministic
    assert jl_sign(3, 7) == jl_sign(3, 7)
    assert m == jl_matrix(16, 64)


def test_distortion_concentrates_near_one(spark, sf_dir):
    """JL with k=16: norms are preserved in expectation; assert every
    fixture vector lands in a wide [0.3, 2.0] envelope and the mean
    distortion is close to 1 — catches a wrong scale factor (sqrt(k)
    errors give a mean of 0.25 or 4) or a broken fold."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = jl_distortion(emb, "embedding", in_dim=64, out_dim=16)
    stats = out.agg(F.min("distortion").alias("lo"),
                    F.max("distortion").alias("hi"),
                    F.avg("distortion").alias("mean")).collect()[0]
    assert 0.3 <= stats.lo and stats.hi <= 2.0
    assert 0.8 <= stats.mean <= 1.2


def test_cms_never_underestimates(spark, sf_dir):
    """The count-min guarantee: est(x) >= true count, for every item."""
    ev = read_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    est = cms_estimate(sketch, ev, "user_id")
    exact = (ev.groupBy(F.col("user_id").cast("string").alias("item"))
             .agg(F.count(F.lit(1)).alias("ex")))
    j = est.join(exact, "item")
    assert j.count() == exact.count()
    assert j.filter(F.col("cms_est") < F.col("ex")).count() == 0


def test_cms_unseen_probes_survive_and_floor_at_zero(spark):
    """The sketch table is sparse; probes for items the stream never saw
    must still appear in the output (left join, missing cells = 0), with
    the estimate floored at 0 — never NULL, never dropped, and (with a
    near-empty sketch) exactly 0 for items whose cells are all empty."""
    from pyspark.sql import Row

    stream = spark.createDataFrame([Row(item=f"seen_{i % 3}")
                                    for i in range(30)])
    sketch = cms_build(stream, "item")
    probes = spark.createDataFrame(
        [Row(item=f"seen_{i}") for i in range(3)]
        + [Row(item=f"unseen_{i}") for i in range(40)])
    est = {r.item: r.cms_est for r in
           cms_estimate(sketch, probes, "item").collect()}
    assert len(est) == 43          # nothing vanishes
    assert all(v is not None and v >= 0 for v in est.values())
    assert all(est[f"seen_{i}"] == 10 for i in range(3))
    # 3 distinct items fill <= 12 of 1024 cells: at least one unseen
    # probe must miss every filled cell in some hash row -> estimate 0
    assert any(est[f"unseen_{i}"] == 0 for i in range(40))


def test_cms_merge_equals_sketch_of_concat(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = {(r.row, r.cell): r.total
              for r in cms_merge(cms_build(a, "user_id"),
                                 cms_build(b, "user_id")).collect()}
    direct = {(r.row, r.cell): r.total
              for r in cms_build(ev, "user_id").collect()}
    assert merged == direct


def test_cms_sketch_is_fixed_size(spark, sf_dir):
    """The scale property: sketch rows <= depth * width regardless of
    stream size, and each depth row sums to the stream length."""
    ev = read_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    assert sketch.count() <= 4 * 256
    n = ev.count()
    sums = sketch.groupBy("row").agg(F.sum("total").alias("s")).collect()
    assert len(sums) == 4 and all(r.s == n for r in sums)
