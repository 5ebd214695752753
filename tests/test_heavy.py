"""Exact heavy hitters (functions/heavy.py): equality with the plain
groupBy answer, and the candidate-superset guarantee under skew and many
partitions."""

from pyspark.sql import functions as F

from melt_spark.functions.heavy import heavy_hitters
from melt_spark.sources.parquet import read_table


def _exact(df, col, phi):
    n = df.count()
    return {(r[0], r[1]) for r in
            df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > phi * n).collect()}


def test_matches_plain_groupby_on_tokens(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    got = {(r.item, r.n) for r in heavy_hitters(toks, "tok", 0.01).collect()}
    assert got == _exact(toks, "tok", 0.01)
    assert got  # fixture vocabulary guarantees hitters exist


def test_skewed_many_partitions(spark):
    """Zipf-ish stream spread over 32 partitions: the per-partition MG
    candidate union must still recover every true hitter exactly."""
    n = 20_000
    # item i appears ~ n/(i+1) times: a few heavy, long tail
    df = (spark.range(n).repartition(32)
          .select((F.floor(F.lit(float(n)) /
                           (F.col("id") % 997 + 1)) % 50).alias("item")))
    got = {(r.item, r.n) for r in heavy_hitters(df, "item", 0.02).collect()}
    assert got == _exact(df.select(F.col("item").cast("string")
                                   .alias("item")), "item", 0.02)


def test_no_hitters_above_threshold(spark):
    """Uniform data with phi above every frequency -> empty, not error."""
    df = spark.range(1000).select((F.col("id") % 500).alias("item"))
    assert heavy_hitters(df, "item", 0.5).count() == 0


def test_gini_extremes_and_known_value(spark):
    """Equal shares -> G = (n-1)/n-ish small bound 0; total
    concentration -> G -> (n-1)/n; hand case [1,2,3,4] -> 0.25."""
    from melt_spark.functions.heavy import gini_concentration

    rows = ([("eq", i, 10) for i in range(10)]
            + [("one", 0, 100)] + [("one", i, 0) for i in range(1, 10)]
            + [("hand", i, v) for i, v in enumerate([1, 2, 3, 4])])
    df = spark.createDataFrame(rows, "k string, uid long, v long")
    out = {r.k: r for r in
           gini_concentration(df, ["k"], "uid", "v").collect()}
    assert out["eq"].gini_ppm == 0
    # all value on one of 10 entities: G = (n-1)/n = 0.9
    assert out["one"].gini_ppm == 900_000
    # [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert out["hand"].gini_ppm == 250_000
    assert out["hand"].total == 10
