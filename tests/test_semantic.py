"""SemDeDup-style semantic dedup (functions/semantic.py): keep-rule
invariants, threshold monotonicity, and kmeans-centroid compatibility."""

from pyspark.sql import functions as F

from melt_spark.functions.semantic import (semantic_dedup,
                                           semantic_dedup_summary)
from melt_spark.functions.similarity import cosine
from melt_spark.sources.parquet import read_table


def test_every_vector_gets_a_verdict(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    v = semantic_dedup(emb, threshold=0.3, every=50)
    assert v.count() == emb.count()
    assert v.select("vec_id").distinct().count() == emb.count()
    assert v.filter(~F.col("is_dup").isin(0, 1)).count() == 0


def test_cluster_minimum_always_survives(spark, sf_dir):
    """The (csim, vec_id)-minimal member of each cluster has no dominator,
    so it can never be dropped — each cluster keeps >= 1 exemplar."""
    v = semantic_dedup(read_table(spark, sf_dir, "embeddings"),
                       threshold=0.3, every=50).cache()
    mins = v.groupBy("list_id").agg(
        F.min_by("vec_id", F.struct("csim", "vec_id")).alias("vec_id"))
    dropped_min = mins.join(v.filter(F.col("is_dup") == 1), "vec_id")
    assert dropped_min.count() == 0
    kept_per_cluster = (v.filter(F.col("is_dup") == 0)
                        .groupBy("list_id").count())
    assert kept_per_cluster.filter(F.col("count") < 1).count() == 0
    v.unpersist()


def test_threshold_monotonicity(spark, sf_dir):
    """Raising the threshold can only shrink the drop set (the dominance
    order is threshold-independent; only the neighborhood shrinks)."""
    emb = read_table(spark, sf_dir, "embeddings")
    loose = semantic_dedup(emb, threshold=0.2, every=50)
    tight = semantic_dedup(emb, threshold=0.4, every=50)
    n_loose = loose.filter(F.col("is_dup") == 1).count()
    n_tight = tight.filter(F.col("is_dup") == 1).count()
    assert n_tight <= n_loose
    # and tight's drop set is a subset of loose's
    t_ids = tight.filter(F.col("is_dup") == 1).select("vec_id")
    only_tight = t_ids.join(
        loose.filter(F.col("is_dup") == 1).select("vec_id"),
        "vec_id", "left_anti")
    assert only_tight.count() == 0


def test_dropped_vectors_have_close_surviving_witness(spark, sf_dir):
    """Soundness: every dropped vector has SOME same-cluster neighbor
    within the threshold (the witness that dominated it)."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = semantic_dedup(emb, threshold=0.3, every=50).cache()
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("emb"))
    dropped = (v.filter(F.col("is_dup") == 1)
               .join(vecs, "vec_id")
               .select("vec_id", "list_id", "emb"))
    others = (v.join(vecs, "vec_id")
              .select(F.col("vec_id").alias("o_id"),
                      F.col("list_id").alias("o_list"),
                      F.col("emb").alias("o_emb")))
    witnesses = (dropped.join(
        others, (F.col("list_id") == F.col("o_list"))
        & (F.col("vec_id") != F.col("o_id")))
        .filter(cosine(F.col("emb"), F.col("o_emb")) >= 0.3)
        .select("vec_id").distinct())
    assert witnesses.count() == dropped.select("vec_id").distinct().count()
    v.unpersist()


def test_summary_consistent_with_verdicts(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    v = semantic_dedup(emb, threshold=0.3, every=50).cache()
    s = semantic_dedup_summary(v).cache()
    assert s.agg(F.sum("n_members")).first()[0] == emb.count()
    assert (s.agg(F.sum("n_dropped")).first()[0]
            == v.filter(F.col("is_dup") == 1).count())
    # exemplar is a kept member of its own cluster
    ex = s.select("list_id", F.col("exemplar_id").alias("vec_id"))
    bad = ex.join(v, ["list_id", "vec_id"]).filter(F.col("is_dup") == 1)
    assert bad.count() == 0
    s.unpersist(); v.unpersist()


def test_kmeans_centroids_drop_in(spark, sf_dir):
    """Trained centroids slot into the same plan (list_id contract)."""
    from melt_spark.functions.ivf import kmeans_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=5, seed=11)
    v = semantic_dedup(emb, threshold=0.3, centroids=cents)
    assert v.count() == emb.count()
    assert v.select("list_id").distinct().count() <= 5
