"""Hashed n-gram importance weighting for data selection — the DSIR
recipe (public: Xie, Santurkar, Ma, Liang, "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023, arXiv:2302.03169):
score each raw document by the log-likelihood ratio of its hashed-bigram
bag under a TARGET distribution vs the RAW distribution, then keep the
top-weighted documents — "make the kept set look like the target domain"
with two tiny bag-of-hashed-ngrams models instead of a neural scorer.

Spark-first shape, graded for 100 TB:
  * bigrams hash to B buckets AT THE MAP SIDE (md5-derived mod-B int),
    so n-gram TEXT never enters an exchange — the digest-shuffle
    discipline every dedup/LM operator here follows;
  * the two models aggregate to B rows each; the per-bucket log-ratio
    table is B rows total and BROADCASTS to the scoring join;
  * per-document scores fold the doc's own buckets — shuffles carry
    (doc_id, bucket:int, count:long) triples only;
  * selection is an orderBy(limit k) = TakeOrderedAndProject (per-
    partition heaps, no global sort).

Determinism (the oracle gate): bucket ids are the 48-bit md5 fold mod B
(bit-identical in DuckDB); ln is NOT correctly rounded across engines,
so each bucket's log-ratio is rounded to 9 decimals BEFORE use and each
document folds (count x ratio) contributions in bucket order (the
BM25/PSI pattern); the final score rounds again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .util import one_partition

N_BUCKETS = 256


def hashed_bigram_counts(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         n_buckets: int = N_BUCKETS) -> DataFrame:
    """(id, bucket, c): per-document hashed-bigram bucket counts. The
    bigram string exists only inside the projection that hashes it.
    The explode+hash is per-row CPU — spread a few-file input across
    cores first (no-op on a many-file 100 TB table; r12, guide §2.6)."""
    from .sketches import kmv_hash
    from .util import spread_input

    docs = spread_input(docs, id_col)
    toks = F.split(F.col(text_col), " ")
    idx = F.when(F.size(toks) >= 2,
                 F.sequence(F.lit(1), F.size(toks) - 1)) \
           .otherwise(F.array().cast("array<int>"))
    bg = F.transform(idx, lambda i: F.concat(
        F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)))
    return (docs.select(F.col(id_col).alias("id"),
                        F.explode(bg).alias("bigram"))
            .select("id", (kmv_hash("bigram") % n_buckets).cast("int")
                    .alias("bucket"))
            .groupBy("id", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def bucket_log_ratios(target: DataFrame, raw: DataFrame,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, lr): smoothed per-bucket log-likelihood ratio
    ln((ct+0.5)/(T+B/2)) - ln((cr+0.5)/(R+B/2)), rounded to 9 decimals —
    the whole model is B rows (broadcast-sized by construction)."""
    spark = target.sparkSession
    bins = spark.range(n_buckets).select(F.col("id").cast("int")
                                         .alias("bucket"))
    t = (target.groupBy("bucket").agg(F.sum("c").alias("ct")))
    r = (raw.groupBy("bucket").agg(F.sum("c").alias("cr")))
    dense = (bins.join(t, "bucket", "left").join(r, "bucket", "left")
             .select("bucket",
                     F.coalesce("ct", F.lit(0)).cast("double").alias("ct"),
                     F.coalesce("cr", F.lit(0)).cast("double").alias("cr")))
    tot = dense.agg(F.sum("ct").alias("T"), F.sum("cr").alias("R"))
    half = n_buckets * 0.5
    lr = F.round(
        F.log((F.col("ct") + 0.5) / (F.col("T") + half))
        - F.log((F.col("cr") + 0.5) / (F.col("R") + half)), 9)
    return (dense.crossJoin(F.broadcast(tot))
            .select("bucket", lr.alias("lr")))


def importance_topk(raw_counts: DataFrame, ratios: DataFrame,
                    k: int = 100) -> DataFrame:
    """Top-k raw documents by summed log-importance. Each document folds
    its (bucket, c x lr) contributions in bucket order; ties break on id
    for a total order. Output: id, n_grams, logw, rank."""
    scored = (raw_counts.join(F.broadcast(ratios), "bucket")
              .groupBy("id")
              .agg(F.sum("c").alias("n_grams"),
                   F.round(F.aggregate(
                       F.array_sort(F.collect_list(
                           F.struct("bucket",
                                    (F.col("c") * F.col("lr"))
                                    .alias("contrib")))),
                       F.lit(0.0),
                       lambda acc, s: acc + s["contrib"]), 9)
                   .alias("logw")))
    top = scored.orderBy(F.desc("logw"), F.asc("id")).limit(k)
    from pyspark.sql.window import Window
    w = Window.partitionBy(one_partition(F.col("logw")))\
        .orderBy(F.desc("logw"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w))
