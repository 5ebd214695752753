"""Product quantization (functions/pq.py): codebook self-encoding,
packing bounds, and error sanity."""

from pyspark.sql import functions as F

from melt_spark.functions.pq import pq_codebooks, pq_encode
from melt_spark.sources.parquet import read_table


def test_codebook_seeds_encode_to_themselves(spark, sf_dir):
    """A vector that IS codebook entry j must pick code j in every
    subspace with zero reconstruction error."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = pq_encode(emb, pq_codebooks(emb)).cache()
    seeds = out.filter((F.col("vec_id") % 31 == 0)
                       & (F.col("vec_id") < 16 * 31))
    rows = seeds.collect()
    assert rows
    for r in rows:
        j = r.vec_id // 31
        expected = sum(j * 16 ** m for m in range(8))
        assert r.packed_code == expected, r
        assert r.recon_err == 0.0, r
    out.unpersist()


def test_packed_code_bounds_and_coverage(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    out = pq_encode(emb, pq_codebooks(emb)).cache()
    assert out.count() == emb.count()
    bad = out.filter((F.col("packed_code") < 0)
                     | (F.col("packed_code") >= 16 ** 8)
                     | (F.col("recon_err") < 0))
    assert bad.count() == 0
    # compression is real: distinct packed codes <= ks^M but output
    # keeps one row per vector
    assert out.select("vec_id").distinct().count() == emb.count()
    out.unpersist()


def test_error_shrinks_with_bigger_codebook(spark, sf_dir):
    """More codebook entries can only reduce (or keep) every vector's
    reconstruction error — the argmin searches a superset."""
    emb = read_table(spark, sf_dir, "embeddings")
    small = pq_encode(emb, pq_codebooks(emb, ks=4), ks=4) \
        .select("vec_id", F.col("recon_err").alias("e_small"))
    big = pq_encode(emb, pq_codebooks(emb, ks=16), ks=16) \
        .select("vec_id", F.col("recon_err").alias("e_big"))
    j = small.join(big, "vec_id")
    worse = j.filter(F.col("e_big") > F.col("e_small") + 1e-12)
    assert worse.count() == 0
