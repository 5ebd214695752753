"""IVF index persistence (functions/ivf.py write_index/ivf_topk_indexed):
the persisted index must (a) return exactly the in-memory ivf_topk answer
and (b) physically prune unprobed list directories at the file level —
the build-once / probe-many lifecycle a serving deployment runs."""

from pyspark.sql import functions as F

from melt_spark.functions.ivf import ivf_topk, ivf_topk_indexed, write_index
from melt_spark.sources.parquet import read_table


def test_indexed_equals_in_memory_and_prunes(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    write_index(emb, idx)

    queries = emb.filter(F.col("vec_id") < 3)
    mem = {(r.query_id, r.rank): r.neighbor_id
           for r in ivf_topk(emb, queries, k=5, nprobe=2).collect()}
    disk = {(r.query_id, r.rank): r.neighbor_id
            for r in ivf_topk_indexed(spark, idx, queries,
                                      k=5, nprobe=2).collect()}
    assert disk == mem and mem

    # file-level pruning: the probed plan reads fewer index files
    lists = spark.read.parquet(f"{idx}/lists")
    total = len(lists.inputFiles())
    n_lists = lists.select("list_id").distinct().count()
    assert total >= n_lists  # one+ file per list directory
    probed = (lists.filter(F.col("list_id").isin([0, 1]))
              .select(F.input_file_name().alias("f")).distinct().count())
    assert probed < total
    assert probed <= 2 * max(1, total // n_lists + 1)
