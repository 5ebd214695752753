"""Training-shard export: Hive partitioning, partition pruning on read,
in-file ordering, file-size caps (functions/cleaning.export_corpus)."""

from pathlib import Path

import pyspark.sql.functions as F
import pytest

from melt_spark.functions.cleaning import assign_shards, export_corpus

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def exported(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string")
    sharded = assign_shards(df, n_shards=4)
    out = str(tmp_path / "corpus")
    export_corpus(sharded, out, max_records_per_file=25)
    return out


def test_export_layout_and_pruning(spark, exported):
    dirs = {p.name for p in Path(exported).iterdir() if p.is_dir()}
    assert dirs == {f"shard={i}" for i in range(4)}

    back = spark.read.parquet(exported)
    assert back.count() == 200

    # reading one shard must prune the other three at the directory level:
    # the scan's PartitionFilters must be non-empty and name the shard col
    one = back.filter(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "shard" in pf[0] and "PartitionFilters: []" not in pf[0]
    scanned = one.select(F.input_file_name().alias("f")).distinct().collect()
    assert scanned and all("shard=2" in r.f for r in scanned)


def test_export_file_caps_and_order(spark, exported):
    shard_dir = next(Path(exported).glob("shard=0"))
    parts = list(shard_dir.glob("*.parquet"))
    # ~50 rows per shard, capped at 25/file → at least 2 files
    assert len(parts) >= 2

    # rows inside each file are sorted by doc_id
    for f in parts:
        ids = [r.doc_id for r in
               spark.read.parquet(str(f)).select("doc_id").collect()]
        assert ids == sorted(ids)


def test_export_codec_tradeoff(spark, sf_dir, tmp_path):
    """Storage-layout evidence: zstd shards are materially smaller than
    snappy on text-heavy data, and both round-trip identically — the
    compression knob a 100 TB export tunes first."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    sizes = {}
    for codec in ("snappy", "zstd"):
        out = str(tmp_path / codec)
        (docs.repartition(2)
         .write.mode("overwrite").option("compression", codec)
         .parquet(out))
        sizes[codec] = sum(p.stat().st_size
                           for p in Path(out).rglob("*.parquet"))
        back = spark.read.parquet(out)
        assert back.count() == docs.count()
        assert back.agg(F.sum(F.length("text"))).head()[0] == \
            docs.agg(F.sum(F.length("text"))).head()[0]
    assert sizes["zstd"] < sizes["snappy"] * 0.95


def test_export_sorted_is_globally_ordered_across_files(spark, sf_dir,
                                                        tmp_path):
    """Range-partitioned export: within every file rows are sorted, and
    file key-ranges are DISJOINT in order — so a full scan in file order
    is a global sort, and a key-range read prunes to O(1) files."""
    from melt_spark.functions.cleaning import export_sorted
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "sorted")
    export_sorted(docs, out, sort_col="doc_id", n_files=4)

    import glob

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2
    ranges = []
    total = 0
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        if not ids:
            continue
        assert ids == sorted(ids)              # intra-file order
        ranges.append((min(ids), max(ids)))
        total += len(ids)
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b                     # disjoint, ordered ranges
    assert total == docs.count()
