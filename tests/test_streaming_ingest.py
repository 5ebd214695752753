"""Streaming corpus-ingest maintenance: the round-5 mergeable structures
(Bloom filter, fingerprint store) maintained per micro-batch must equal
their batch counterparts — the same merge-law discipline as the CMS and
PSI streaming tests."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.functions.bloom import bloom_build


def _docs(spark, lo, hi, tag=""):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta doc {i % 17} {tag}")
         for i in range(lo, hi)])


def test_foreachbatch_bloom_equals_batch(spark, tmp_path):
    """Per-micro-batch blooms bit_or-merged via foreachBatch == the
    batch-built filter over the full stream."""
    df = spark.createDataFrame([Row(user_id=i % 91) for i in range(600)])
    src = str(tmp_path / "stream")
    for k in range(3):
        df.filter((df.user_id % 3) == k).repartition(1) \
            .write.mode("append").parquet(src)

    acc: dict[int, int] = {}
    batches = []

    def merge_batch(batch_df, batch_id):
        for r in bloom_build(batch_df, "user_id").collect():
            acc[r.word] = acc.get(r.word, 0) | r.bits
        batches.append(batch_id)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(merge_batch) \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(batches) == 3
    batch = {r.word: r.bits for r in bloom_build(df, "user_id").collect()}
    assert acc == batch


def test_streaming_incremental_dedup_against_growing_store(spark,
                                                           tmp_path):
    """End-to-end streaming ingest: each micro-batch dedups against the
    accumulated fingerprint store via incremental_exact_dedup, then its
    novel docs extend the store. A doc duplicated across micro-batches
    must be flagged store_dup in the later batch; the final store equals
    the batch-dedup survivors of the whole stream."""
    from melt_spark.functions.dedup import incremental_exact_dedup
    from melt_spark.functions.text import fingerprint

    b1 = _docs(spark, 0, 30)
    b2 = _docs(spark, 30, 60)          # texts repeat mod 17 -> store dups
    b3 = _docs(spark, 100, 110, tag="fresh")
    src = str(tmp_path / "stream")
    for b in (b1, b2, b3):
        b.repartition(1).write.mode("append").parquet(src)

    state = {"store": None, "flags": []}

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        store = state["store"]
        if store is None:
            store = batch_df.sparkSession.createDataFrame(
                [], "fp string, owner_id bigint")
        out = incremental_exact_dedup(batch_df, store).collect()
        state["flags"].extend([(r.doc_id, r.verdict) for r in out])
        novel = [(r.fp, r.doc_id) for r in out if r.verdict == "new"]
        if novel:
            add = batch_df.sparkSession.createDataFrame(
                novel, "fp string, owner_id bigint")
            state["store"] = store.unionByName(add) \
                .localCheckpoint(eager=True)
        else:
            state["store"] = store

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(ingest) \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    flags = dict(state["flags"])
    assert len(flags) == 70
    # every doc in the second slab repeats a batch-1 text (mod 17 cycle)
    assert all(flags[i] == "store_dup" for i in range(47, 60))
    # the fresh tagged docs are new except their own intra-batch repeats
    assert flags[100] == "new"
    # final store == batch dedup of the whole stream (one row per
    # distinct normalized text)
    full = b1.unionByName(b2).unionByName(b3)
    want = full.select(fingerprint("text").alias("x")).distinct().count()
    got = state["store"].count()
    assert got == want
