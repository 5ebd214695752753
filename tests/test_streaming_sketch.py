"""Streaming sketch maintenance: the count-min merge law makes the sketch
a streaming aggregate — per-micro-batch sketches merged via foreachBatch
must equal the batch sketch over the full stream. (Sketch state is <=
depth x width rows BY CONSTRUCTION, so driver-side accumulation here is
the intended fixed-memory pattern, not a scale hazard.)"""

from pyspark.sql import Row

from melt_spark.functions.sketches import cms_build


def test_foreachbatch_cms_merge_equals_batch(spark, tmp_path):
    rows = [Row(user_id=i % 37) for i in range(900)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "stream")
    # three files -> three real micro-batches with maxFilesPerTrigger=1
    for k in range(3):
        df.filter((df.user_id % 3) == k).repartition(1) \
            .write.mode("append").parquet(src)

    acc: dict[tuple, int] = {}
    seen = []

    def merge_batch(batch_df, batch_id):
        for r in cms_build(batch_df, "user_id").collect():
            key = (r.row, r.cell)
            acc[key] = acc.get(key, 0) + r.total
        seen.append(batch_id)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(merge_batch) \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 3
    batch = {(r.row, r.cell): r.total
             for r in cms_build(df, "user_id").collect()}
    assert acc == batch
    # each depth row of the merged sketch accounts for every stream row
    for row_id in range(4):
        assert sum(v for (r, _c), v in acc.items() if r == row_id) == 900
