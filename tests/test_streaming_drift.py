"""Streaming PSI drift monitor (streaming/drift.py): per-micro-batch bin
counts merged in foreachBatch must reproduce the batch PSI exactly, and
a planted shift must cross the 0.25 alarm while identical periods stay
near 0 — the same gates the batch psi_drift branch proves against the
oracle."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.sources.parquet import read_table
from melt_spark.streaming.drift import (PsiMonitor, counts_vector,
                                        psi_total)

NBINS = 8
WIDTH = 50.0


def _values(spark, vals):
    return spark.createDataFrame([Row(v=float(x)) for x in vals])


def test_foreachbatch_psi_equals_batch(spark, tmp_path):
    """Three real micro-batches of the 'current' period accumulated via
    foreachBatch give bit-identical bin counts — and therefore the
    identical PSI — to one batch scan of the same data."""
    base_vals = [10 + (i % 20) * 10 for i in range(300)]
    cur_vals = [120 + (i % 25) * 11 for i in range(400)]  # shifted right
    baseline = counts_vector(_values(spark, base_vals), "v", WIDTH, NBINS)

    cur = _values(spark, cur_vals).withColumn(
        "part", (F.monotonically_increasing_id() % 3).cast("int"))
    src = str(tmp_path / "stream")
    for k in range(3):
        cur.filter(F.col("part") == k).drop("part").repartition(1) \
            .write.mode("append").parquet(src)

    mon = PsiMonitor(baseline, WIDTH)
    stream = (spark.readStream.schema("v double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (stream.writeStream
         .foreachBatch(lambda df, _id: mon.update(df, "v"))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert mon.batches == 3
    batch_counts = counts_vector(_values(spark, cur_vals), "v",
                                 WIDTH, NBINS)
    assert mon.counts == batch_counts
    assert mon.psi() == psi_total(baseline, batch_counts)


def test_psi_alarm_gates(spark):
    """Identical periods ~0; a planted distribution shift crosses the
    standard 0.25 alarm."""
    a = [10 + (i % 20) * 10 for i in range(500)]
    va = counts_vector(_values(spark, a), "v", WIDTH, NBINS)
    assert psi_total(va, va) == 0.0
    shifted = [250 + (i % 10) * 15 for i in range(500)]
    vs = counts_vector(_values(spark, shifted), "v", WIDTH, NBINS)
    assert psi_total(va, vs) > 0.25


def test_streaming_restatement_matches_suite_branch(spark, sf_dir):
    """The driver-side psi_total over q_psi_drift's own bin counts equals
    the suite query's oracle-checked total row — the streaming monitor's
    arithmetic IS the batch branch's arithmetic."""
    from melt_spark.plans.analytics_suite import (PSI_BIN, PSI_NBINS,
                                                  PSI_SPLIT, q_psi_drift)

    orders = read_table(spark, sf_dir, "orders")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < split)
    after = orders.filter(F.col("o_orderdate") >= split)
    va = counts_vector(before, "o_totalprice", PSI_BIN, PSI_NBINS)
    vb = counts_vector(after, "o_totalprice", PSI_BIN, PSI_NBINS)
    [suite_total] = [r.psi for r in q_psi_drift(spark, sf_dir).collect()
                     if r.bin == -1]
    assert psi_total(va, vb) == suite_total
