"""KMV distinct sketch (functions/sketches.py): estimator sanity,
saturation exactness, and the union-merge property."""

from pyspark.sql import functions as F

from melt_spark.functions.sketches import (kmv_estimate, kmv_merge,
                                           kmv_mins, kmv_sketch)
from melt_spark.sources.parquet import read_table


def test_unsaturated_sketch_is_exact(spark, sf_dir):
    """Keys with < k distinct values: the sketch holds every hash and the
    estimate IS the exact count."""
    ev = read_table(spark, sf_dir, "events")
    est = kmv_estimate(kmv_sketch(ev, ["event_type"], "user_id", k=10_000))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("ex")))
    bad = (est.join(exact, "event_type")
           .filter(F.col("kmv_est") != F.col("ex")))
    assert bad.count() == 0


def test_estimate_within_kmv_error_envelope(spark, sf_dir):
    """k=16 → stderr ~ 1/sqrt(14) ≈ 27%; assert a generous 3-sigma-ish
    [ex/2, 2*ex] envelope so the test is noise-proof but still catches a
    broken estimator (off by 2^48 scaling, inverted divide, ...)."""
    ev = read_table(spark, sf_dir, "events")
    est = kmv_estimate(kmv_sketch(ev, ["event_type"], "user_id", k=16))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("ex")))
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert r.ex / 2 <= r.kmv_est <= r.ex * 2, \
            f"{r.event_type}: est {r.kmv_est} vs exact {r.ex}"


def test_merge_equals_sketch_of_union(spark, sf_dir):
    """Shard-friendliness: sketch(A) ⊎ sketch(B) == sketch(A ∪ B)."""
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = kmv_merge(kmv_mins(a, ["event_type"], "user_id", k=16),
                       kmv_mins(b, ["event_type"], "user_id", k=16),
                       ["event_type"], k=16)
    direct = kmv_mins(ev, ["event_type"], "user_id", k=16)
    m = {(r.event_type, r.h) for r in merged.select("event_type", "h").collect()}
    d = {(r.event_type, r.h) for r in direct.select("event_type", "h").collect()}
    assert m == d


def test_estimate_deterministic_vs_duckdb_fold(spark, sf_dir):
    """The 48-bit hash matches the DuckDB hex fold bit-for-bit (the
    property the oracle branch rests on)."""
    import duckdb

    ev = read_table(spark, sf_dir, "events").limit(50)
    spark_h = {(r.user_id, r.h) for r in ev.select(
        "user_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
               16, 10).cast("bigint").alias("h")).collect()}
    ids = sorted({u for u, _ in spark_h})
    con = duckdb.connect()
    duck_h = set()
    for u in ids:
        h = con.execute(
            "SELECT list_reduce(list_transform(string_split_regex("
            f"substr(md5('{u}'), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(a,b) -> a*16+b)").fetchone()[0]
        duck_h.add((u, h))
    assert spark_h == duck_h
