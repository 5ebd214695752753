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


def test_bottomk_merge_equals_sample_of_union(spark, sf_dir):
    """Bottom-k sample mergeability: bottom-k(A) ⊎ bottom-k(B) re-ranked
    == bottom-k(A ∪ B) — the shard/streaming property, with payloads."""
    from melt_spark.functions.sketches import bottomk_merge, bottomk_sample

    ords = read_table(spark, sf_dir, "orders")
    a = ords.filter(F.col("o_orderkey") % 2 == 0)
    b = ords.filter(F.col("o_orderkey") % 2 == 1)
    merged = bottomk_merge(
        bottomk_sample(a, ["o_orderstatus"], "o_orderkey",
                       "o_totalprice", k=32),
        bottomk_sample(b, ["o_orderstatus"], "o_orderkey",
                       "o_totalprice", k=32),
        ["o_orderstatus"], k=32)
    direct = bottomk_sample(ords, ["o_orderstatus"], "o_orderkey",
                            "o_totalprice", k=32)
    m = {(r.o_orderstatus, r.h, r.v) for r in merged.collect()}
    d = {(r.o_orderstatus, r.h, r.v) for r in direct.collect()}
    assert m == d and len(m) > 0


def test_bottomk_quantiles_track_exact_quartiles(spark, sf_dir):
    """k=256 sample quartiles of o_totalprice must land within a
    generous relative envelope of the exact quartiles (sqrt(k) sampling
    error ~6%; assert 25%) — catches inverted ranks or hash-scale bugs."""
    from melt_spark.functions.sketches import (bottomk_quantiles,
                                               bottomk_sample)

    ords = read_table(spark, sf_dir, "orders")
    sample = bottomk_sample(ords, ["o_orderstatus"], "o_orderkey",
                            "o_totalprice", k=256)
    est = {r.o_orderstatus: (r.q_25, r.q_50, r.q_75)
           for r in bottomk_quantiles(sample, ["o_orderstatus"]).collect()}
    exact = {r.o_orderstatus: (r.p25, r.p50, r.p75)
             for r in ords.groupBy("o_orderstatus").agg(
                 F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
                 F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
                 F.expr("percentile(o_totalprice, 0.75)").alias("p75"))
             .collect()}
    assert set(est) == set(exact)
    for k_, (e25, e50, e75) in est.items():
        x25, x50, x75 = exact[k_]
        for e, x in ((e25, x25), (e50, x50), (e75, x75)):
            assert abs(e - x) <= 0.25 * x, (k_, e, x)


def test_kmv_intersect_estimates_track_exact(spark):
    """Synthetic sets with known overlap: the KMV intersection estimate
    must land within the sketch's error envelope, and fully-disjoint
    sets must estimate ~0 (j_num small)."""
    from pyspark.sql import Row

    from melt_spark.functions.sketches import kmv_intersect_estimate

    a = spark.createDataFrame([Row(x=i) for i in range(0, 600)])
    b = spark.createDataFrame([Row(x=i) for i in range(300, 900)])
    [r] = kmv_intersect_estimate(a, b, "x", k=64).collect()
    # true: inter 300, union 900 -> J = 1/3; k=64 -> stderr ~12%
    assert 100 <= r.inter_est <= 560, r
    assert 600 <= r.union_est <= 1350, r
    disj = spark.createDataFrame([Row(x=i) for i in range(5000, 5600)])
    [d] = kmv_intersect_estimate(a, disj, "x", k=64).collect()
    assert d.j_num <= 3 and d.inter_est <= 0.1 * d.union_est


# --- HyperLogLog (r7: portable-hash HLL, functions/sketches.py) ----------

def test_hll_merge_equals_sketch_of_union(spark, sf_dir):
    """Register-wise max is the HLL merge law: merge(sketch(A), sketch(B))
    == sketch(A ∪ B), including overlapping shards."""
    from melt_spark.functions.sketches import hll_merge, hll_registers

    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("user_id") % 3 != 0)
    b = ev.filter(F.col("user_id") % 3 != 1)   # overlaps a on %3==2
    merged = hll_merge(hll_registers(a, ["event_type"], "user_id"),
                       hll_registers(b, ["event_type"], "user_id"),
                       ["event_type"])
    direct = hll_registers(a.unionByName(b), ["event_type"], "user_id")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_estimate_within_error_envelope(spark, sf_dir):
    """m=64 → stderr ~ 1.04/8 = 13%; assert a generous [ex/2, 2*ex]
    envelope per key so a scaling bug (wrong alpha, inverted fold,
    missing zero registers) fails loudly while hash noise never does."""
    from melt_spark.functions.sketches import hll_estimate, hll_registers

    ev = read_table(spark, sf_dir, "events")
    est = hll_estimate(hll_registers(ev, ["event_type"], "user_id"),
                       ["event_type"])
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("ex")))
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        got = r.hll_e4 / 10000.0
        assert r.ex / 2 <= got <= r.ex * 2, \
            f"{r.event_type}: est {got} vs exact {r.ex}"


def test_hll_register_count_bounded_and_regimes(spark, sf_dir):
    """At most m=64 observed registers per key; the suite constituent
    exercises BOTH estimator regimes (raw HLL and linear counting)."""
    from melt_spark.functions.sketches import hll_registers
    from melt_spark.plans.analytics_suite import q_hll_distinct

    ev = read_table(spark, sf_dir, "events")
    per_key = (hll_registers(ev, ["event_type"], "user_id")
               .groupBy("event_type").count().collect())
    assert per_key and all(r["count"] <= 64 for r in per_key)

    rows = q_hll_distinct(spark, sf_dir).collect()
    kinds = {r.kind for r in rows}
    assert {"by_type", "global", "lc"} <= kinds
    # the lc branch (5 distinct event types) must sit in the
    # linear-counting regime: most registers still zero
    lc = [r for r in rows if r.kind == "lc"][0]
    assert lc.n_zero_regs >= 50 and lc.exact_distinct <= 10
