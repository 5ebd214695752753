"""Gap-fill / trailing z-score (functions/timeseries.py) and the cohort
retention query: structural invariants a hash match can't express."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.functions.timeseries import gapfill, trailing_zscore
from melt_spark.sources.parquet import read_table


def _toy_series(spark):
    """One key, hourly buckets 0,1,2,5,6 (gap at 3,4), values 10,20,30,60,70."""
    rows = [Row(k="a", ts=f"2024-01-01 0{h}:00:00", v=float(val))
            for h, val in [(0, 10), (1, 20), (2, 30), (5, 60), (6, 70)]]
    return spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v")


def test_gapfill_fills_gaps_with_locf_and_linear(spark):
    out = {r.bucket: r for r in
           gapfill(_toy_series(spark), "ts", ["k"], "v", 3600).collect()}
    assert len(out) == 7  # hours 0..6 densified
    base = min(out)
    gap1, gap2 = out[base + 3 * 3600], out[base + 4 * 3600]
    assert gap1.n == 0 and gap2.n == 0
    assert gap1.v_sum == -1.0  # sentinel on gap rows
    assert gap1.v_locf == 30.0 and gap2.v_locf == 30.0
    # linear between (hr2, 30) and (hr5, 60): hr3 -> 40, hr4 -> 50
    assert gap1.v_interp == 40.0 and gap2.v_interp == 50.0
    # observed rows pass through unchanged
    assert out[base].v_sum == 10.0 and out[base].v_locf == 10.0
    assert out[base + 5 * 3600].v_interp == 60.0


def test_gapfill_fixture_no_row_loss(spark, sf_dir):
    """Densified output ⊇ observed buckets; per-key row count equals the
    key's bucket span; observed sums survive."""
    ev = read_table(spark, sf_dir, "events")
    out = gapfill(ev, "ts", ["event_type"], "value", 3600)
    spans = (out.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("rows"),
                  ((F.max("bucket") - F.min("bucket")) / 3600 + 1)
                  .cast("long").alias("span")))
    assert spans.filter(F.col("rows") != F.col("span")).count() == 0
    observed = out.filter(F.col("n") > 0)
    assert observed.filter(F.col("v_locf") != F.col("v_sum")).count() == 0


def test_zscore_flags_spike(spark):
    """23 quiet hours (1 event) then one 50-event spike: the spike's z
    must be large and positive; quiet rows near zero."""
    rows = [Row(k="a", ts=f"2024-01-01 {h:02d}:00:00", i=j)
            for h in range(23) for j in range(1)]
    rows += [Row(k="a", ts="2024-01-01 23:00:00", i=j) for j in range(50)]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.bucket: r for r in
           trailing_zscore(df, "ts", ["k"], 3600, lookback=24).collect()}
    spike = out[max(out)]
    assert spike.x == 50
    # 22 trailing ones -> zero variance -> sentinel would hide the spike;
    # variance comes from the window, all-equal counts => sentinel
    assert spike.z == -999.0 or spike.z > 3
    # make variance nonzero: vary the quiet baseline instead
    rows2 = [Row(k="a", ts=f"2024-01-01 {h:02d}:00:00", i=j)
             for h in range(23) for j in range(1 + h % 2)]
    rows2 += [Row(k="a", ts="2024-01-01 23:00:00", i=j) for j in range(50)]
    df2 = spark.createDataFrame(rows2).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out2 = {r.bucket: r for r in
            trailing_zscore(df2, "ts", ["k"], 3600, lookback=24).collect()}
    assert out2[max(out2)].z > 10


def test_zscore_sentinel_on_short_history(spark):
    df = spark.createDataFrame(
        [Row(k="a", ts="2024-01-01 00:00:00")]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    [r] = trailing_zscore(df, "ts", ["k"], 3600).collect()
    assert r.z == -999.0


def test_cohort_retention_invariants(spark, sf_dir):
    """Offset-0 retention is exactly 1.0 for every cohort (every user is
    active on their own first day), rates stay in (0, 1], and the
    per-cohort active count at offset 0 equals the cohort size."""
    from melt_spark.plans.analytics_suite import q_cohort_retention

    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.retention <= 1.0
        assert r.n_active <= r.cohort_n
        if r.day_offset == 0:
            assert r.n_active == r.cohort_n and r.retention == 1.0


def test_grouped_trend_recovers_planted_slope(spark):
    """Counts rising by exactly 2/hour fit slope 2, r² = 1."""
    from melt_spark.functions.timeseries import grouped_trend

    rows = [Row(k="a", ts=f"2024-01-01 {h:02d}:00:00")
            for h in range(8) for _ in range(1 + 2 * h)]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    [r] = grouped_trend(df, "ts", ["k"], 3600).collect()
    assert r.n_points == 8
    assert abs(r.slope - 2.0) < 1e-9
    assert abs(r.r2 - 1.0) < 1e-9


def test_grouped_trend_sentinels(spark):
    from melt_spark.functions.timeseries import grouped_trend

    df = spark.createDataFrame([Row(k="a", ts="2024-01-01 00:00:00")]) \
        .select("k", F.col("ts").cast("timestamp").alias("ts"))
    [r] = grouped_trend(df, "ts", ["k"], 3600).collect()
    assert r.slope == -999.0 and r.r2 == -999.0


def test_time_weighted_avg_hand_case(spark):
    """v=10 held for 3s then v=40 for 1s: twa = (10*3 + 40*1)/4 = 17.5 —
    the arithmetic mean (25) would be wrong. The final sample carries no
    weight (left-continuous)."""
    from melt_spark.functions.timeseries import time_weighted_avg_by_id

    rows = [Row(k="a", i=1, ts="2024-01-01 00:00:00", v=10.0),
            Row(k="a", i=2, ts="2024-01-01 00:00:03", v=40.0),
            Row(k="a", i=3, ts="2024-01-01 00:00:04", v=99.0)]
    df = spark.createDataFrame(rows).select(
        "k", "i", F.col("ts").cast("timestamp").alias("ts"), "v")
    [r] = time_weighted_avg_by_id(df, "ts", "i", ["k"], "v").collect()
    assert r.n_points == 3 and r.span_us == 4_000_000
    assert abs(r.twa - 17.5) < 1e-9


def test_time_weighted_avg_single_point_sentinel(spark):
    from melt_spark.functions.timeseries import time_weighted_avg_by_id

    df = spark.createDataFrame(
        [Row(k="a", i=1, ts="2024-01-01 00:00:00", v=10.0)]).select(
        "k", "i", F.col("ts").cast("timestamp").alias("ts"), "v")
    [r] = time_weighted_avg_by_id(df, "ts", "i", ["k"], "v").collect()
    assert r.twa == -1.0


def test_gapfill_spine_guard_raises_on_pathological_key(spark):
    """A key spanning ~4 months at 1-second width (10M buckets) must fail
    LOUDLY with the max_spine message, not materialize the array."""
    import pytest

    from melt_spark.functions.timeseries import gapfill

    rows = [Row(k="wide", ts="2024-01-01 00:00:00", v=1.0),
            Row(k="wide", ts="2024-05-01 00:00:00", v=2.0)]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v")
    with pytest.raises(Exception, match="max_spine"):
        gapfill(df, "ts", ["k"], "v", width=1).collect()
    # same data at hourly width is fine (2905 buckets)
    out = gapfill(df, "ts", ["k"], "v", width=3600).collect()
    assert len(out) == 2905


def test_gapfill_spine_guard_is_per_key(spark):
    """Only the offending key trips the guard; a tight max_spine passes
    when every key's span fits."""
    from melt_spark.functions.timeseries import gapfill

    rows = [Row(k="a", ts="2024-01-01 00:00:00", v=1.0),
            Row(k="a", ts="2024-01-01 05:00:00", v=2.0)]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = gapfill(df, "ts", ["k"], "v", width=3600, max_spine=6).collect()
    assert len(out) == 6


def test_cusum_flags_planted_level_shift(spark):
    """48 buckets flat at 10/bucket with the LAST 12 stepped to 20 —
    a minority-segment shift the series mean only partially absorbs
    (mu = 12.5, slack = 3.125, post-shift excess = 4.375/bucket): the
    monitor must alarm with a large s_max while the flat control stays
    quiet. (A shift spanning HALF the series would raise mu enough to
    swallow the excess — the self-calibrating monitor detects drifts,
    not regime re-definitions.)"""
    from melt_spark.functions.timeseries import cusum_monitor

    rows = []
    for h in range(48):
        n = 10 if h < 36 else 20
        for j in range(n):
            rows.append(Row(k="shifted",
                            ts=f"2024-01-{1 + h // 24:02d} "
                               f"{h % 24:02d}:00:{j % 60:02d}.{j // 60}"))
    for h in range(48):
        for j in range(10):
            rows.append(Row(k="flat",
                            ts=f"2024-01-{1 + h // 24:02d} "
                               f"{h % 24:02d}:00:{j % 60:02d}"))
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.k: r for r in
           cusum_monitor(df, "ts", ["k"], 3600).collect()}
    assert out["flat"].n_alarms == 0
    assert out["flat"].s_max < out["shifted"].s_max
    # mu = 12.5, slack 3.125, post-shift excess 4.375/bucket over 12
    # buckets -> S climbs to ~52.5 vs h = 4*sqrt(12.5) ~ 14.1
    assert out["shifted"].n_alarms > 0
    assert out["shifted"].s_max > 4.0 * (12.5 ** 0.5)


def test_mad_outliers_hand_computed(spark):
    """Values {1..9, 1000}: lower median 5, deviations {0..4, 995} ->
    lower MAD 2 (devs sorted: 0,1,1,2,2,3,3,4,4,995 -> rank 5 = 2);
    threshold 2 * 4.4478 = 8.90 -> only 1000 (dev 995) flags."""
    from melt_spark.functions.timeseries import mad_outliers

    rows = [("k", i, v) for i, v in
            enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "k string, oid long, v long")
    r = mad_outliers(df, "v", ["k"], "oid").head()
    assert (r.n, r.med, r.mad, r.n_outliers) == (10, 5, 2, 1)


def test_mad_outliers_zero_mad_degenerate(spark):
    """Constant-dominated key: MAD 0 -> every non-median value flags
    (dev * 10000 > 0), the conventional degenerate behaviour."""
    from melt_spark.functions.timeseries import mad_outliers

    rows = [("k", i, 7) for i in range(5)] + [("k", 9, 8)]
    df = spark.createDataFrame(rows, "k string, oid long, v long")
    r = mad_outliers(df, "v", ["k"], "oid").head()
    assert (r.med, r.mad, r.n_outliers) == (7, 0, 1)


def test_acf_lag_detects_planted_period(spark):
    """A period-2 alternating series has acf(1) ~ -1 and acf(2) ~ +1;
    a constant series degenerates to 0 (guard, not NaN)."""
    from pyspark.sql import functions as F

    from melt_spark.functions.timeseries import acf

    rows = []
    for d in range(40):
        # alternating 2/8 events per day for type 'alt'
        n = 2 if d % 2 == 0 else 8
        for i in range(n):
            rows.append(("alt", d * 86_400 + i))
    for d in range(40):
        for i in range(5):
            rows.append(("flat", d * 86_400 + i))
    df = spark.createDataFrame(rows, "event_type string, sec long") \
        .select("event_type", F.col("sec").cast("timestamp").alias("ts"))
    out = {(r.event_type, r.lag): r.acf_e6
           for r in acf(df, "ts", ["event_type"], max_lag=3).collect()}
    assert out[("alt", 1)] < -900_000
    assert out[("alt", 2)] > 900_000
    assert all(out[("flat", k)] == 0 for k in (1, 2, 3))


def test_acf_densifies_missing_buckets(spark):
    """A day with zero events must enter the series as 0, not be
    spliced out: series 10,(missing->0),10,(0),10 has acf(2) > 0 while
    splicing would make it constant."""
    from pyspark.sql import functions as F

    from melt_spark.functions.timeseries import acf

    rows = [("t", d * 2 * 86_400 + i) for d in range(5)
            for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, sec long") \
        .select("event_type", F.col("sec").cast("timestamp").alias("ts"))
    out = {r.lag: (r.acf_e6, r.n_buckets)
           for r in acf(df, "ts", ["event_type"], max_lag=2).collect()}
    assert out[1][1] == 9          # 5 active + 4 gap days
    assert out[2][0] > 500_000     # period-2 structure visible
    assert out[1][0] < 0
