"""Hypothesis tests (functions/hypothesis.py): Mann-Whitney U against
hand-computed small samples (incl. ties), invariants, and the Benford
digit/χ² arithmetic."""

from pyspark.sql import functions as F

from melt_spark.functions.hypothesis import (BENFORD_PPM, benford_digits,
                                             mann_whitney_u)


def _sample(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, g int")


def test_mann_whitney_hand_computed_no_ties(spark):
    """Textbook example: A = {1, 3, 5}, B = {2, 4, 6} -> ranks A = 1,3,5
    (R0 = 9), U0 = 9 - 6 = 3, U1 = n0*n1 - U0 = 6."""
    rows = [("k", 1, 0), ("k", 3, 0), ("k", 5, 0),
            ("k", 2, 1), ("k", 4, 1), ("k", 6, 1)]
    r = mann_whitney_u(_sample(spark, rows), ["k"], "v", "g").head()
    assert (r.n0, r.n1) == (3, 3)
    assert r.u0_2x == 6      # doubled U0 = 3
    assert r.u1_2x == 12     # doubled U1 = 6
    assert r.tie_cube == 0


def test_mann_whitney_tie_handling(spark):
    """A = {1, 2}, B = {2, 3}: the tied 2s share average rank 2.5 ->
    R0 = 1 + 2.5 = 3.5 (doubled 7), U0 = 3.5 - 3 = 0.5 (doubled 1),
    tie term = 2^3 - 2 = 6."""
    rows = [("k", 1, 0), ("k", 2, 0), ("k", 2, 1), ("k", 3, 1)]
    r = mann_whitney_u(_sample(spark, rows), ["k"], "v", "g").head()
    assert r.u0_2x == 1
    assert r.u1_2x == 2 * 2 * 2 - 1  # 2*n0*n1 - u0_2x = 7
    assert r.tie_cube == 6


def test_mann_whitney_identical_distributions_symmetric(spark):
    """Same values in both groups: U0 == U1 == n0*n1/2 and z == 0."""
    rows = [("k", v, g) for v in (10, 20, 30) for g in (0, 1)]
    r = mann_whitney_u(_sample(spark, rows), ["k"], "v", "g").head()
    assert r.u0_2x == r.u1_2x == r.n0 * r.n1
    assert r.z_e6 == 0


def test_mann_whitney_single_group_degenerate(spark):
    """A key where only group 0 exists stays in the output with z = 0
    (contract-total, the theil_sen lesson)."""
    rows = [("k", 1, 0), ("k", 2, 0)]
    r = mann_whitney_u(_sample(spark, rows), ["k"], "v", "g").head()
    assert (r.n0, r.n1, r.z_e6) == (2, 0, 0)


def test_benford_shares_and_chi2(spark):
    """Exact-Benford counts (scaled ppm shares over 1e6 rows... shrunk:
    use the ppm table itself as counts) give ~zero χ² per digit; a
    uniform digit distribution gives a large one."""
    ppm = spark.createDataFrame(
        [(d, p) for d, p in BENFORD_PPM.items()], "d int, n long")
    # expand to value rows is overkill — drive the function with one
    # value per (digit, i) via explode of a repeat counter scaled 1e-3
    vals = ppm.select(
        F.explode(F.sequence(F.lit(1), (F.col("n") / 1000).cast("int")))
        .alias("i"), "d").select(
        (F.col("d") * 100 + 1).alias("v"))   # first digit = d
    out = benford_digits(vals, "v").collect()
    assert {r.digit for r in out} == set(range(1, 10))
    total = sum(r.n_obs for r in out)
    assert all(r.n_total == total for r in out)
    # per-digit χ² contribution should be tiny (rounding of ppm/1000)
    assert sum(r.chi2_e6 for r in out) < 100_000   # << 1 unit of χ²

    uni = spark.range(9000).select(
        ((F.col("id") % 9 + 1) * 10 + 3).alias("v"))
    chi = sum(r.chi2_e6 for r in benford_digits(uni, "v").collect())
    assert chi > 500_000_000   # χ² >> critical value at 8 df


def test_benford_keyed_variant(spark):
    """key_cols partitions the totals per key."""
    df = spark.createDataFrame(
        [("a", 123), ("a", 234), ("b", 911)], "k string, v long")
    out = {(r.k, r.digit): (r.n_obs, r.n_total)
           for r in benford_digits(df, "v", ["k"]).collect()}
    assert out[("a", 1)] == (1, 2)
    assert out[("a", 2)] == (1, 2)
    assert out[("b", 9)] == (1, 1)


def test_kaplan_meier_hand_computed(spark):
    """Hand-computed 3-subject example — u1 events at day 1; u2 never
    qualifies (administratively censored at the corpus' last date,
    2024-01-04, i.e. duration 3); u3 events at day 3:
    t=1: n_risk 3, d 1, S = 2/3;
    t=3: n_risk 2, d 1 (+1 censored; same-day censorings leave the risk
    set after the events), S = 2/3 * 1/2 = 1/3."""
    from melt_spark.functions.hypothesis import kaplan_meier

    rows = [  # (user, day, qualifying)
        ("u1", "2024-01-01", False), ("u1", "2024-01-02", True),
        ("u2", "2024-01-01", False), ("u2", "2024-01-03", False),
        ("u3", "2024-01-01", False), ("u3", "2024-01-04", True),
    ]
    df = spark.createDataFrame(rows, "uid string, d string, q boolean") \
        .select("uid", F.to_timestamp("d").alias("ts"), "q")
    out = {r.dur_days: (r.n_risk, r.d_evt, r.n_censored, r.s_e6)
           for r in kaplan_meier(df, "uid", "ts", "q").collect()}
    assert out == {1: (3, 1, 0, 666667), 3: (2, 1, 1, 333333)}


def test_kaplan_meier_all_censored_flat_curve(spark):
    """No qualifying events anywhere: S stays 1.0 across the board."""
    from melt_spark.functions.hypothesis import kaplan_meier

    rows = [("u%d" % i, "2024-01-0%d" % (1 + i % 5), False)
            for i in range(8)]
    df = spark.createDataFrame(rows, "uid string, d string, q boolean") \
        .select("uid", F.to_timestamp("d").alias("ts"), "q")
    out = kaplan_meier(df, "uid", "ts", "q").collect()
    assert out and all(r.s_e6 == 1_000_000 and r.d_evt == 0 for r in out)


def test_chi2_independence_hand_computed(spark):
    """2x2 table [[10, 20], [20, 10]]: E = 15 everywhere, per-cell
    contribution 25/15 = 5/3 -> chi2 = 20/3 (6.667 total)."""
    from melt_spark.functions.hypothesis import chi2_independence

    rows = ([("x", 1)] * 10 + [("x", 2)] * 20
            + [("y", 1)] * 20 + [("y", 2)] * 10)
    df = spark.createDataFrame(rows, "a string, b int")
    out = chi2_independence(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r.n_total == 60 for r in out)
    assert all(r.chi2_e6 == 1_666_667 for r in out)


def test_chi2_independence_empty_cells_counted(spark):
    """An unobserved cell must contribute its full E — [[2,0],[1,1]]:
    E(x,2) = 2*1/4 = 0.5, contribution (0-0.5)^2/0.5 = 0.5."""
    from melt_spark.functions.hypothesis import chi2_independence

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 1), ("y", 2)], "a string, b int")
    out = {(r.a, r.b): (r.n_obs, r.chi2_e6)
           for r in chi2_independence(df, "a", "b").collect()}
    assert out[("x", 2)] == (0, 500_000)
    assert len(out) == 4


def test_log_rank_hand_computed(spark):
    """A(g0) events at dur 1, B(g1) events at dur 2, C(g0) censored at
    the corpus end (dur 2): t=1 E0 = 2/3, V = 2/9; t=2 E0 = 1/2,
    V = 1/4; chi2 = (1 - 7/6)^2 / (17/36) = 1/17."""
    from melt_spark.functions.hypothesis import log_rank

    rows = [
        ("A", "2024-01-01", False, 0), ("A", "2024-01-02", True, 0),
        ("B", "2024-01-01", False, 1), ("B", "2024-01-03", True, 1),
        ("C", "2024-01-01", False, 0), ("C", "2024-01-03", False, 0),
    ]
    df = spark.createDataFrame(
        rows, "uid string, d string, q boolean, g int") \
        .select("uid", F.to_timestamp("d").alias("ts"), "q", "g")
    out = {r.dur_days: r for r in
           log_rank(df, "uid", "ts", "q", "g").collect()}
    t1, t2, summ = out[1], out[2], out[-1]
    assert (t1.n0_risk, t1.n1_risk, t1.d0, t1.d1) == (2, 1, 1, 0)
    assert (t1.e0_e6, t1.v_e6) == (666667, 222222)
    assert (t2.n0_risk, t2.n1_risk, t2.d0, t2.d1) == (1, 1, 0, 1)
    assert (t2.e0_e6, t2.v_e6) == (500000, 250000)
    assert summ.v_e6 == 58824   # chi2 = 1/17 in the summary slot


def test_random_group_ci_invariants(spark, sf_dir):
    """16 replicate half-samples each hold ~half the rows; the summary
    mean is the exact full-sample mean; the CI brackets it
    symmetrically with a positive se."""
    from melt_spark.functions.hypothesis import random_group_ci
    from melt_spark.functions.sketches import kmv_hash
    from melt_spark.sources.parquet import read_table

    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents"), kmv_hash(F.col("o_orderkey")).alias("h"))
    rows = random_group_ci(base, "cents", "h", n_reps=16).collect()
    reps = [r for r in rows if r.rep >= 0]
    summ = [r for r in rows if r.rep == -1][0]
    assert len(reps) == 16
    total = summ.n
    for r in reps:
        assert 0.40 * total <= r.n <= 0.60 * total   # ~half each
    assert summ.mean_e4 == round(summ.sum_v / summ.n * 10_000)
    assert summ.se_e4 > 0
    assert summ.ci_lo_e4 < summ.mean_e4 < summ.ci_hi_e4
    # bounds round independently -> symmetry holds to 1 rounding unit
    assert abs((summ.mean_e4 - summ.ci_lo_e4)
               - (summ.ci_hi_e4 - summ.mean_e4)) <= 1


def test_random_group_ci_exact_bits(spark):
    """Hand frame: hashes chosen so replicate 0 = {rows with bit 0},
    replicate 1 = {rows with bit 1} — membership is exactly the hash
    bits, nothing probabilistic."""
    from melt_spark.functions.hypothesis import random_group_ci

    df = spark.createDataFrame(
        [(10, 0b01), (20, 0b10), (30, 0b11)], "v long, h long")
    rows = {r.rep: r for r in
            random_group_ci(df, "v", "h", n_reps=2).collect()}
    assert (rows[0].n, rows[0].sum_v) == (2, 40)   # rows 10, 30
    assert (rows[1].n, rows[1].sum_v) == (2, 50)   # rows 20, 30
    assert rows[-1].n == 3 and rows[-1].sum_v == 60


def test_cuped_reduces_variance_on_correlated_data(spark):
    """Hand frame with strong X->Y correlation plus a small treatment
    lift: theta ~ cov/var, the adjusted variance drops by >50%, the
    adjusted diff stays near the true +2 lift."""
    from melt_spark.functions.hypothesis import cuped_adjust

    rows = []
    for i in range(200):
        x = i % 10                  # pre-period covariate
        g = i % 2
        y = 3 * x + (2 if g == 1 else 0) + (i % 3)   # strong X signal
        rows.append((x, y, g))
    df = spark.createDataFrame(rows, "x long, y long, g int")
    out = {r.kind if r.variant == -1 else ("v", r.variant): r
           for r in cuped_adjust(df, "y", "x", "g").collect()}
    summ = out["summary"]
    assert summ.mean_y_e6 > 500_000           # var_reduction_ppm > 50%
    assert abs(summ.sum_y / 1e6 - 2.0) < 0.5  # diff_cv_e6 near +2
    for g in (0, 1):
        v = out[("v", g)]
        assert v.var_ycv_e9 < v.var_y_e9      # per-variant reduction


def test_cuped_zero_covariate_variance_degenerates_to_raw(spark):
    """Constant X: theta = 0, adjusted == raw everywhere."""
    from melt_spark.functions.hypothesis import cuped_adjust

    df = spark.createDataFrame(
        [(5, 1 + i % 4, i % 2) for i in range(40)], "x long, y long,"
        " g int")
    out = cuped_adjust(df, "y", "x", "g").collect()
    summ = [r for r in out if r.variant == -1][0]
    assert summ.n == 0                         # theta_e6
    for r in out:
        if r.variant >= 0:
            assert r.mean_y_e6 == r.mean_ycv_e6
            assert r.var_y_e9 == r.var_ycv_e9


def test_bh_stepup_non_monotone_rejection(spark):
    """The step-up property: p = [.01, .06, .07, .15], q = .1, m = 4 ->
    thresholds [.025, .05, .075, .1]; ranks 1 and 3 pass, so the
    LARGEST passing rank (3) rejects ranks 1..3 INCLUDING the
    non-passing p = .06 — the case a naive per-row threshold misses."""
    from melt_spark.functions.hypothesis import bh_stepup

    df = spark.createDataFrame(
        [("a", 10_000), ("b", 60_000), ("c", 70_000), ("d", 150_000)],
        "t string, p_e6 long").limit(16)
    out = {r.t: (r.rank, r.rejected)
           for r in bh_stepup(df, "p_e6", "t").collect()}
    assert out == {"a": (1, 1), "b": (2, 1), "c": (3, 1), "d": (4, 0)}


def test_bh_stepup_nothing_passes(spark):
    """All p above every threshold: zero rejections."""
    from melt_spark.functions.hypothesis import bh_stepup

    df = spark.createDataFrame(
        [("a", 900_000), ("b", 950_000)], "t string, p_e6 long").limit(4)
    out = bh_stepup(df, "p_e6", "t").collect()
    assert all(r.rejected == 0 for r in out)


def test_target_encoding_loo_exact(spark, sf_dir):
    """LOO identity: for every (category, value) cell,
    enc = (S_c - v) / (n_c - 1) exactly (checked from the emitted
    margins); singleton categories would fall back to the global mean
    (not present in this fixture — every type has many rows)."""
    from melt_spark.plans.analytics_suite import q_target_encoding

    rows = q_target_encoding(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert r.n_c > 1
        want = round((r.s_c - r.cents) / (r.n_c - 1) * 1_000_000)
        assert r.enc_e6 == want


def test_benford_unobserved_digit_counted(spark):
    """Densification (r8, ADVICE): every value starting with digit 1
    must still emit rows for digits 2..9 with n_obs = 0, each
    contributing its full expected-count term n_total*p to the
    statistic — omitting them understates chi2 exactly when the data is
    most anomalous."""
    df = spark.createDataFrame([(100 + i,) for i in range(50)],
                               "v long")
    out = {r.digit: r for r in benford_digits(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n_obs == 50
    for d in range(2, 10):
        assert out[d].n_obs == 0
        assert out[d].n_total == 50
        # n_total * p_exp * 1e6 (chi2 = n*(0-p)^2/p = n*p)
        assert out[d].chi2_e6 == round(50 * BENFORD_PPM[d])


def test_benford_keyed_densified(spark):
    """Keyed variant densifies per key: both keys emit all 9 digits."""
    df = spark.createDataFrame(
        [("a", 123), ("a", 234), ("b", 911)], "k string, v long")
    out = {(r.k, r.digit): (r.n_obs, r.n_total)
           for r in benford_digits(df, "v", ["k"]).collect()}
    assert len(out) == 18
    assert out[("a", 1)] == (1, 2)
    assert out[("a", 9)] == (0, 2)
    assert out[("b", 9)] == (1, 1)
    assert out[("b", 1)] == (0, 1)


def test_random_group_ci_rejects_aliasing_rep_count(spark):
    """n_reps > 48 would reuse hash bits (duplicate half-samples
    inflating apparent precision) — must raise, not alias."""
    import pytest

    from melt_spark.functions.hypothesis import random_group_ci

    df = spark.createDataFrame([(1, 3)], "v long, h long")
    with pytest.raises(ValueError, match="48"):
        random_group_ci(df, "v", "h", n_reps=49)
    with pytest.raises(ValueError):
        random_group_ci(df, "v", "h", n_reps=0)


def test_random_group_ci_empty_replicate_densified(spark):
    """A replicate no row hashes into still emits its detail row with
    n = 0 and contributes deviation 0 while R stays fixed."""
    from melt_spark.functions.hypothesis import random_group_ci

    # h = 0b01: only bit 0 set -> replicate 1 is empty
    df = spark.createDataFrame([(10, 1), (20, 1)], "v long, h long")
    out = {r.rep: r for r in
           random_group_ci(df, "v", "h", n_reps=2).collect()}
    assert set(out) == {-1, 0, 1}
    assert (out[0].n, out[0].sum_v) == (2, 30)
    assert (out[1].n, out[1].sum_v, out[1].mean_e4) == (0, 0, 0)
    # SE: sqrt((dev0^2 + 0^2)/2), dev0 = 15 - 15 = 0
    assert out[-1].se_e4 == 0


def test_kaplan_meier_grouped_matches_per_group_fit(spark):
    """group_col fits one independent curve per group under the GLOBAL
    censor date: filtering group g from the grouped output must equal a
    solo fit of group g's rows IF that group carries the global max
    date (here both groups span the full window)."""
    from melt_spark.functions.hypothesis import kaplan_meier

    rows = [
        # group a: u1 evt day2; u2 censored (last global day 4)
        ("a", 1, "2024-01-01", False), ("a", 1, "2024-01-03", True),
        ("a", 2, "2024-01-01", False), ("a", 2, "2024-01-05", False),
        # group b: u3 evt day1; u4 evt day4
        ("b", 3, "2024-01-02", False), ("b", 3, "2024-01-03", True),
        ("b", 4, "2024-01-01", False), ("b", 4, "2024-01-05", True),
    ]
    df = spark.createDataFrame(
        rows, "g string, uid long, d string, evt boolean").select(
        "g", "uid", F.col("d").cast("timestamp").alias("ts"), "evt")
    got = {(r.g, r.dur_days): (r.n_risk, r.d_evt, r.n_censored, r.s_e6)
           for r in kaplan_meier(df, "uid", "ts", "evt",
                                 group_col="g").collect()}
    # group a: u1 dur 2 evt; u2 dur 4 censored (global max 2024-01-05)
    assert got[("a", 2)] == (2, 1, 0, 500_000)
    assert got[("a", 4)] == (1, 0, 1, 500_000)
    # group b: u3 dur 1 evt; u4 dur 4 evt
    assert got[("b", 1)] == (2, 1, 0, 500_000)
    assert got[("b", 4)] == (1, 1, 0, 0)


def test_mann_whitney_bucketed_agrees_with_exact_at_fine_buckets(spark):
    """Property: with n_buckets >= the distinct-value span, every value
    lands in its own bin, so bucketed midranks ARE the exact midranks —
    u/tie/z must match the exact path bit-for-bit (only the added
    `exact` flag differs)."""
    import random

    from melt_spark.functions.hypothesis import mann_whitney_u

    rnd = random.Random(8)
    rows = [("k", rnd.randint(0, 49), rnd.randint(0, 1))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "k string, v long, g int")
    exact = mann_whitney_u(df, ["k"], "v", "g").collect()[0]
    # threshold 0 forces every key through the bucketed path; 50 bins
    # over values 0..49 = one bin per value
    buck = mann_whitney_u(df, ["k"], "v", "g", max_exact_rows=0,
                          n_buckets=50).collect()[0]
    assert buck.exact == 0
    for c in ("n0", "n1", "u0_2x", "u1_2x", "tie_cube", "z_e6"):
        assert getattr(buck, c) == getattr(exact, c), c


def test_mann_whitney_adaptive_splits_by_key_size(spark):
    """Keys under the threshold keep exact ranks (exact=1), larger keys
    ride the bucketed path (exact=0); both appear in one output."""
    from melt_spark.functions.hypothesis import mann_whitney_u

    rows = ([("small", v, v % 2) for v in range(10)]
            + [("big", v % 37, v % 2) for v in range(200)])
    df = spark.createDataFrame(rows, "k string, v long, g int")
    out = {r.k: r for r in
           mann_whitney_u(df, ["k"], "v", "g",
                          max_exact_rows=50).collect()}
    assert out["small"].exact == 1
    assert out["big"].exact == 0
    # the bucketed key's totals are still exact counts
    assert out["big"].n0 + out["big"].n1 == 200
    # identity U0 + U1 = n0*n1 holds in both regimes
    for r in out.values():
        assert r.u0_2x + r.u1_2x == 2 * r.n0 * r.n1


def test_welch_ttest_hand_computed(spark):
    """Textbook two-sample case: g0 = [1,2,3,4], g1 = [2,4,6,8]."""
    from melt_spark.functions.hypothesis import welch_ttest

    rows = [("k", v, 0) for v in (1, 2, 3, 4)] \
        + [("k", v, 1) for v in (2, 4, 6, 8)]
    df = spark.createDataFrame(rows, "k string, v long, g int")
    r = welch_ttest(df, ["k"], "v", "g").collect()[0]
    assert (r.n0, r.n1, r.sum0, r.sum1) == (4, 4, 10, 20)
    # m0=2.5 m1=5; var0=5/3 var1=20/3; se2=25/12; t=-2.5/sqrt(25/12)
    import math
    t = -2.5 / math.sqrt(25 / 12.0)
    dof = (25 / 12.0) ** 2 / ((5 / 12.0) ** 2 / 3 + (20 / 12.0) ** 2 / 3)
    assert r.t_e4 == round(t * 10_000)
    assert r.df_e2 == round(dof * 100)


def test_welch_ttest_degenerate_single_row_group(spark):
    from melt_spark.functions.hypothesis import welch_ttest

    df = spark.createDataFrame([("k", 1, 0), ("k", 5, 1), ("k", 7, 1)],
                               "k string, v long, g int")
    r = welch_ttest(df, ["k"], "v", "g").collect()[0]
    assert (r.t_e4, r.df_e2) == (0, 0)


def test_spearman_perfect_and_reversed(spark):
    from melt_spark.functions.hypothesis import spearman_corr

    up = [("u", i, 10 * i) for i in range(20)]
    dn = [("d", i, -3 * i) for i in range(20)]
    df = spark.createDataFrame(up + dn, "k string, x long, y long")
    out = {r.k: r.rho_e6 for r in
           spearman_corr(df, ["k"], "x", "y").collect()}
    assert out["u"] == 1_000_000
    assert out["d"] == -1_000_000


def test_spearman_ties_midrank(spark):
    """x has a tie; rho must use midranks (scipy-verified value)."""
    from melt_spark.functions.hypothesis import spearman_corr

    # x = [1,2,2,3], y = [10,20,30,40]; midranks x: 1, 2.5, 2.5, 4
    # rho = cov/sd = (pearson of ranks) = 0.9486832980505138
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 20), ("k", 2, 30), ("k", 3, 40)],
        "k string, x long, y long")
    r = spearman_corr(df, ["k"], "x", "y").collect()[0]
    assert r.rho_e6 == 948_683


def test_spearman_constant_column_degenerate(spark):
    from melt_spark.functions.hypothesis import spearman_corr

    df = spark.createDataFrame([("k", 5, i) for i in range(5)],
                               "k string, x long, y long")
    assert spearman_corr(df, ["k"], "x", "y").collect()[0].rho_e6 == 0


def test_kruskal_wallis_two_groups_matches_mann_whitney_regime(spark):
    """With k=2 and no ties, H == z² asymptotically — check instead the
    scipy-verified exact H for a small case: groups [1,2,3] vs [4,5,6]
    give H = 3.857142857... (scipy.stats.kruskal)."""
    from melt_spark.functions.hypothesis import kruskal_wallis

    rows = [("k", v, 0) for v in (1, 2, 3)] \
        + [("k", v, 1) for v in (4, 5, 6)]
    df = spark.createDataFrame(rows, "k string, v long, g int")
    out = kruskal_wallis(df, ["k"], "v", "g").collect()
    assert len(out) == 2
    assert all(r.h_e6 == 3_857_143 for r in out)
    by_g = {r.grp: r for r in out}
    # doubled rank sums: ranks 1,2,3 -> 2(1+2+3)=12; 4,5,6 -> 2(15)=30
    assert by_g[0].r2x == 12
    assert by_g[1].r2x == 30


def test_kruskal_wallis_ties_corrected(spark):
    """All-tied input: C = 0, H must degenerate to 0 (guard, not NaN)."""
    from melt_spark.functions.hypothesis import kruskal_wallis

    df = spark.createDataFrame([("k", 7, i % 3) for i in range(9)],
                               "k string, v long, g int")
    out = kruskal_wallis(df, ["k"], "v", "g").collect()
    assert all(r.h_e6 == 0 for r in out)
    assert all(r.tie_cube == 9 ** 3 - 9 for r in out)


def test_msprt_null_gives_p_one_signal_gives_small_p(spark):
    """Identical groups: theta ~ 0 -> Lambda <= 1 -> p = 1. A strong
    separation drives p toward 0; p is always in (0, 1e6]."""
    from melt_spark.functions.hypothesis import msprt_two_sample

    same = [("null", v, g) for g in (0, 1) for v in range(100)]
    sep = [("sig", v, 0) for v in range(100)] \
        + [("sig", v + 500, 1) for v in range(100)]
    df = spark.createDataFrame(same + sep, "k string, v long, g int")
    out = {r.k: r for r in
           msprt_two_sample(df, ["k"], "v", "g").collect()}
    assert out["null"].p_e6 == 1_000_000
    assert out["null"].theta_e4 == 0
    assert out["sig"].p_e6 < 1_000
    assert out["sig"].theta_e4 == 5_000_000   # diff 500 in 1e-4 units
    assert out["sig"].mde_e4 > 0


def test_msprt_degenerate_zero_spread(spark):
    from melt_spark.functions.hypothesis import msprt_two_sample

    df = spark.createDataFrame([("k", 5, 0), ("k", 5, 0), ("k", 5, 1),
                                ("k", 5, 1)], "k string, v long, g int")
    r = msprt_two_sample(df, ["k"], "v", "g").collect()[0]
    assert (r.p_e6, r.mde_e4, r.v_e9) == (1_000_000, 0, 0)


def test_cochran_armitage_detects_planted_trend(spark):
    """A linear ramp in hit share across scores 1..5 gives a large
    positive z; a flat share gives |z| ~ 0."""
    from melt_spark.functions.hypothesis import cochran_armitage

    rows = []
    for w in range(1, 6):
        for i in range(100):
            rows.append(("ramp", w, 1 if i < w * 15 else 0))
            rows.append(("flat", w, 1 if i < 40 else 0))
    df = spark.createDataFrame(rows, "k string, w int, y int")
    out = {(r.k, r.score): r for r in
           cochran_armitage(df, ["k"], "w", "y").collect()}
    assert out[("ramp", 1)].z_e6 > 5_000_000    # z > 5
    assert abs(out[("flat", 3)].z_e6) < 1_000   # z ~ 0 exactly flat
    assert out[("ramp", 2)].n_i == 100
    assert out[("ramp", 5)].r_i == 75


def test_cochran_armitage_degenerate_all_hits(spark):
    from melt_spark.functions.hypothesis import cochran_armitage

    df = spark.createDataFrame([("k", w, 1) for w in (1, 2, 3)],
                               "k string, w int, y int")
    assert all(r.z_e6 == 0 for r in
               cochran_armitage(df, ["k"], "w", "y").collect())


def test_srm_detects_broken_split(spark):
    from melt_spark.functions.hypothesis import srm_check

    rows = [("ok", i % 2) for i in range(1000)] \
        + [("bad", 0)] * 700 + [("bad", 1)] * 300
    df = spark.createDataFrame(rows, "k string, g int")
    out = {r.k: r for r in srm_check(df, ["k"], "g").collect()}
    assert (out["ok"].srm, out["ok"].chi2_e6) == (0, 0)
    assert out["bad"].srm == 1
    assert out["bad"].chi2_e6 == 160_000_000   # (400)^2/1000 = 160


def test_did_hand_computed(spark):
    """Treat rises by 10 post, control by 2 -> DiD = 8 exactly."""
    from melt_spark.functions.hypothesis import diff_in_diff

    rows = []
    for i in range(50):
        rows.append(("k", 100 + (i % 3), 0, 0))     # ctrl pre ~101
        rows.append(("k", 102 + (i % 3), 0, 1))     # ctrl post +2
        rows.append(("k", 200 + (i % 3), 1, 0))     # treat pre ~201
        rows.append(("k", 210 + (i % 3), 1, 1))     # treat post +10
    df = spark.createDataFrame(rows, "k string, v long, g int, p int")
    out = diff_in_diff(df, ["k"], "v", "g", "p").collect()
    assert len(out) == 4
    assert all(r.did_e4 == 80_000 for r in out)     # 8.0000
    assert all(r.se_e4 > 0 for r in out)
    cells = {(r.grp, r.period): r.n for r in out}
    assert cells == {(0, 0): 50, (0, 1): 50, (1, 0): 50, (1, 1): 50}


def test_did_degenerate_key_zeroes_estimate(spark):
    """A key missing one of the four (grp, period) cells has no DiD —
    the missing cell must not enter the contrast as mean 0.0; did/se
    zero out while the populated cell rows still report n/sum."""
    from melt_spark.functions.hypothesis import diff_in_diff

    rows = []
    for i in range(20):
        # 'full' has all four cells; 'gap' lacks (g=1, p=1)
        rows += [("full", 10 + i % 2, 0, 0), ("full", 12 + i % 2, 0, 1),
                 ("full", 20 + i % 2, 1, 0), ("full", 30 + i % 2, 1, 1),
                 ("gap", 10 + i % 2, 0, 0), ("gap", 12 + i % 2, 0, 1),
                 ("gap", 20 + i % 2, 1, 0)]
    df = spark.createDataFrame(rows, "k string, v long, g int, p int")
    out = diff_in_diff(df, ["k"], "v", "g", "p").collect()
    gap = [r for r in out if r.k == "gap"]
    full = [r for r in out if r.k == "full"]
    assert len(gap) == 3 and len(full) == 4
    assert all(r.did_e4 == 0 and r.se_e4 == 0 for r in gap)
    assert all(r.did_e4 == 80_000 for r in full)    # (30-20)-(12-10)=8
    assert all(r.n == 20 for r in gap)


def test_did_nonbinary_cell_cannot_stand_in_for_missing_cell(spark):
    """Four populated cells but one is (g=2, p=1): the binary contrast
    is still missing (1,1), so did/se must zero (r9 review finding —
    a row-count guard admitted the mean-0.0 bug through non-binary
    cohort values)."""
    from melt_spark.functions.hypothesis import diff_in_diff

    rows = []
    for i in range(10):
        rows += [("k", 10, 0, 0), ("k", 12, 0, 1),
                 ("k", 20, 1, 0), ("k", 30, 2, 1)]
    df = spark.createDataFrame(rows, "k string, v long, g int, p int")
    out = diff_in_diff(df, ["k"], "v", "g", "p").collect()
    assert len(out) == 4
    assert all(r.did_e4 == 0 and r.se_e4 == 0 for r in out)
