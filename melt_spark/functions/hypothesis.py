"""Distributed hypothesis tests over exact integer statistics — the
rank-based and digit-law complements to the suite's two-proportion z-test
(q_ab_test), KS drift (q_ks_drift) and PSI (q_psi_drift).

Background (public): Mann & Whitney, "On a test of whether one of two
random variables is stochastically larger than the other" (Ann. Math.
Statist. 1947), with the standard tie correction (e.g. Lehmann,
"Nonparametrics"); Benford, "The law of anomalous numbers" (Proc. Am.
Phil. Soc. 1938) — the first-digit law auditors run against financial
figures (Nigrini's forensic-accounting canon).

Determinism discipline (NOTES.md): every statistic that can be an exact
integer IS one (doubled rank sums so tie-averaged ranks stay integral;
tie correction as Σ(t³−t) in BIGINT; digit counts), and the few float
outputs (z, χ²) are pinned-order IEEE expressions rounded once — the
only transcendental (log10 in Benford's expected shares) follows the
round()-both-engines rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .util import one_partition
from pyspark.sql.window import Window


def _mw_stats_exact(base: DataFrame, key_cols: list[str]) -> DataFrame:
    """(keys..., n0, n1, __r0_2x, tie_cube) from EXACT per-key ranks.
    ``base`` carries (keys..., __v, __g)."""
    w = Window.partitionBy(*key_cols).orderBy("__v")
    ranked = base.withColumn("__r", F.rank().over(w))
    ties = (ranked.groupBy(*key_cols, "__v")
            .agg(F.count(F.lit(1)).alias("__t"))
            .select(*key_cols, "__v",
                    (F.col("__t") * F.col("__t") * F.col("__t")
                     - F.col("__t")).alias("__t3t"),
                    F.col("__t")))
    # doubled tie-averaged rank: 2r + t - 1
    j = ranked.join(ties, [*key_cols, "__v"])
    agg = (j.groupBy(*key_cols).agg(
        F.sum(F.when(F.col("__g") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0"),
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("__g") == 0,
                     2 * F.col("__r") + F.col("__t") - 1).otherwise(0))
        .cast("bigint").alias("__r0_2x")))
    # ties is already unique per (keys, value) — aggregate the cube term
    # directly (an inner groupBy/first here would be a wasted shuffle)
    tie_tot = (ties.groupBy(*key_cols)
               .agg(F.sum("__t3t").cast("bigint").alias("tie_cube")))
    return agg.join(tie_tot, key_cols)


def _mw_stats_bucketed(base: DataFrame, key_cols: list[str],
                       n_buckets: int) -> DataFrame:
    """Same stats from BUCKETED midranks — the skew hatch. Values
    quantize into ``n_buckets`` equal-width bins over the key's own
    [min, max]; every row in a bin is treated as tied at the bin's
    midrank (the KS/PSI binning discipline). All shuffles move
    (key, bucket) aggregates: no per-key sort of raw rows exists
    anywhere, so one pathological key costs n_buckets rows, not a
    single-task sort of its whole population. Deterministic — the
    approximation is a function of the data, not the partitioning."""
    rng = base.groupBy(*key_cols).agg(F.min("__v").alias("__lo"),
                                      F.max("__v").alias("__hi"))
    span = (F.col("__hi") - F.col("__lo") + 1).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__v") - F.col("__lo")).cast("double")
                * F.lit(float(n_buckets)) / span)).cast("int")
    bb = base.join(rng, key_cols).select(*key_cols, "__g",
                                         bucket.alias("__b"))
    cnt = (bb.groupBy(*key_cols, "__b")
           .agg(F.sum(F.when(F.col("__g") == 0, 1).otherwise(0))
                .cast("bigint").alias("__n0b"),
                F.sum(F.when(F.col("__g") == 1, 1).otherwise(0))
                .cast("bigint").alias("__n1b")))
    wb = Window.partitionBy(*key_cols).orderBy("__b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    tb = F.col("__n0b") + F.col("__n1b")
    cum = cnt.withColumn("__before",
                         F.coalesce(F.sum(F.col("__n0b")
                                          + F.col("__n1b")).over(wb),
                                    F.lit(0)))
    # a bin of t rows starting at rank __before+1 has doubled midrank
    # 2(__before+1) + t - 1; group-0 contributes __n0b of them
    return (cum.groupBy(*key_cols)
            .agg(F.sum("__n0b").cast("bigint").alias("n0"),
                 F.sum("__n1b").cast("bigint").alias("n1"),
                 F.sum(F.col("__n0b")
                       * (2 * F.col("__before") + tb + 1))
                 .cast("bigint").alias("__r0_2x"),
                 F.sum(tb * tb * tb - tb).cast("bigint")
                 .alias("tie_cube")))


def _mw_finalize(out: DataFrame, key_cols: list[str],
                 extra_cols: list[str] | None = None) -> DataFrame:
    u0_2x = (F.col("__r0_2x")
             - F.col("n0") * (F.col("n0") + 1)).alias("u0_2x")
    # U0 + U1 = n0*n1, doubled: u1_2x = 2*n0*n1 - u0_2x
    res = out.select(*key_cols, "n0", "n1", u0_2x, "tie_cube",
                     *(extra_cols or []))
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    nd = (F.col("n0") + F.col("n1")).cast("double")
    # tie-corrected variance of U: n0*n1/12 * ((n+1) - Σ(t³−t)/(n(n−1)))
    var = (n0d * n1d / F.lit(12.0)
           * ((nd + F.lit(1.0))
              - F.col("tie_cube").cast("double")
              / (nd * (nd - F.lit(1.0)))))
    # z from the DOUBLED statistic: (u0_2x - n0*n1) / (2*sqrt(var));
    # guard the degenerate all-tied / single-group case (var == 0)
    z = F.when(var > 0,
               (F.col("u0_2x").cast("double") - n0d * n1d)
               / (F.lit(2.0) * F.sqrt(var))).otherwise(F.lit(0.0))
    return res.select(
        *key_cols, "n0", "n1", "u0_2x",
        (2 * F.col("n0") * F.col("n1") - F.col("u0_2x")).alias("u1_2x"),
        "tie_cube",
        F.round(z * F.lit(1_000_000.0)).cast("bigint").alias("z_e6"),
        *(extra_cols or []))


def mann_whitney_u(df: DataFrame, key_cols: list[str], value_col: str,
                   group_col: str,
                   max_exact_rows: int | None = None,
                   n_buckets: int = 256) -> DataFrame:
    """Per-key two-sample Mann-Whitney U (Wilcoxon rank-sum) between
    group 0 and group 1 rows of ``value_col`` (integer-valued;
    ``group_col`` ∈ {0, 1}).

    Returns (keys..., n0, n1, u0_2x, u1_2x, tie_cube, z_e6): doubled U
    statistics (exact — doubling keeps tie-averaged ranks integral:
    a run of t tied values starting at rank r has average rank
    r + (t-1)/2, i.e. doubled 2r + t - 1), the tie-correction term
    Σ(t³−t), and the tie-corrected normal approximation in 1e-6 units.

    Spark-first shape, graded for 100 TB: ranks come from a window
    PARTITIONED by key (distributes; no global sort), tie runs from one
    map-side-combined groupBy(keys, value) — both shuffles move
    (key, int) pairs. Skewed keys cost one per-key sort of their own
    rows, the unavoidable floor for exact ranks.

    ``max_exact_rows`` (r8, the skew hatch): when set, keys with more
    rows than the threshold switch to the bucketed-midrank
    approximation (``_mw_stats_bucketed``) — per-key cost drops from
    sort(n_k) to n_buckets aggregate rows, at the price of midrank
    quantization. The output gains an ``exact`` flag column (1 = exact
    ranks, 0 = bucketed) so downstream consumers see which regime each
    key ran in. Default None keeps the exact path and the original
    schema (the oracle-checked shape)."""
    base = df.select(*key_cols, F.col(value_col).alias("__v"),
                     F.col(group_col).alias("__g"))
    if max_exact_rows is None:
        return _mw_finalize(_mw_stats_exact(base, key_cols), key_cols)
    sizes = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__nk"))
    tagged = base.join(sizes, key_cols)
    small = tagged.filter(F.col("__nk") <= max_exact_rows) \
        .drop("__nk")
    big = tagged.filter(F.col("__nk") > max_exact_rows).drop("__nk")
    ex = _mw_stats_exact(small, key_cols) \
        .withColumn("exact", F.lit(1))
    ap = _mw_stats_bucketed(big, key_cols, n_buckets) \
        .withColumn("exact", F.lit(0))
    return _mw_finalize(ex.unionByName(ap), key_cols,
                        extra_cols=["exact"])


# Benford expected first-digit shares log10(1 + 1/d), d = 1..9, in ppm —
# rounded ONCE here (a transcendental per the NOTES discipline) and
# embedded as exact integer literals in both engines' plans.
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_digits(df: DataFrame, value_col: str,
                   key_cols: list[str] | None = None) -> DataFrame:
    """First-significant-digit audit of a positive integer column
    against Benford's law. Returns per (keys..., digit): n_obs, n_total,
    exp_ppm (the law's share as an exact ppm literal) and chi2_e6 — this
    digit's χ² contribution n_total·(p_obs − p_exp)²/p_exp in 1e-6
    units, a pinned-order IEEE expression rounded once (sum the column
    for the statistic; 8 degrees of freedom).

    The counts are DENSIFIED against the fixed 1..9 digit domain (the
    chi2_independence margin discipline): a digit with ZERO occurrences
    still emits its row with n_obs = 0 and chi2 contribution n_total·p
    — omitting it would understate the statistic exactly when the data
    is most anomalous (every value starting with the same digit).

    One map-side-combined groupBy on (keys, digit) — 9 rows per key, no
    other shuffle; the digit is string arithmetic on the integer."""
    key_cols = list(key_cols or [])
    digit = F.substring(F.col(value_col).cast("string"), 1, 1) \
        .cast("int").alias("digit")
    counts = (df.filter(F.col(value_col) > 0)
              .select(*key_cols, digit)
              .groupBy(*key_cols, "digit")
              .agg(F.count(F.lit(1)).alias("n_obs")))
    digit_dom = (df.sparkSession.range(1, 10)
                 .select(F.col("id").cast("int").alias("digit")))
    if key_cols:
        dom = (counts.select(*key_cols).distinct()
               .crossJoin(F.broadcast(digit_dom)))
        w = Window.partitionBy(*key_cols)
    else:
        dom = digit_dom
        w = Window.partitionBy(one_partition(F.col("digit")))
    dense = (dom.join(counts, [*key_cols, "digit"], "left")
             .withColumn("n_obs",
                         F.coalesce(F.col("n_obs"), F.lit(0))
                         .cast("bigint"))
             # the densified frame is exactly 9 rows per key; keyless,
             # the no-op limit keeps the bound plan-visible for lint
             )
    if not key_cols:
        dense = dense.limit(9)
    dense = dense.withColumn("n_total", F.sum("n_obs").over(w))
    exp_ppm = F.element_at(
        F.create_map(*[F.lit(x) for d, p in sorted(BENFORD_PPM.items())
                       for x in (d, p)]), F.col("digit"))
    p_obs = F.col("n_obs").cast("double") / F.col("n_total").cast("double")
    p_exp = exp_ppm.cast("double") / F.lit(1_000_000.0)
    chi2 = F.when(F.col("n_total") > 0,
                  F.col("n_total").cast("double") * (p_obs - p_exp)
                  * (p_obs - p_exp) / p_exp).otherwise(F.lit(0.0))
    return dense.select(
        *key_cols, "digit", "n_obs", F.col("n_total").cast("bigint")
        .alias("n_total"), exp_ppm.cast("bigint").alias("exp_ppm"),
        F.round(chi2 * F.lit(1_000_000.0)).cast("bigint").alias("chi2_e6"))


def kaplan_meier(df: DataFrame, id_col: str, ts_col: str,
                 evt_col: str, group_col: str | None = None) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate (Kaplan & Meier,
    "Nonparametric estimation from incomplete observations", JASA 1958)
    of time-to-first-qualifying-event: per subject, duration = days from
    first activity to the first row where ``evt_col`` is true (an
    OBSERVED event); subjects with no qualifying row are RIGHT-CENSORED
    at the corpus' last activity date. Ties follow the standard
    convention: same-day censorings leave the risk set after the events.

    Returns per distinct duration t (ascending): n_risk (subjects with
    duration >= t), d_evt (observed events at t), n_censored, and s_e6 —
    the survival curve S(t) = Π_{t_j <= t} (1 - d_j / n_risk_j) in 1e-6
    units.

    Spark-first shape, graded for 100 TB: one map-side-combined groupBy
    per subject, one per duration; the duration table is bounded by the
    corpus' day span, so the KM fold runs as array expressions over ONE
    collected row (the otsu/ks bounded-domain pattern — never
    point-cardinality). S is a left-fold of IEEE doubles in pinned
    ascending order, rounded once (the DuckDB oracle folds the same
    factor list with list_reduce).

    ``group_col`` (r8): fit one INDEPENDENT curve per group — the
    per-variant survival table every experimentation readout plots
    beside the log-rank statistic. Censoring stays administrative at
    the GLOBAL last activity date (the study end, shared by variants);
    the bounded fold runs per group, so the output gains a leading
    group column and nothing else changes shape."""
    gcols = [group_col] if group_col else []
    per = (df.groupBy(*gcols, id_col)
           .agg(F.min(F.to_date(ts_col)).alias("__t0"),
                F.min(F.when(F.col(evt_col), F.to_date(ts_col)))
                .alias("__tp"),
                F.max(F.to_date(ts_col)).alias("__t1")))
    gmax = per.agg(F.max("__t1").alias("__gmax"))
    rows = (per.crossJoin(F.broadcast(gmax))
            .select(*gcols,
                    F.datediff(F.coalesce("__tp", "__gmax"), "__t0")
                    .alias("dur"),
                    F.col("__tp").isNotNull().cast("long").alias("evt")))
    g = (rows.groupBy(*gcols, "dur")
         .agg(F.sum("evt").alias("d"),
              F.count(F.lit(1)).alias("n_all")))
    one = g.groupBy(*gcols).agg(F.sort_array(F.collect_list(
        F.struct("dur", "d", "n_all"))).alias("a"),
        F.sum("n_all").cast("long").alias("total"))
    # n_risk_j = total - #(dur < t_j); factors[j] = 1 - d_j / n_risk_j;
    # S at index i = left fold of factors[1..i] — all array expressions
    # over the ONE bounded row, O(span²) on a few dozen elements
    prefix = ("aggregate(filter(a, y -> y.dur < x.dur), 0L,"
              " (p, y) -> p + y.n_all)")
    ex = (one
          .withColumn("factors", F.expr(
              f"transform(a, x -> 1.0D - CAST(x.d AS DOUBLE)"
              f" / CAST(total - {prefix} AS DOUBLE))"))
          .select(*gcols, "a", "total", "factors",
                  F.posexplode("a").alias("pos", "x")))
    n_risk = F.col("total") - F.expr(
        "aggregate(slice(a, 1, pos), 0L, (p, y) -> p + y.n_all)")
    s = F.expr("aggregate(slice(factors, 1, pos + 1), 1.0D,"
               " (p, f) -> p * f)")
    return ex.select(
        *gcols,
        F.col("x.dur").alias("dur_days"),
        n_risk.cast("bigint").alias("n_risk"),
        F.col("x.d").cast("bigint").alias("d_evt"),
        (F.col("x.n_all") - F.col("x.d")).cast("bigint")
        .alias("n_censored"),
        F.round(s * F.lit(1_000_000.0)).cast("bigint").alias("s_e6"))


def chi2_independence(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pearson chi-square test of independence over the (a, b)
    contingency table (Pearson 1900). Returns per cell: n_obs, row_tot,
    col_tot, n_total (exact integers) and chi2_e6 — the cell's
    (O − E)²/E contribution in 1e-6 units with E = row·col/n computed
    in pinned IEEE order (sum the column for the statistic;
    (R−1)(C−1) degrees of freedom).

    One map-side-combined groupBy on the cell; row/col margins re-join
    from two more tiny aggregates (each bounded by the category
    cardinality — broadcast). The margin CROSS JOIN densifies the
    table: unobserved cells get O = 0 rows, whose (0−E)²/E = E
    contribution a sparse table's statistic needs."""
    cells = (df.groupBy(a_col, b_col)
             .agg(F.count(F.lit(1)).alias("n_obs")))
    rows = df.groupBy(a_col).agg(F.count(F.lit(1)).alias("row_tot"))
    cols = df.groupBy(b_col).agg(F.count(F.lit(1)).alias("col_tot"))
    tot = df.agg(F.count(F.lit(1)).alias("n_total"))
    dense = rows.crossJoin(F.broadcast(cols))
    out = (dense.join(F.broadcast(cells), [a_col, b_col], "left")
           .crossJoin(F.broadcast(tot))
           .withColumn("n_obs", F.coalesce("n_obs", F.lit(0))))
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
         / F.col("n_total").cast("double"))
    o = F.col("n_obs").cast("double")
    chi2 = (o - e) * (o - e) / e
    return out.select(
        a_col, b_col,
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.col("row_tot").cast("bigint").alias("row_tot"),
        F.col("col_tot").cast("bigint").alias("col_tot"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(chi2 * F.lit(1_000_000.0)).cast("bigint").alias("chi2_e6"))


def log_rank(df: DataFrame, id_col: str, ts_col: str, evt_col: str,
             group_col: str) -> DataFrame:
    """Two-group log-rank test (Mantel, "Evaluation of survival data and
    two new rank order statistics", Cancer Chemother. Rep. 1966) on the
    same time-to-first-qualifying-event durations as kaplan_meier, with
    the same administrative censoring. ``group_col`` ∈ {0, 1} per
    subject (taken from the subject's first row by min — pass a
    per-subject constant).

    Returns per distinct duration t: n0_risk, n1_risk, d0, d1 (exact
    integers), e0_e6 (group 0's expected events d·n0/n) and v_e6 (the
    hypergeometric variance term), plus one dur_days = -1 summary row
    with the chi-square statistic (Σd0 − ΣE0)²/ΣV in the chi2_e6 slot
    (1 df). Float columns are pinned IEEE expressions rounded once.

    Scale shape: identical to kaplan_meier — per-subject then
    per-duration map-side-combined aggregates; everything after runs on
    the bounded duration table as array expressions."""
    per = (df.groupBy(id_col)
           .agg(F.min(F.to_date(ts_col)).alias("__t0"),
                F.min(F.when(F.col(evt_col), F.to_date(ts_col)))
                .alias("__tp"),
                F.max(F.to_date(ts_col)).alias("__t1"),
                F.min(group_col).alias("__g")))
    gmax = per.agg(F.max("__t1").alias("__gmax"))
    rows = (per.crossJoin(F.broadcast(gmax))
            .select(F.datediff(F.coalesce("__tp", "__gmax"), "__t0")
                    .alias("dur"),
                    F.col("__tp").isNotNull().cast("long").alias("evt"),
                    F.col("__g").alias("g")))
    g = (rows.groupBy("dur").agg(
        F.sum(F.when((F.col("g") == 0) & (F.col("evt") == 1), 1)
              .otherwise(0)).alias("d0"),
        F.sum(F.when((F.col("g") == 1) & (F.col("evt") == 1), 1)
              .otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("a0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("a1")))
    one = g.agg(F.sort_array(F.collect_list(
        F.struct("dur", "d0", "d1", "a0", "a1"))).alias("a"),
        F.sum("a0").cast("long").alias("t0"),
        F.sum("a1").cast("long").alias("t1"))
    pre0 = ("aggregate(filter(a, y -> y.dur < x.dur), 0L,"
            " (p, y) -> p + y.a0)")
    pre1 = ("aggregate(filter(a, y -> y.dur < x.dur), 0L,"
            " (p, y) -> p + y.a1)")
    ex = (one.select("t0", "t1", F.posexplode("a").alias("pos", "x"),
                     F.expr(f"transform(a, x -> t0 - {pre0})")
                     .alias("r0s"),
                     F.expr(f"transform(a, x -> t1 - {pre1})")
                     .alias("r1s"))
          .select("t0", "t1", "pos", "x",
                  F.expr("element_at(r0s, pos + 1)").alias("n0r"),
                  F.expr("element_at(r1s, pos + 1)").alias("n1r")))
    d = (F.col("x.d0") + F.col("x.d1")).cast("double")
    n0 = F.col("n0r").cast("double")
    n1 = F.col("n1r").cast("double")
    n = n0 + n1
    e0 = d * n0 / n
    v = F.when(n > 1,
               d * (n0 / n) * (n1 / n) * (n - d) / (n - F.lit(1.0))) \
        .otherwise(F.lit(0.0))
    detail = ex.select(
        F.col("x.dur").alias("dur_days"),
        F.col("n0r").cast("bigint").alias("n0_risk"),
        F.col("n1r").cast("bigint").alias("n1_risk"),
        F.col("x.d0").cast("bigint").alias("d0"),
        F.col("x.d1").cast("bigint").alias("d1"),
        F.round(e0 * F.lit(1_000_000.0)).cast("bigint").alias("e0_e6"),
        F.round(v * F.lit(1_000_000.0)).cast("bigint").alias("v_e6"),
        (e0 * F.lit(0.0)).alias("__o"), e0.alias("__e"), v.alias("__v"),
        F.col("x.d0").cast("double").alias("__d0"))
    # keyless 4-row-in -> 1-row-out aggregate (lint: keyless partial agg)
    summary = detail.agg(
        F.sum("__d0").alias("so"), F.sum("__e").alias("se"),
        F.sum("__v").alias("sv")).select(
        F.lit(-1).cast("bigint").alias("dur_days"),
        F.lit(-1).cast("bigint").alias("n0_risk"),
        F.lit(-1).cast("bigint").alias("n1_risk"),
        F.lit(-1).cast("bigint").alias("d0"),
        F.lit(-1).cast("bigint").alias("d1"),
        F.lit(-1).cast("bigint").alias("e0_e6"),
        F.when(F.col("sv") > 0,
               F.round((F.col("so") - F.col("se"))
                       * (F.col("so") - F.col("se"))
                       / F.col("sv") * F.lit(1_000_000.0)))
        .otherwise(F.lit(0.0)).cast("bigint").alias("v_e6"))
    return (detail.drop("__o", "__e", "__v", "__d0")
            .unionByName(summary))


def random_group_ci(df: DataFrame, value_col: str, hash_col: str,
                    n_reps: int = 16) -> DataFrame:
    """Half-sample replication variance estimate and CI for the mean —
    the random-group / balanced-half-sample family of survey-sampling
    variance estimators (Wolter, "Introduction to Variance Estimation";
    McCarthy's BRR lineage), made DETERMINISTIC: replicate r contains
    the rows whose portable 48-bit hash has bit r set, so every
    replicate is a reproducible ~half-sample and the whole estimate is
    engine-checkable (no RNG).

    Returns n_reps replicate rows (rep, n, sum_v, mean_e4) and one
    rep = -1 summary row carrying the full-sample mean, the replication
    standard error se_e4 (sqrt((1/R) Σ (θ_r − θ̂)²), the half-sample
    convention) and the ±1.96·se normal CI bounds. Counts and sums are
    exact BIGINTs; the few float outputs are pinned IEEE expressions
    rounded once.

    Scale shape: ONE map-side explode of n_reps replicate tags whose
    partial aggregates combine before the shuffle — the shuffle moves
    n_reps rows per task no matter the input size (the CMS/Bloom
    fixed-size-shuffle pattern); the summary is an n_reps-row fold.

    n_reps is capped at 48 (the portable hash width): one replicate per
    hash bit — more would silently alias replicates (duplicate
    half-samples inflating apparent precision). The replicate detail is
    DENSIFIED against the 0..n_reps-1 domain: an empty replicate still
    emits its row (n = 0, mean_e4 = 0) and contributes deviation 0 to
    the SE sum while R stays fixed at n_reps — dropping it would both
    hide the degenerate replicate and shrink the deviation sum."""
    if not 1 <= n_reps <= 48:
        raise ValueError(f"n_reps must be in 1..48 (one replicate per "
                         f"48-bit hash bit), got {n_reps}")
    tagged = (df.select(F.col(value_col).alias("__v"),
                        F.col(hash_col).alias("__h"))
              .select("__v", F.explode(F.sequence(
                  F.lit(0), F.lit(n_reps - 1))).alias("rep"), "__h")
              .filter(F.expr("(shiftright(__h, rep) & 1) = 1")))
    rep_dom = (df.sparkSession.range(0, n_reps)
               .select(F.col("id").cast("int").alias("rep")))
    got = (tagged.groupBy("rep")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__v").cast("long").alias("sum_v")))
    reps = (rep_dom.join(got, "rep", "left")
            .select("rep",
                    F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("n"),
                    F.coalesce(F.col("sum_v"), F.lit(0)).cast("long")
                    .alias("sum_v")))
    reps = reps.withColumn(
        "mean_e4",
        F.when(F.col("n") > 0,
               F.round(F.col("sum_v").cast("double")
                       / F.col("n").cast("double") * F.lit(10_000.0)))
        .otherwise(F.lit(0)).cast("bigint"))
    full = df.agg(F.count(F.lit(1)).cast("long").alias("__fn"),
                  F.sum(value_col).cast("long").alias("__fs"))
    theta = F.col("__fs").cast("double") / F.col("__fn").cast("double")
    # an empty replicate contributes deviation 0 (not NaN) while R
    # stays fixed at n_reps
    dev = F.when(F.col("n") > 0,
                 F.col("sum_v").cast("double") / F.col("n").cast("double")
                 - theta).otherwise(F.lit(0.0))
    summ = (reps.limit(n_reps).crossJoin(F.broadcast(full))
            .agg(F.sum(dev * dev).alias("__ss"),
                 F.first("__fn").alias("n"),
                 F.first("__fs").alias("sum_v"),
                 F.first(theta).alias("__theta"))
            .select(
                F.lit(-1).cast("int").alias("rep"), "n", "sum_v",
                F.round(F.col("__theta") * F.lit(10_000.0))
                .cast("bigint").alias("mean_e4"),
                F.round(F.sqrt(F.col("__ss") / F.lit(float(n_reps)))
                        * F.lit(10_000.0)).cast("bigint").alias("se_e4"),
                F.round((F.col("__theta")
                         - F.lit(1.96) * F.sqrt(F.col("__ss")
                                                / F.lit(float(n_reps))))
                        * F.lit(10_000.0)).cast("bigint")
                .alias("ci_lo_e4"),
                F.round((F.col("__theta")
                         + F.lit(1.96) * F.sqrt(F.col("__ss")
                                                / F.lit(float(n_reps))))
                        * F.lit(10_000.0)).cast("bigint")
                .alias("ci_hi_e4")))
    detail = reps.select(
        F.col("rep").cast("int").alias("rep"), "n", "sum_v", "mean_e4",
        F.lit(-1).cast("bigint").alias("se_e4"),
        F.lit(-1).cast("bigint").alias("ci_lo_e4"),
        F.lit(-1).cast("bigint").alias("ci_hi_e4"))
    return detail.unionByName(summ)


def cuped_adjust(df: DataFrame, y_col: str, x_col: str,
                 group_col: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, "Improving the sensitivity of online controlled experiments
    by utilizing pre-experiment data", WSDM 2013): the adjusted metric
    is Ycv = Y − θ(X − X̄) with θ = cov(X, Y)/var(X) estimated on the
    POOLED sample (both variants, the paper's recommendation), where X
    is a pre-experiment covariate — Ycv has the same expectation as Y
    but lower variance whenever X correlates with Y.

    Input: one row per subject with integer metrics ``y_col`` (the
    experiment metric), ``x_col`` (the pre-period covariate) and
    ``group_col`` ∈ {0, 1}. Returns two variant rows (kind='variant':
    n, sum_x, sum_y exact; mean_y_e6, mean_ycv_e6, var_y_e9, var_ycv_e9
    rounded once) and one kind='summary' row re-using the same columns
    as slots: n=theta_e6, sum_x=diff_raw_e6 (variant1 − variant0 raw
    means), sum_y=diff_cv_e6 (adjusted means),
    mean_y_e6=var_reduction_ppm (1 − Σvar_cv/Σvar_y),
    mean_ycv_e6=z_cv_e4 (the adjusted two-sample z,
    diff_cv / sqrt(Σ var_cv_g/n_g)). Pooled and per-variant second
    moments are exact BIGINT sums; every derived float is a pinned
    IEEE expression.

    Scale shape: two map-side-combined aggregates (pooled 1 row,
    per-variant 2 rows) — nothing grows with subject count but the
    combines."""
    pooled = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x_col).cast("long").alias("sx"),
        F.sum(y_col).cast("long").alias("sy"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx"),
        F.sum(F.col(x_col) * F.col(y_col)).cast("long").alias("sxy"))
    per = (df.groupBy(F.col(group_col).alias("variant"))
           .agg(F.count(F.lit(1)).cast("long").alias("ng"),
                F.sum(x_col).cast("long").alias("gx"),
                F.sum(y_col).cast("long").alias("gy"),
                F.sum(F.col(x_col) * F.col(x_col)).cast("long")
                .alias("gxx"),
                F.sum(F.col(y_col) * F.col(y_col)).cast("long")
                .alias("gyy"),
                F.sum(F.col(x_col) * F.col(y_col)).cast("long")
                .alias("gxy")))
    j = per.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    theta_num = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    theta_den = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    theta = F.when(theta_den > 0, theta_num / theta_den) \
        .otherwise(F.lit(0.0))
    ngd = F.col("ng").cast("double")
    my = F.col("gy").cast("double") / ngd
    mx = F.col("gx").cast("double") / ngd
    xbar = F.col("sx").cast("double") / nd
    mycv = my - theta * (mx - xbar)
    var_y = (F.col("gyy").cast("double") / ngd - my * my)
    var_x = (F.col("gxx").cast("double") / ngd - mx * mx)
    cov_xy = (F.col("gxy").cast("double") / ngd - mx * my)
    var_cv = var_y + theta * theta * var_x \
        - F.lit(2.0) * theta * cov_xy
    variants = j.select(
        F.lit("variant").alias("kind"),
        F.col("variant").cast("int").alias("variant"),
        F.col("ng").alias("n"), F.col("gx").alias("sum_x"),
        F.col("gy").alias("sum_y"),
        F.round(my * F.lit(1e6)).cast("bigint").alias("mean_y_e6"),
        F.round(mycv * F.lit(1e6)).cast("bigint").alias("mean_ycv_e6"),
        F.round(var_y * F.lit(1e9)).cast("bigint").alias("var_y_e9"),
        F.round(var_cv * F.lit(1e9)).cast("bigint").alias("var_ycv_e9"),
        theta.alias("__theta"), mycv.alias("__mycv"), my.alias("__my"),
        (var_cv / ngd).alias("__vn"), var_y.alias("__vy"),
        var_cv.alias("__vc"))
    # summary from the 2 variant rows (bounded fold)
    v = variants.limit(2)
    summ = v.agg(
        F.first("__theta").alias("th"),
        F.sum(F.when(F.col("variant") == 1, F.col("__my"))
              .otherwise(-F.col("__my"))).alias("draw"),
        F.sum(F.when(F.col("variant") == 1, F.col("__mycv"))
              .otherwise(-F.col("__mycv"))).alias("dcv"),
        F.sum("__vn").alias("vsum"),
        F.sum("__vy").alias("vy2"), F.sum("__vc").alias("vc2")
    ).select(
        F.lit("summary").alias("kind"),
        F.lit(-1).cast("int").alias("variant"),
        F.round(F.col("th") * F.lit(1e6)).cast("bigint").alias("n"),
        F.round(F.col("draw") * F.lit(1e6)).cast("bigint")
        .alias("sum_x"),
        F.round(F.col("dcv") * F.lit(1e6)).cast("bigint").alias("sum_y"),
        F.when(F.col("vy2") > 0,
               F.round((F.lit(1.0) - F.col("vc2") / F.col("vy2"))
                       * F.lit(1e6))).otherwise(F.lit(0.0))
        .cast("bigint").alias("mean_y_e6"),
        F.when(F.col("vsum") > 0,
               F.round(F.col("dcv") / F.sqrt(F.col("vsum"))
                       * F.lit(1e4))).otherwise(F.lit(0.0))
        .cast("bigint").alias("mean_ycv_e6"),
        F.lit(-1).cast("bigint").alias("var_y_e9"),
        F.lit(-1).cast("bigint").alias("var_ycv_e9"))
    return (variants.drop("__theta", "__mycv", "__my", "__vn", "__vy",
                          "__vc")
            .unionByName(summ))


def bh_stepup(scored: DataFrame, p_col: str, tie_col: str,
              q_ppm: int = 100_000) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg,
    "Controlling the false discovery rate", JRSS-B 1995) over a SMALL,
    bounded battery of tests: reject H_(1..k) where k is the LARGEST i
    with p_(i) <= i·q/m — including any non-passing p's below rank k
    (the step-up property a naive per-row threshold misses).

    ``scored`` must be bounded (certify with .limit before calling —
    the single-partition sort is over the battery, never data);
    ``p_col`` is an integer p in 1e-6 units so the comparison
    p_e6 · m <= rank · q_ppm is exact integer arithmetic. Adds rank, m,
    rejected."""
    w = Window.partitionBy(one_partition(F.col(p_col)))\
        .orderBy(p_col, tie_col)
    w_all = Window.partitionBy(one_partition(F.col(p_col)))\
        .rowsBetween(Window.unboundedPreceding,
                     Window.unboundedFollowing)
    ranked = (scored
              .withColumn("rank", F.row_number().over(w))
              .withColumn("m", F.count(F.lit(1)).over(w_all))
              .withColumn("__passes",
                          (F.col(p_col) * F.col("m")
                           <= F.col("rank") * F.lit(q_ppm))
                          .cast("int")))
    max_pass = F.max(F.when(F.col("__passes") == 1, F.col("rank"))
                     .otherwise(0)).over(w_all)
    return (ranked
            .withColumn("rejected",
                        (F.col("rank") <= max_pass).cast("int"))
            .drop("__passes")
            .withColumn("rank", F.col("rank").cast("int"))
            .withColumn("m", F.col("m").cast("int")))


def welch_ttest(df: DataFrame, key_cols: list[str], value_col: str,
                group_col: str) -> DataFrame:
    """Per-key Welch's unequal-variance t-test (Welch, Biometrika 1947)
    between group 0 and group 1 of ``value_col`` — the parametric
    complement to mann_whitney_u's rank test, and the default two-sample
    test when variances differ.

    Returns (keys..., n0, n1, sum0, sum1, t_e4, df_e2): exact BIGINT
    counts/sums, the t statistic in 1e-4 units and the
    Welch-Satterthwaite degrees of freedom in 1e-2 units, both pinned
    IEEE expressions rounded once. Degenerate keys (a group with < 2
    rows, or zero pooled spread) emit t_e4 = df_e2 = 0.

    Scale shape: ONE map-side-combined groupBy per key — the stats are
    pure moments, so cost is a scan plus a key-cardinality shuffle
    (the CUPED discipline)."""
    g0 = F.col("__g") == 0
    agg = (df.select(*key_cols, F.col(value_col).alias("__v"),
                     F.col(group_col).alias("__g"))
           .groupBy(*key_cols)
           .agg(F.sum(g0.cast("long")).cast("bigint").alias("n0"),
                F.sum((~g0).cast("long")).cast("bigint").alias("n1"),
                F.sum(F.when(g0, F.col("__v")).otherwise(0))
                .cast("bigint").alias("sum0"),
                F.sum(F.when(~g0, F.col("__v")).otherwise(0))
                .cast("bigint").alias("sum1"),
                F.sum(F.when(g0, F.col("__v") * F.col("__v"))
                      .otherwise(0)).cast("bigint").alias("__ssq0"),
                F.sum(F.when(~g0, F.col("__v") * F.col("__v"))
                      .otherwise(0)).cast("bigint").alias("__ssq1")))
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    m0 = F.col("sum0").cast("double") / n0d
    m1 = F.col("sum1").cast("double") / n1d
    var0 = (F.col("__ssq0").cast("double")
            - F.col("sum0").cast("double") * F.col("sum0") / n0d) \
        / (n0d - F.lit(1.0))
    var1 = (F.col("__ssq1").cast("double")
            - F.col("sum1").cast("double") * F.col("sum1") / n1d) \
        / (n1d - F.lit(1.0))
    se2 = var0 / n0d + var1 / n1d
    ok = (F.col("n0") >= 2) & (F.col("n1") >= 2) & (se2 > 0)
    t = F.when(ok, (m0 - m1) / F.sqrt(se2)).otherwise(F.lit(0.0))
    dof = F.when(ok, se2 * se2
                 / ((var0 / n0d) * (var0 / n0d) / (n0d - F.lit(1.0))
                    + (var1 / n1d) * (var1 / n1d)
                    / (n1d - F.lit(1.0)))).otherwise(F.lit(0.0))
    return agg.select(
        *key_cols, "n0", "n1", "sum0", "sum1",
        F.round(t * F.lit(10_000.0)).cast("bigint").alias("t_e4"),
        F.round(dof * F.lit(100.0)).cast("bigint").alias("df_e2"))


def _midrank_2x(key_cols: list[str], v: str) -> Column:
    """Doubled tie-averaged midrank of column ``v`` within each key:
    2·rank + t − 1 (integral; the mann_whitney doubling discipline),
    with t the size of the value's tie run."""
    wr = Window.partitionBy(*key_cols).orderBy(v)
    wt = Window.partitionBy(*key_cols, v)
    return (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1) \
        .cast("bigint")


def spearman_corr(df: DataFrame, key_cols: list[str], x_col: str,
                  y_col: str) -> DataFrame:
    """Per-key Spearman rank correlation (Spearman 1904) between two
    integer columns, tie-handled via midranks — the monotone-association
    readout (metric drifting with time, feature vs label, ...).

    Returns (keys..., n, rho_e6): rho = Pearson correlation of the
    doubled midranks (doubling cancels), computed from exact DECIMAL(38)
    rank-product sums folded once into a pinned IEEE expression.
    Degenerate keys (constant x or y, or n < 2) emit rho_e6 = 0.

    Scale shape: two rank windows PARTITIONED by key (distribute; a
    skewed key pays its own sort, the mann_whitney floor) and one
    map-side-combined groupBy; the rank-product sums ride DECIMAL(38)
    so 2n-scale midranks cannot overflow at any replication."""
    base = (df.select(*key_cols, F.col(x_col).alias("__x"),
                      F.col(y_col).alias("__y"))
            .withColumn("__rx", _midrank_2x(key_cols, "__x"))
            .withColumn("__ry", _midrank_2x(key_cols, "__y")))
    dec = "decimal(38,0)"
    agg = (base.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("__rx").cast(dec)).alias("__sx"),
                F.sum(F.col("__ry").cast(dec)).alias("__sy"),
                F.sum((F.col("__rx") * F.col("__ry")).cast(dec))
                .alias("__sxy"),
                F.sum((F.col("__rx") * F.col("__rx")).cast(dec))
                .alias("__sxx"),
                F.sum((F.col("__ry") * F.col("__ry")).cast(dec))
                .alias("__syy")))
    nd = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    cov = F.col("__sxy").cast("double") * nd - sx * sy
    vx = F.col("__sxx").cast("double") * nd - sx * sx
    vy = F.col("__syy").cast("double") * nd - sy * sy
    rho = F.when((vx > 0) & (vy > 0),
                 cov / F.sqrt(vx * vy)).otherwise(F.lit(0.0))
    return agg.select(
        *key_cols, "n",
        F.round(rho * F.lit(1_000_000.0)).cast("bigint").alias("rho_e6"))


def kruskal_wallis(df: DataFrame, key_cols: list[str], value_col: str,
                   group_col: str) -> DataFrame:
    """Per-key Kruskal-Wallis H test (Kruskal & Wallis, JASA 1952) —
    the k-group generalization of mann_whitney_u: do ANY of the groups
    of ``group_col`` (small integers) stochastically differ on
    ``value_col``?

    Returns one row per (keys..., grp): n_g and the doubled rank sum
    r2x (exact BIGINTs), plus the key-level tie term and the
    tie-corrected H statistic in 1e-6 units repeated on every group row
    (the log_rank detail+summary discipline, flattened). The sum over
    groups Σ(r2x_g²/n_g) folds in ascending group order over ONE
    collected key row (bounded by the group cardinality — the KM
    bounded-fold pattern), so the IEEE order is pinned for both
    engines.

    Scale shape: the mann_whitney rank machinery (per-key rank window +
    tie counts) + two map-side-combined groupBys; nothing collects more
    than k group rows per key."""
    base = (df.select(*key_cols, F.col(value_col).alias("__v"),
                      F.col(group_col).alias("__g"))
            .withColumn("__r2x", _midrank_2x(key_cols, "__v"))
            .withColumn("__t", F.count(F.lit(1)).over(
                Window.partitionBy(*key_cols, "__v"))))
    per_g = (base.groupBy(*key_cols, "__g")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_g"),
                  F.sum("__r2x").cast("bigint").alias("r2x")))
    ties = (base.groupBy(*key_cols, "__v")
            .agg(F.first("__t").alias("__tt"))
            .groupBy(*key_cols)
            .agg(F.sum(F.col("__tt") * F.col("__tt") * F.col("__tt")
                       - F.col("__tt")).cast("bigint").alias("tie_cube")))
    one = (per_g.groupBy(*key_cols)
           .agg(F.sort_array(F.collect_list(
               F.struct("__g", "n_g", "r2x"))).alias("a"),
               F.sum("n_g").cast("bigint").alias("__n"))
           .join(ties, key_cols))
    nd = F.col("__n").cast("double")
    # Σ R_g²/n_g with R_g = r2x/2  →  Σ r2x²/n_g / 4, folded in group
    # order; H = 12/(N(N+1))·ΣR²/n − 3(N+1), tie-corrected by
    # C = 1 − Σ(t³−t)/(N³−N)
    s = F.expr("aggregate(a, 0.0D, (p, x) -> p"
               " + CAST(x.r2x AS DOUBLE) * CAST(x.r2x AS DOUBLE)"
               " / CAST(x.n_g AS DOUBLE))") / F.lit(4.0)
    h_raw = (F.lit(12.0) / (nd * (nd + F.lit(1.0))) * s
             - F.lit(3.0) * (nd + F.lit(1.0)))
    c = (F.lit(1.0) - F.col("tie_cube").cast("double")
         / (nd * nd * nd - nd))
    h = F.when((F.col("__n") >= 2) & (c > 0), h_raw / c) \
        .otherwise(F.lit(0.0))
    keyed = one.select(*key_cols, "a", "tie_cube",
                       F.round(h * F.lit(1_000_000.0)).cast("bigint")
                       .alias("h_e6"))
    ex = keyed.select(*key_cols, "tie_cube", "h_e6",
                      F.explode("a").alias("x"))
    return ex.select(*key_cols,
                     F.col("x.__g").cast("int").alias("grp"),
                     F.col("x.n_g").alias("n_g"),
                     F.col("x.r2x").alias("r2x"),
                     "tie_cube", "h_e6")


def msprt_two_sample(df: DataFrame, key_cols: list[str], value_col: str,
                     group_col: str, tau2: float = 10_000.0
                     ) -> DataFrame:
    """Per-key mixture-SPRT always-valid inference (Johari, Koomen,
    Pekelis & Walsh, "Peeking at A/B tests", KDD 2017) for the
    difference in means between group 0 and group 1 — the sequential
    test that stays valid under CONTINUOUS monitoring, where the fixed-
    horizon z/t tests (q_ab_test, welch_ttest) inflate false positives
    the moment anyone peeks early.

    With θ̂ = m1 − m0, V = s²(1/n0 + 1/n1) (pooled variance of the
    difference) and the normal mixture prior variance ``tau2``, the
    mixture likelihood ratio is
        Λ = sqrt(V/(V+τ²)) · exp(θ̂²τ² / (2V(V+τ²)))
    and the always-valid p-value is min(1, 1/Λ). Also emits mde_e4 —
    the fixed-horizon minimum detectable effect 2.8016·sqrt(V)
    (α=.05 two-sided, 80% power; 1.9600+0.8416 rounded once) — the
    experiment-sizing number a platform reports next to the test.

    Returns (keys..., n0, n1, theta_e4, v_e9, p_e6, mde_e4): counts
    exact; θ̂, V, p, MDE are pinned IEEE expressions rounded once (exp/
    ln follow the round()-both-engines rule). Degenerate keys (a group
    with < 2 rows or zero spread) emit p_e6 = 1_000_000, mde_e4 = 0.

    Scale shape: ONE map-side-combined groupBy per key (pure moments,
    the CUPED/welch discipline)."""
    g0 = F.col("__g") == 0
    agg = (df.select(*key_cols, F.col(value_col).alias("__v"),
                     F.col(group_col).alias("__g"))
           .groupBy(*key_cols)
           .agg(F.sum(g0.cast("long")).cast("bigint").alias("n0"),
                F.sum((~g0).cast("long")).cast("bigint").alias("n1"),
                F.sum(F.when(g0, F.col("__v")).otherwise(0))
                .cast("bigint").alias("__s0"),
                F.sum(F.when(~g0, F.col("__v")).otherwise(0))
                .cast("bigint").alias("__s1"),
                F.sum(F.col("__v") * F.col("__v")).cast("bigint")
                .alias("__ssq"),
                F.sum(F.col("__v")).cast("bigint").alias("__s")))
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    nd = n0d + n1d
    theta = (F.col("__s1").cast("double") / n1d
             - F.col("__s0").cast("double") / n0d)
    # pooled sample variance s² = (Σv² − (Σv)²/n) / (n − 1)
    s2 = (F.col("__ssq").cast("double")
          - F.col("__s").cast("double") * F.col("__s") / nd) \
        / (nd - F.lit(1.0))
    v = s2 * (F.lit(1.0) / n0d + F.lit(1.0) / n1d)
    t2 = F.lit(float(tau2))
    log_lam = (F.lit(0.5) * F.log(v / (v + t2))
               + theta * theta * t2
               / (F.lit(2.0) * v * (v + t2)))
    ok = (F.col("n0") >= 2) & (F.col("n1") >= 2) & (s2 > 0)
    p = F.when(ok, F.least(F.lit(1.0), F.exp(-log_lam))) \
        .otherwise(F.lit(1.0))
    mde = F.when(ok, F.lit(2.8016) * F.sqrt(v)).otherwise(F.lit(0.0))
    return agg.select(
        *key_cols, "n0", "n1",
        F.when((F.col("n0") > 0) & (F.col("n1") > 0),
               F.round(theta * F.lit(10_000.0))).otherwise(F.lit(0))
        .cast("bigint").alias("theta_e4"),
        F.when(ok, F.round(v * F.lit(1e9))).otherwise(F.lit(0))
        .cast("bigint").alias("v_e9"),
        F.round(p * F.lit(1_000_000.0)).cast("bigint").alias("p_e6"),
        F.round(mde * F.lit(10_000.0)).cast("bigint").alias("mde_e4"))


def cochran_armitage(df: DataFrame, key_cols: list[str],
                     score_col: str, hit_col: str) -> DataFrame:
    """Per-key Cochran-Armitage trend test (Cochran, Biometrics 1954;
    Armitage 1955): is a binary outcome's proportion MONOTONICALLY
    trending across ordered categories (dose-response, day-of-week
    drift, cohort-age decay)? ``score_col`` holds the small-integer
    ordered category score, ``hit_col`` the 0/1 outcome.

    z = Σwᵢ(rᵢ − nᵢp̄) / sqrt(p̄(1−p̄)·[Σw²nᵢ − (Σwnᵢ)²/N]) — every
    ingredient an exact BIGINT sum over one map-side-combined groupBy
    on (keys, score); z_e6 is a pinned IEEE expression rounded once.
    Degenerate keys (p̄ ∈ {0,1} or a single category) emit z_e6 = 0.

    Returns one row per (keys..., score): n_i, r_i exact, with n_total,
    r_total and the key-level z_e6 repeated (the kruskal detail+summary
    discipline, flattened)."""
    cell = (df.select(*key_cols, F.col(score_col).alias("__w"),
                      F.col(hit_col).cast("long").alias("__y"))
            .groupBy(*key_cols, "__w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_i"),
                 F.sum("__y").cast("bigint").alias("r_i")))
    tot = (cell.groupBy(*key_cols)
           .agg(F.sum("n_i").cast("bigint").alias("n_total"),
                F.sum("r_i").cast("bigint").alias("r_total"),
                F.sum(F.col("__w") * F.col("r_i")).cast("bigint")
                .alias("__swr"),
                F.sum(F.col("__w") * F.col("n_i")).cast("bigint")
                .alias("__swn"),
                F.sum(F.col("__w") * F.col("__w") * F.col("n_i"))
                .cast("bigint").alias("__sw2n"),
                F.count(F.lit(1)).alias("__k")))
    nd = F.col("n_total").cast("double")
    pbar = F.col("r_total").cast("double") / nd
    num = (F.col("__swr").cast("double")
           - pbar * F.col("__swn").cast("double"))
    den2 = (pbar * (F.lit(1.0) - pbar)
            * (F.col("__sw2n").cast("double")
               - F.col("__swn").cast("double")
               * F.col("__swn").cast("double") / nd))
    ok = (F.col("r_total") > 0) & (F.col("r_total") < F.col("n_total")) \
        & (F.col("__k") >= 2) & (den2 > 0)
    z = F.when(ok, num / F.sqrt(den2)).otherwise(F.lit(0.0))
    keyed = tot.select(*key_cols, "n_total", "r_total",
                       F.round(z * F.lit(1_000_000.0)).cast("bigint")
                       .alias("z_e6"))
    return (cell.join(keyed, key_cols)
            .select(*key_cols, F.col("__w").cast("int").alias("score"),
                    "n_i", "r_i", "n_total", "r_total", "z_e6"))


def srm_check(df: DataFrame, key_cols: list[str],
              group_col: str) -> DataFrame:
    """Per-key sample-ratio-mismatch guard (Fabijan et al., "Diagnosing
    sample ratio mismatch in online controlled experiments", KDD 2019):
    the FIRST check every experimentation platform runs — if the
    variant split deviates from the designed 50/50, the assignment
    pipeline is broken and every downstream metric is invalid.

    Returns (keys..., n0, n1, chi2_e6, srm): the 1-df chi-square of the
    observed counts against the 50/50 design (exact integer counts;
    (n0−n1)²/(n0+n1) — the algebraic reduction keeps it one division)
    and the srm flag at the conventional 0.001 level (chi2 > 10.828).

    One map-side-combined groupBy; nothing else."""
    g0 = F.col("__g") == 0
    agg = (df.select(*key_cols, F.col(group_col).alias("__g"))
           .groupBy(*key_cols)
           .agg(F.sum(g0.cast("long")).cast("bigint").alias("n0"),
                F.sum((~g0).cast("long")).cast("bigint").alias("n1")))
    d = (F.col("n0") - F.col("n1")).cast("double")
    n = (F.col("n0") + F.col("n1")).cast("double")
    chi2 = F.when(n > 0, d * d / n).otherwise(F.lit(0.0))
    return agg.select(
        *key_cols, "n0", "n1",
        F.round(chi2 * F.lit(1_000_000.0)).cast("bigint")
        .alias("chi2_e6"),
        (chi2 > F.lit(10.828)).cast("int").alias("srm"))


def diff_in_diff(df: DataFrame, key_cols: list[str], value_col: str,
                 group_col: str, period_col: str) -> DataFrame:
    """Per-key 2x2 difference-in-differences estimator (Card & Krueger
    1994 canon): the causal-inference workhorse when treatment rolls
    out to one cohort over time —
    DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre),
    removing both the cohort baseline and the common time trend.

    ``group_col`` ∈ {0,1} (control/treat), ``period_col`` ∈ {0,1}
    (pre/post). Returns one row per (keys..., grp, period) cell with
    exact n/sum, plus the key-level did_e4 and its large-sample
    se_e4 = sqrt(Σ cell var/n) repeated on each row (the kruskal
    detail discipline). Cells with n < 2 zero the SE. A key with fewer
    than 4 populated cells has NO DiD estimate — a missing cell would
    otherwise enter the contrast as mean 0.0 and yield a silently wrong
    value — so such keys emit did_e4 = se_e4 = 0 (the welch/kruskal
    degenerate-key discipline; the cell rows still report n/sum).

    One map-side-combined groupBy on (keys, grp, period) — 4 cells per
    key; the combine folds over the SORTED bounded cell list."""
    cell = (df.select(*key_cols, F.col(value_col).alias("__v"),
                      F.col(group_col).alias("__g"),
                      F.col(period_col).alias("__p"))
            .groupBy(*key_cols, "__g", "__p")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("__v").cast("bigint").alias("s"),
                 F.sum(F.col("__v") * F.col("__v")).cast("bigint")
                 .alias("__ssq")))
    one = cell.groupBy(*key_cols).agg(F.sort_array(F.collect_list(
        F.struct("__g", "__p", "n", "s", "__ssq"))).alias("a"))
    # cell mean fetch: sign (+ for (1,1) and (0,0)... no — DiD signs:
    # +treat-post, -treat-pre, -ctrl-post, +ctrl-pre
    mean_of = ("aggregate(filter(a, x -> x.__g = {g} AND x.__p = {p}),"
               " 0.0D, (q, x) -> CAST(x.s AS DOUBLE)"
               " / CAST(x.n AS DOUBLE))")
    var_term = ("aggregate(filter(a, x -> x.__g = {g} AND x.__p = {p}),"
                " 0.0D, (q, x) -> CASE WHEN x.n >= 2 THEN"
                " ((CAST(x.__ssq AS DOUBLE) - CAST(x.s AS DOUBLE)"
                "  * CAST(x.s AS DOUBLE) / CAST(x.n AS DOUBLE))"
                "  / (CAST(x.n AS DOUBLE) - 1.0D))"
                " / CAST(x.n AS DOUBLE) ELSE 0.0D END)")
    did = F.expr(
        f"({mean_of.format(g=1, p=1)}) - ({mean_of.format(g=1, p=0)})"
        f" - ({mean_of.format(g=0, p=1)})"
        f" + ({mean_of.format(g=0, p=0)})")
    se = F.sqrt(F.expr(
        " + ".join(var_term.format(g=g, p=p)
                   for g in (0, 1) for p in (0, 1))))
    # all FOUR binary contrast cells must be present — counting rows
    # would let a non-binary grp/period value stand in for a missing
    # {0,1}x{0,1} cell and re-admit the mean-0.0 contrast bug
    def _has(g: int, p: int):
        return F.exists("a", lambda x: (x["__g"] == g) & (x["__p"] == p))
    full = _has(0, 0) & _has(0, 1) & _has(1, 0) & _has(1, 1)
    keyed = one.select(
        *key_cols, "a",
        F.when(full, F.round(did * F.lit(10_000.0)).cast("bigint"))
        .otherwise(F.lit(0)).cast("bigint").alias("did_e4"),
        F.when(full, F.round(se * F.lit(10_000.0)).cast("bigint"))
        .otherwise(F.lit(0)).cast("bigint").alias("se_e4"))
    ex = keyed.select(*key_cols, "did_e4", "se_e4",
                      F.explode("a").alias("x"))
    return ex.select(*key_cols,
                     F.col("x.__g").cast("int").alias("grp"),
                     F.col("x.__p").cast("int").alias("period"),
                     F.col("x.n").alias("n"),
                     F.col("x.s").alias("sum_v"),
                     "did_e4", "se_e4")
