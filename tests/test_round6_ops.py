"""Round-6 operator tests: KMV set difference, Holt trend, OHLC bars,
A/B z-test. Each pins SEMANTICS (known-answer fixtures) beyond the
oracle hash match the driver records.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# --- KMV a-not-b -----------------------------------------------------------

def test_kmv_difference_exact_regime(spark):
    """Small disjoint-ish sets: union fits in the sketch, so the
    directional estimates are exact set-difference sizes."""
    from melt_spark.functions.sketches import kmv_difference_estimate

    a = spark.createDataFrame([(v,) for v in "abcdef"], ["v"])
    b = spark.createDataFrame([(v,) for v in "defghi"], ["v"])
    row = kmv_difference_estimate(a, b, "v", k=16).collect()[0]
    assert row.n_union_mins == 9
    assert row.d_ab_num == 3 and row.d_ba_num == 3
    assert row.anotb_est == 3 and row.bnota_est == 3


def test_kmv_difference_identical_sets(spark):
    from melt_spark.functions.sketches import kmv_difference_estimate

    a = spark.createDataFrame([(v,) for v in "abcde"], ["v"])
    row = kmv_difference_estimate(a, a, "v", k=16).collect()[0]
    assert row.anotb_est == 0 and row.bnota_est == 0


def test_kmv_difference_estimate_regime_is_sane(spark):
    """Above-k regime: 200 vs 150 overlapping ints — the estimate must
    land within a loose factor of truth (k=16 sketches are coarse; the
    point is the estimator algebra, which the oracle pins exactly)."""
    from melt_spark.functions.sketches import kmv_difference_estimate

    a = spark.createDataFrame([(i,) for i in range(200)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(100, 250)], ["v"])
    row = kmv_difference_estimate(a, b, "v", k=16).collect()[0]
    assert row.n_union_mins == 16
    # truth: |A\B| = 100, |B\A| = 50, union = 250
    assert 0 < row.anotb_est < 400
    assert row.union_est > 100


# --- Holt linear trend -----------------------------------------------------

def _holt_ref(xs):
    l, b = xs[0], 0
    for x in xs[1:]:
        ln = math.floor((x + l + b) / 2.0)
        b = math.floor((ln - l + b) / 2.0)
        l = ln
    return l, b


def test_holt_matches_plain_python_fold(spark):
    from melt_spark.functions.timeseries import holt_int

    rows = [("a", i * 3600) for i in range(8) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    out = holt_int(df, "ts", ["k"], 3600).collect()[0]
    l, b = _holt_ref([i + 1 for i in range(8)])
    assert out.level_final == l
    assert out.trend_final == b
    assert out.forecast_next == l + b


def test_holt_negative_trend_floor_semantics(spark):
    """A decaying series drives the trend negative — the recurrence must
    FLOOR (not truncate toward zero), the div-vs-floor engine trap."""
    from melt_spark.functions.timeseries import holt_int

    counts = [64, 32, 16, 8, 4, 2, 1, 1]
    rows = [("d", i * 3600) for i, c in enumerate(counts)
            for _ in range(c)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    out = holt_int(df, "ts", ["k"], 3600).collect()[0]
    l, b = _holt_ref(counts)
    assert b < 0, "fixture must exercise the negative-trend branch"
    assert (out.level_final, out.trend_final) == (l, b)


# --- OHLC bars -------------------------------------------------------------

def test_ohlc_open_close_deterministic_under_ts_ties(spark):
    """Two events in the same microsecond: event_id breaks the tie, so
    open/close are well-defined."""
    from melt_spark.plans.analytics_suite import q_ohlc_bars

    bars = q_ohlc_bars(spark, SF_DIR)
    r = bars.orderBy("event_type", "bucket").first()
    assert r.low <= r.open <= r.high
    assert r.low <= r.close <= r.high
    assert r.n >= 1


def test_ohlc_single_event_bar_collapses(spark):
    from melt_spark.plans.analytics_suite import q_ohlc_bars

    ones = q_ohlc_bars(spark, SF_DIR).filter(F.col("n") == 1)
    bad = ones.filter((F.col("open") != F.col("close"))
                      | (F.col("high") != F.col("low"))
                      | (F.col("open") != F.col("high"))).count()
    assert bad == 0


# --- A/B z-test ------------------------------------------------------------

def test_ab_test_counts_are_a_partition(spark):
    """The two variants partition the cohort; rates are exact ppm."""
    from melt_spark.plans.analytics_suite import q_ab_test
    from melt_spark.sources.parquet import read_table

    rows = {r.variant: r for r in q_ab_test(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    n_users = (read_table(spark, SF_DIR, "events")
               .select("user_id").distinct().count())
    assert rows[0].n_exposed + rows[1].n_exposed == n_users
    for r in rows.values():
        assert 0 <= r.n_conv <= r.n_exposed
        assert r.rate_ppm == r.n_conv * 1_000_000 // r.n_exposed
    assert rows[0].z_micro == rows[1].z_micro


def test_ab_test_z_matches_closed_form(spark):
    from melt_spark.plans.analytics_suite import q_ab_test

    rows = {r.variant: r for r in q_ab_test(spark, SF_DIR).collect()}
    n0, c0 = rows[0].n_exposed, rows[0].n_conv
    n1, c1 = rows[1].n_exposed, rows[1].n_conv
    pp = (c0 + c1) / (n0 + n1)
    se = math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    z = (c0 / n0 - c1 / n1) / se
    assert rows[0].z_micro == round(z * 1e6)
    assert rows[0].significant == int(abs(rows[0].z_micro) >= 1_960_000)


# --- LPA communities ---------------------------------------------------------

def test_lpa_separates_planted_communities(spark):
    """Two 4-cliques joined by one bridge edge: after 3 synchronous
    rounds each clique shares one label and the two labels differ."""
    from melt_spark.functions.graph import lpa_communities

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    df = spark.createDataFrame(c1 + c2 + bridge, ["a", "b"])
    out = {r.node: r.community
           for r in lpa_communities(df, "a", "b", rounds=3).collect()}
    lab1 = {out[n] for n in range(4)}
    lab2 = {out[n] for n in range(10, 14)}
    assert len(lab1) == 1 and len(lab2) == 1
    assert lab1 != lab2


def test_lpa_tie_breaks_to_smallest_label(spark):
    """A path 0-1-2 after one round: node 1 sees labels {0, 2} with
    equal counts — must adopt 0 (the smallest)."""
    from melt_spark.functions.graph import lpa_communities

    df = spark.createDataFrame([(0, 1), (1, 2)], ["a", "b"])
    out = {r.node: r.community
           for r in lpa_communities(df, "a", "b", rounds=1).collect()}
    assert out[1] == 0


# --- random walks ------------------------------------------------------------

def test_random_walks_follow_real_edges(spark):
    from melt_spark.functions.graph import random_walks

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = spark.createDataFrame(edges, ["a", "b"])
    adj = set()
    for a, b in edges:
        adj.add((a, b))
        adj.add((b, a))
    rows = random_walks(df, "a", "b", steps=3).collect()
    assert len(rows) == 4  # one walk per vertex
    for r in rows:
        path = [r.start, r.n1, r.n2, r.n3]
        for u, v in zip(path, path[1:]):
            assert (u, v) in adj, f"walk used a non-edge {u}->{v}"


def test_random_walks_are_deterministic(spark):
    from melt_spark.functions.graph import random_walks

    edges = [(i, j) for i in range(6) for j in range(6) if i < j]
    df = spark.createDataFrame(edges, ["a", "b"])
    r1 = sorted(map(tuple, random_walks(df, "a", "b", 3).collect()))
    r2 = sorted(map(tuple, random_walks(df, "a", "b", 3).collect()))
    assert r1 == r2


# --- graph ANN ----------------------------------------------------------------

def test_knn_graph_rank_contract(spark):
    """Every node emits at most m neighbors, ranks are 1..m dense, and
    every edge stays within the node's IVF list (cluster-local build)."""
    from melt_spark.functions.similarity import knn_graph
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    g = knn_graph(emb, m=8, every=50)
    per = g.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"),
        F.min("rank").alias("mn"))
    bad = per.filter((F.col("n") > 8) | (F.col("mx") != F.col("n"))
                     | (F.col("mn") != 1)).count()
    assert bad == 0


def test_graph_ann_recall_beats_random(spark):
    """Beam search over the kNN graph must recover a decent share of the
    exact top-10 — far above the ~2% a random 10-subset would hit."""
    from melt_spark.functions.similarity import graph_ann_search, knn_graph
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    edges = knn_graph(emb, m=8, every=50)
    out = graph_ann_search(emb, emb.filter(F.col("vec_id") < 5), edges,
                           k=10, beam=10, rounds=2)
    rows = out.collect()
    assert len(rows) == 50  # 5 queries x top-10
    recall = sum(r.in_exact for r in rows) / len(rows)
    assert recall >= 0.2, f"graph-ANN recall {recall} ~ random"


def test_graph_ann_more_rounds_never_hurt(spark):
    """The beam is monotone: a 3rd expansion round's recall >= 2nd's
    (greedy search with a kept beam can only add better candidates)."""
    from melt_spark.functions.similarity import graph_ann_search, knn_graph
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    edges = knn_graph(emb, m=8, every=50)
    q = emb.filter(F.col("vec_id") < 5)

    def rec(rounds):
        rows = graph_ann_search(emb, q, edges, k=10, beam=10,
                                rounds=rounds).collect()
        return sum(r.in_exact for r in rows)

    assert rec(3) >= rec(2)


# --- golden records -------------------------------------------------------

def test_golden_records_one_survivor_per_cluster(spark):
    from melt_spark.plans.analytics_suite import q_golden_records

    out = q_golden_records(spark, SF_DIR)
    per = out.groupBy("cluster_id").agg(
        F.sum("keep").alias("keeps"), F.count(F.lit(1)).alias("n"),
        F.max("n_members").alias("m"))
    assert per.filter(F.col("keeps") != 1).count() == 0
    assert per.filter(F.col("n") != F.col("m")).count() == 0


def test_golden_records_matched_typos_join_their_original(spark):
    """A typo record that matched must land in its original's cluster
    (cluster_id = the original custkey) and must NOT be the survivor of
    a 2-member cluster when names tie in length (lowest id wins)."""
    from melt_spark.plans.analytics_suite import q_golden_records

    rows = q_golden_records(spark, SF_DIR).collect()
    by_id = {r.record_id: r for r in rows}
    matched_typos = [r for r in rows
                     if r.record_id > 100000 and r.n_members == 2]
    assert matched_typos, "fixture must produce matched clusters"
    for t in matched_typos:
        assert t.cluster_id == t.record_id - 100000
        orig = by_id[t.cluster_id]
        assert orig.cluster_id == t.cluster_id
        assert t.survivor_id == orig.survivor_id


# --- LSH planner ------------------------------------------------------------

def test_lsh_planner_scurve_shape(spark):
    """p is monotone in s for fixed (b, r); the threshold estimate sits
    where the curve crosses ~0.5 territory."""
    from melt_spark.plans.pipeline_suite import q_lsh_planner

    rows = q_lsh_planner(spark, SF_DIR).collect()
    import itertools
    curve = sorted([r for r in rows if r.s_e1 > 0],
                   key=lambda r: (r.bands, r.s_e1))
    for b, grp in itertools.groupby(curve, key=lambda r: r.bands):
        ps = [r.p_collide for r in grp]
        assert all(x <= y + 1e-12 for x, y in zip(ps, ps[1:]))
    t4 = [r for r in rows if r.bands == 4 and r.s_e1 == -1][0]
    # 8-hash grid (the deployed signature): bands=4 -> rows_per_band=2,
    # threshold (1/4)^(1/2) = 0.5
    assert t4.rows_per_band == 2
    assert abs(t4.p_collide - 0.25 ** 0.5) < 1e-6


# --- NB calibration -----------------------------------------------------------

def test_nb_calibration_bins_partition_and_ece(spark):
    from melt_spark.functions.classify import nb_calibration
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, SF_DIR, "documents")
    rows = nb_calibration(docs).collect()
    bins = [r for r in rows if r.bin >= 0]
    summ = [r for r in rows if r.bin == -1][0]
    assert sum(r.n for r in bins) == summ.n == docs.count()
    assert sum(r.n_correct for r in bins) == summ.n_correct
    for r in bins:
        assert 0 <= r.acc_ppm <= 1_000_000
        assert 0 <= r.conf_ppm <= 1_000_000
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n
    # ECE is the n-weighted mean |acc - conf|
    gap = sum(abs(r.acc_ppm - r.conf_ppm) * r.n for r in bins) // summ.n
    assert summ.conf_ppm == gap


# --- Theil-Sen ----------------------------------------------------------------

def test_theil_sen_recovers_planted_slope(spark):
    """Counts i+1 at hour i: every pairwise slope is exactly 1 count per
    3600 s -> slope_e9 = floor(1e9/3600); intercept = first count."""
    import math

    from melt_spark.functions.timeseries import theil_sen

    rows = [("k", i * 3600) for i in range(10) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    out = theil_sen(df, "ts", ["k"], 3600).collect()[0]
    assert out.n_buckets == 10 and out.n_pairs == 45
    assert out.slope_e9 == math.floor(1e9 / 3600)


def test_theil_sen_resists_outlier_bucket(spark):
    """One wild bucket (count 500 in a flat count-2 series) must not
    move the median slope off ~0 — the whole point vs OLS."""
    from melt_spark.functions.timeseries import theil_sen

    counts = [2] * 9 + [500] + [2] * 10
    rows = [("k", i * 3600) for i, c in enumerate(counts)
            for _ in range(c)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    out = theil_sen(df, "ts", ["k"], 3600).collect()[0]
    assert out.slope_e9 == 0


def test_theil_sen_max_buckets_guard(spark):
    import pytest
    from melt_spark.functions.timeseries import theil_sen

    rows = [("k", i * 3600) for i in range(30)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    with pytest.raises(Exception, match="max_buckets"):
        theil_sen(df, "ts", ["k"], 3600, max_buckets=10).collect()


# --- CDC net effect -----------------------------------------------------------

def test_net_effect_classification(spark):
    from melt_spark.operators.cdc import net_effect

    rows = [
        (1, "I", 10), (1, "U", 11), (1, "D", 12),   # I..D -> NONE
        (2, "U", 20), (2, "D", 21),                 # ..D  -> D
        (3, "I", 30), (3, "U", 31),                 # I..  -> I
        (4, "U", 40), (4, "U", 41),                 # else -> U
        (5, "D", 50), (5, "I", 51),                 # D then I -> U? no:
        # first=D last=I: not I..D, last!=D, first!=I -> U... but
        # semantically delete-then-reinsert nets to an upsert: U. Good.
    ]
    df = spark.createDataFrame(
        rows, ["k", "sys_change_operation", "sys_change_version"])
    out = {r.k: r for r in net_effect(df, ["k"]).collect()}
    assert out[1].net_op == "NONE" and out[1].n_changes == 3
    assert out[2].net_op == "D"
    assert out[3].net_op == "I"
    assert out[4].net_op == "U"
    assert out[5].net_op == "U"
    assert (out[1].first_version, out[1].last_version) == (10, 12)


# --- schema compat -------------------------------------------------------------

def test_schema_compat_rule_table(spark):
    """Every rule branch fires on the planted fixture with the expected
    verdict (Avro promotion canon)."""
    from melt_spark.plans.suite import q_schema_compat

    rows = {(r.table_name, r.column): r
            for r in q_schema_compat(spark, SF_DIR).collect()}
    expect = {
        ("customer", "c_custkey"): ("widened", 0),
        ("customer", "c_acctbal"): ("widened+required_tightened", 1),
        ("customer", "c_phone"): ("added", 0),
        ("customer", "c_comment"): ("dropped", 1),
        ("orders", "o_orderkey"): ("pk_changed", 1),
        ("orders", "o_total"): ("type_changed", 1),
        ("orders", "o_flag"): ("type_changed", 1),
        ("orders", "o_priority"): ("added_required", 1),
    }
    assert set(rows) == set(expect)
    for k, (status, breaking) in expect.items():
        assert rows[k].status == status, (k, rows[k].status)
        assert rows[k].breaking == breaking, k
    # unchanged column emits no row
    assert ("customer", "c_name") not in rows


# --- NB abstention -------------------------------------------------------------

def test_nb_abstain_monotone_coverage_and_consistency(spark):
    """Coverage is non-increasing in the threshold; thr=0 covers all
    docs; accuracy on the covered set is internally consistent."""
    from melt_spark.functions.classify import nb_abstain
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, SF_DIR, "documents")
    rows = sorted(nb_abstain(docs).collect(), key=lambda r: r.thr_nano)
    assert rows[0].thr_nano == 0
    assert rows[0].n_covered == docs.count()
    covs = [r.n_covered for r in rows]
    assert all(a >= b for a, b in zip(covs, covs[1:]))
    for r in rows:
        if r.n_covered:
            assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_covered
        else:
            assert r.acc_ppm == -1


# --- incremental kNN -----------------------------------------------------------

def test_incremental_knn_untouched_store_nodes_keep_lists(spark):
    """A store node whose IVF list gained no batch vector emits no
    'store' rows — the no-recompute property the operator exists for."""
    from melt_spark.functions.ivf import deterministic_centroids, ivf_assign
    from melt_spark.functions.similarity import incremental_knn
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    store = emb.filter(F.col("vec_id") % 7 != 0)
    # one-vector batch: exactly one list is touched, so untouched store
    # lists provably exist at this fixture size
    batch = emb.filter(F.col("vec_id") == 7)
    out = incremental_knn(store, batch, m=8, every=50)
    cents = deterministic_centroids(store, 50)
    batch_lists = {r.list_id for r in
                   ivf_assign(batch, cents).select("list_id")
                   .distinct().collect()}
    store_assign = ivf_assign(store, cents).select("vec_id", "list_id")
    updated = {r.id_a for r in out.filter(F.col("kind") == "x").collect()} \
        if "kind" in out.columns else \
        {r.src for r in out.filter(F.col("side") == "store")
         .select("src").distinct().collect()}
    untouched = {r.vec_id for r in store_assign.collect()
                 if r.list_id not in batch_lists}
    assert updated and untouched
    assert not (updated & untouched)


def test_incremental_knn_batch_rows_rank_contract(spark):
    from melt_spark.functions.similarity import incremental_knn
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    store = emb.filter(F.col("vec_id") % 7 != 0)
    batch = emb.filter(F.col("vec_id") % 7 == 0)
    out = incremental_knn(store, batch, m=8, every=50)
    per = (out.groupBy("side", "src")
           .agg(F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")))
    assert per.filter((F.col("n") > 8)
                      | (F.col("mx") != F.col("n"))).count() == 0
    n_batch_srcs = (out.filter(F.col("side") == "batch")
                    .select("src").distinct().count())
    assert n_batch_srcs == batch.count()


# --- Hilbert curve ------------------------------------------------------------

def test_hilbert_matches_python_reference(spark):
    from melt_spark.functions.layout import hilbert_py, hilbert_value

    pts = [(x, y) for x in range(0, 40, 3) for y in range(0, 40, 7)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = hilbert_value("x", "y", bits=15).alias("d")
    out = {(r.x, r.y): r.d for r in df.select("x", "y", rows).collect()}
    for (x, y), d in out.items():
        assert d == hilbert_py(x, y, 15), (x, y)


def test_hilbert_is_contiguous_and_bijective_small_grid(spark):
    """On the full 16x16 grid (bits=4): every consecutive pair of
    d-values is one Manhattan step apart, and d is a bijection — the
    locality property z-order lacks (Morton takes diagonal jumps)."""
    from melt_spark.functions.layout import hilbert_py, zvalue_py

    n = 16
    cells = sorted((hilbert_py(x, y, 4), x, y)
                   for x in range(n) for y in range(n))
    assert len({c[0] for c in cells}) == n * n
    steps = [abs(a[1] - b[1]) + abs(a[2] - b[2])
             for a, b in zip(cells, cells[1:])]
    assert all(s == 1 for s in steps)
    zcells = sorted((zvalue_py(x, y, 4), x, y)
                    for x in range(n) for y in range(n))
    zsteps = [abs(a[1] - b[1]) + abs(a[2] - b[2])
              for a, b in zip(zcells, zcells[1:])]
    assert any(s > 1 for s in zsteps)  # Morton's diagonal jumps


# --- RFM scoring -------------------------------------------------------------

def test_rfm_quintiles_are_balanced_and_oriented(spark):
    from melt_spark.plans.analytics_suite import q_rfm_scores

    rows = q_rfm_scores(spark, SF_DIR).collect()
    n = len(rows)
    for dim in ("r", "f", "m"):
        vals = [getattr(r, dim) for r in rows]
        assert set(vals) <= {1, 2, 3, 4, 5}
        # ntile balance: bucket sizes differ by at most 1
        from collections import Counter
        c = Counter(vals)
        assert max(c.values()) - min(c.values()) <= 1, (dim, c)
    # orientation: the single most-recent user scores r=5, the highest
    # spender m=5
    best_r = min(rows, key=lambda r: (r.recency_days, r.user_id))
    assert best_r.r == 5
    best_m = max(rows, key=lambda r: (r.monetary_cents, -r.user_id))
    assert best_m.m == 5
    assert all(r.rfm_code == r.r * 100 + r.f * 10 + r.m for r in rows)
    assert n == len({r.user_id for r in rows})


# --- Otsu threshold ----------------------------------------------------------

def test_otsu_separates_planted_bimodal(spark):
    """Two clearly separated length modes: the chosen threshold lands
    strictly between them and matches a plain-Python Otsu."""
    from melt_spark.plans.analytics_suite import q_otsu_threshold  # noqa: F401

    # plain-python reference over the same integer criterion
    import collections

    def otsu(bins):
        nt = sum(bins.values())
        st = sum(b * n for b, n in bins.items())
        best, bb = -1, None
        w0 = s0 = 0
        for b in sorted(bins):
            w0 += bins[b]; s0 += b * bins[b]
            w1 = nt - w0
            if w0 and w1:
                crit = (s0 * w1 - (st - s0) * w0) ** 2 // (w0 * w1)
            else:
                crit = 0
            if crit > best:
                best, bb = crit, b
        return bb

    low = [5] * 40 + [6] * 35
    high = [27] * 30 + [28] * 45
    bins = collections.Counter(low + high)
    t = otsu(bins)
    assert 6 <= t < 27

    rows = q_otsu_threshold(spark, SF_DIR).collect()
    chosen = [r for r in rows if r.chosen == 1]
    assert len(chosen) == 1
    # the fixture histogram: spark's chosen t maximizes the same
    # integer criterion the reference computes over the output rows
    ref = max(rows, key=lambda r: (r.crit, -r.t))
    assert chosen[0].t == ref.t
    total = rows[0].w0 + rows[0].w1
    assert all(r.w0 + r.w1 == total for r in rows)


def test_holt_state_continuation_equals_batch(spark):
    """Prefix-decomposability: holt over buckets [0..11] equals holt
    over [0..5] fed back as state for [6..11]; quiet keys survive."""
    from melt_spark.functions.timeseries import holt_int

    counts = [3, 9, 1, 14, 7, 2, 20, 4, 11, 6, 8, 5]
    rows = [("k", i * 3600) for i, c in enumerate(counts)
            for _ in range(c)]
    df = spark.createDataFrame(rows, ["k", "epoch"]).select(
        "k", F.timestamp_seconds("epoch").alias("ts"))
    full = holt_int(df, "ts", ["k"], 3600).collect()[0]

    first = df.filter(F.unix_timestamp("ts") < 6 * 3600)
    rest = df.filter(F.unix_timestamp("ts") >= 6 * 3600)
    st = holt_int(first, "ts", ["k"], 3600)
    cont = holt_int(rest, "ts", ["k"], 3600, state=st).collect()[0]
    assert (cont.level_final, cont.trend_final, cont.n_buckets) == \
        (full.level_final, full.trend_final, full.n_buckets)

    # quiet key: present in state, absent from the batch -> unchanged
    st2 = spark.createDataFrame(
        [("quiet", 7, -2, 5, 4)],
        ["k", "level_final", "trend_final", "forecast_next",
         "n_buckets"])
    out = {r.k: r for r in
           holt_int(rest, "ts", ["k"], 3600, state=st2).collect()}
    assert out["quiet"].level_final == 7
    assert out["quiet"].trend_final == -2
    assert out["quiet"].n_buckets == 4


def test_knn_graph_coarse_mostly_agrees_with_exact(spark):
    """Two-level assignment only moves boundary vectors, so the coarse
    graph keeps the large majority of exact edges (the two_level_assign
    agreement bound carried to the graph)."""
    from melt_spark.functions.similarity import knn_graph
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    exact = {(r.src, r.dst)
             for r in knn_graph(emb, m=8, every=50).collect()}
    coarse = {(r.src, r.dst)
              for r in knn_graph(emb, m=8, every=50,
                                 coarse_group=16).collect()}
    overlap = len(exact & coarse) / len(exact)
    assert overlap >= 0.7, overlap


# --- MinHash recall evaluation --------------------------------------------------

def test_minhash_recall_monotone_and_consistent(spark):
    """n_true is non-increasing in the threshold, caught <= true, and
    higher thresholds never have WORSE recall than the S-curve predicts
    directionally (recall grows with similarity)."""
    from melt_spark.plans.pipeline_suite import q_minhash_recall

    rows = sorted(q_minhash_recall(spark, SF_DIR).collect(),
                  key=lambda r: r.thr_e2)
    trues = [r.n_true for r in rows]
    assert all(a >= b for a, b in zip(trues, trues[1:]))
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        if r.n_true:
            assert r.recall_ppm == r.n_caught * 1_000_000 // r.n_true
        else:
            assert r.recall_ppm == -1
    recalls = [r.recall_ppm for r in rows if r.n_true > 0]
    if len(recalls) >= 2:
        assert recalls[-1] >= recalls[0]
