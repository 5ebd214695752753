"""Butterfly census (functions/graph.py butterfly_count) and weighted
priority sampling (functions/cleaning.py priority_sample)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.functions.cleaning import priority_sample
from melt_spark.functions.graph import butterfly_count
from melt_spark.sources.parquet import read_table


def _edges(spark, pairs):
    return spark.createDataFrame([Row(l=l, r=r) for l, r in pairs])


def test_butterfly_hand_graph(spark):
    """K_{2,2} on (a,b)x(x,y) is exactly one butterfly; c-x adds a wedge
    ((a,c) and (b,c) share only x — no pair, x alone is no wedge pair)."""
    [row] = butterfly_count(
        _edges(spark, [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
                       ("c", "x")]), "l", "r").collect()
    assert row.n_edges == 5 and row.n_left == 3
    # wedges (right-pairs seen from a left vertex): a:(x,y), b:(x,y) -> 2
    assert row.wedges == 2 and row.right_pairs == 1
    assert row.butterflies == 1
    assert row.clustering_coeff == 4 * 1 / 2.0


def test_butterfly_duplicate_edges_ignored(spark):
    """The edge list is multiset input — distinct() first, so duplicates
    (one customer ordering from the same supplier twice) don't inflate."""
    once = butterfly_count(
        _edges(spark, [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]),
        "l", "r").collect()[0]
    dup = butterfly_count(
        _edges(spark, [("a", "x")] * 5
               + [("a", "y"), ("b", "x"), ("b", "y")]), "l", "r") \
        .collect()[0]
    assert once.butterflies == dup.butterflies == 1
    assert once.n_edges == dup.n_edges == 4


def test_butterfly_no_wedges_sentinel(spark):
    [row] = butterfly_count(
        _edges(spark, [("a", "x"), ("b", "y")]), "l", "r").collect()
    assert row.butterflies == 0 and row.clustering_coeff == -1.0


def test_butterfly_hub_salting_preserves_exact_counts(spark):
    """Planted hub: salting (small bucket_size forces many buckets for
    the hub) must give bit-identical counts to the effectively-unsalted
    default — every unordered neighbor pair lands under exactly one
    bucket-pair key, cross- and same-bucket alike."""
    hub = [("h", f"r{i:03d}") for i in range(120)]
    overlap = [("g", f"r{i:03d}") for i in range(40)]          # shares 40
    extra = [("k", "r000"), ("k", "zz")]                       # wedge only
    edges = _edges(spark, hub + overlap + extra)
    salted = butterfly_count(edges, "l", "r", bucket_size=8).collect()[0]
    plain = butterfly_count(edges, "l", "r").collect()[0]      # nb == 1
    assert tuple(salted) == tuple(plain)
    # hand values: butterflies = C(40,2) right-pairs with n_common=2
    assert salted.butterflies == 40 * 39 // 2
    assert salted.wedges == (120 * 119 + 40 * 39 + 2 * 1) // 2
    assert salted.n_edges == 162 and salted.n_left == 3


def test_butterfly_salting_caps_per_key_fanout(spark):
    """The skew property itself: with bucket_size=8 no single join key
    (l, i, j) may own more than ~bucket_size^2 candidate pairs — the
    hub's C(d,2) wedges must spread over many independent keys. Reproduce
    the operator's salted keying and measure the max per-key pair count."""
    d, bs = 120, 8
    e = _edges(spark, [("h", f"r{i:03d}") for i in range(d)]).distinct()
    deg = e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
    eb = (e.join(deg, "l")
          .withColumn("nb", F.expr(f"(d + {bs - 1}) div {bs}"))
          .withColumn("b", F.pmod(F.xxhash64("r"), F.col("nb"))))
    a = eb.select("l", "r", F.col("b").alias("i"),
                  F.explode(F.sequence(F.col("b"), F.col("nb") - 1))
                  .alias("j"))
    b = eb.select(F.col("l").alias("l2"), F.col("r").alias("r2"),
                  F.explode(F.sequence(F.lit(0).cast("bigint"),
                                       F.col("b"))).alias("i2"),
                  F.col("b").alias("j2"))
    per_key = (a.join(b, (F.col("l") == F.col("l2"))
                      & (F.col("i") == F.col("i2"))
                      & (F.col("j") == F.col("j2"))
                      & ((F.col("i") < F.col("j"))
                         | (F.col("r") < F.col("r2"))))
               .groupBy("l", "i", "j").agg(F.count(F.lit(1)).alias("n")))
    rows = per_key.collect()
    total = sum(r.n for r in rows)
    assert total == d * (d - 1) // 2            # nothing lost, nothing dup
    assert len(rows) >= 50                      # spread over many keys
    # md5-uniform buckets: no key should exceed a small multiple of bs^2
    assert max(r.n for r in rows) <= 4 * bs * bs


def test_priority_sample_invariants(spark, sf_dir):
    """Fixed size k, every kept priority >= tau, w_hat = max(w, tau), and
    the tau estimator's total is within a generous envelope of the true
    corpus weight (unbiased over the hash-uniform draw)."""
    docs = read_table(spark, sf_dir, "documents")
    out = priority_sample(docs, "n_chars", "doc_id", k=20).collect()
    assert len(out) == 20
    tau = out[0].tau
    assert all(r.tau == tau for r in out)
    assert all(r.priority >= tau for r in out)
    assert all(r.w_hat == max(float(r.w), tau) for r in out)
    true_total = docs.agg(F.sum("n_chars")).head()[0]
    est = sum(r.w_hat for r in out)
    assert true_total / 3 <= est <= true_total * 3


def test_priority_sample_small_frame_unbiased(spark):
    """With <= k input rows there is no (k+1)-th priority: tau must be 0
    and w_hat must degenerate to the exact weight w (the unbiased DLT
    estimator for an exhaustive sample), not the smallest sampled
    priority (which would bias every w_hat upward)."""
    rows = [Row(id=i, w=10 * (i + 1)) for i in range(5)]
    out = priority_sample(spark.createDataFrame(rows), "w", "id",
                          k=10).collect()
    assert len(out) == 5
    assert all(r.tau == 0.0 for r in out)
    assert all(r.w_hat == float(r.w) for r in out)
    # exactly k rows present -> still no (k+1)-th priority
    out_eq = priority_sample(spark.createDataFrame(
        [Row(id=i, w=7) for i in range(10)]), "w", "id", k=10).collect()
    assert len(out_eq) == 10 and all(r.tau == 0.0 for r in out_eq)


def test_priority_sample_prefers_heavy_rows(spark):
    """A row with overwhelming weight must always be sampled."""
    rows = [Row(id=i, w=1) for i in range(200)] + [Row(id=999, w=10_000)]
    df = spark.createDataFrame(rows)
    out = priority_sample(df, "w", "id", k=10).collect()
    assert any(r.id == 999 for r in out)


def test_basket_rules_reference(spark, tmp_path):
    """The real operator on a hand basket set: support, item counts and
    lift against manual computation. Duplicate lineitems for the same
    (order, part) must not inflate support."""
    from melt_spark.plans.analytics_suite import q_basket_rules

    rows = [Row(l_orderkey=o, l_partkey=p)
            for o, parts in {1: [10, 20], 2: [10, 20], 3: [10, 20, 20],
                             4: [10, 30], 5: [20]}.items()
            for p in parts]
    spark.createDataFrame(rows).write.mode("overwrite") \
        .parquet(str(tmp_path / "lineitem.parquet"))
    out = q_basket_rules(spark, str(tmp_path)).collect()
    assert len(out) == 1
    [r] = out
    # (10,20): support=3 (order 3's duplicate 20 collapses), n1=4, n2=4,
    # N=5 baskets -> lift = 3*5/(4*4)
    assert (r.p1, r.p2, r.support, r.n1, r.n2) == (10, 20, 3, 4, 4)
    assert r.lift == 3 * 5 / 16


def test_triangle_hand_graph(spark):
    """K4 minus one edge: nodes a,b,c,d; edges ab,ac,ad,bc,bd (cd absent)
    -> exactly 2 triangles (abc, abd); wedges = sum C(d,2) = C(3,2)*2 +
    C(2,2 choose)... degrees a=3,b=3,c=2,d=2 -> 3+3+1+1 = 8."""
    from melt_spark.functions.graph import triangle_count

    edges = spark.createDataFrame(
        [Row(x="a", y="b"), Row(x="a", y="c"), Row(x="a", y="d"),
         Row(x="b", y="c"), Row(x="b", y="d")])
    [r] = triangle_count(edges, "x", "y").collect()
    assert r.n_nodes == 4 and r.n_edges == 5
    assert r.triangles == 2
    assert r.wedges == 8
    assert abs(r.transitivity - 6 / 8) < 1e-12


def test_triangle_duplicate_and_self_edges_ignored(spark):
    from melt_spark.functions.graph import triangle_count

    edges = spark.createDataFrame(
        [Row(x="a", y="b")] * 3
        + [Row(x="b", y="a"), Row(x="a", y="a"),
           Row(x="b", y="c"), Row(x="a", y="c")])
    [r] = triangle_count(edges, "x", "y").collect()
    assert r.n_edges == 3 and r.triangles == 1


def test_triangle_free_graph_sentinel_and_zero(spark):
    from melt_spark.functions.graph import triangle_count

    # star = wedges but no triangles
    [star] = triangle_count(spark.createDataFrame(
        [Row(x="c", y=f"n{i}") for i in range(5)]), "x", "y").collect()
    assert star.triangles == 0 and star.wedges == 10
    assert star.transitivity == 0.0
    # single edge: no wedges -> sentinel
    [edge] = triangle_count(spark.createDataFrame(
        [Row(x="a", y="b")]), "x", "y").collect()
    assert edge.triangles == 0 and edge.transitivity == -1.0


def test_kcore_hand_graph(spark):
    """K4 plus a pendant chain: the 4-clique is the 3-core; the chain
    peels away over the rounds (cascading removal needs round 2)."""
    from melt_spark.functions.graph import kcore

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    chain = [("d", "e"), ("e", "f"), ("f", "g")]
    edges = spark.createDataFrame(
        [Row(x=u, y=v) for u, v in k4 + chain])
    out = {r.node: r.deg for r in
           kcore(edges, "x", "y", k=3, rounds=3).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert all(d == 3 for d in out.values())
    # k=4: the clique itself dies (max degree in K4 is 3)
    assert kcore(edges, "x", "y", k=4, rounds=3).count() == 0


def test_adamic_adar_hand_case(spark):
    """Suppliers {1,2,3} x customers {10 (deg 3), 11 (deg 2)}: pair
    (1,2) shares both customers -> w(10)+w(11); the others share only
    customer 10."""
    import math

    from pyspark.sql import Row

    from melt_spark.functions.graph import adamic_adar

    edges = spark.createDataFrame(
        [Row(supp=s, cust=10) for s in (1, 2, 3)]
        + [Row(supp=s, cust=11) for s in (1, 2)])
    out = {(r.u, r.v): r for r in
           adamic_adar(edges, "supp", "cust", k=10).collect()}
    w10 = round(1e9 / math.log(3))
    w11 = round(1e9 / math.log(2))
    assert out[(1, 2)].aa_e9 == w10 + w11
    assert out[(1, 2)].n_common == 2
    assert out[(1, 2)].rank == 1
    assert out[(1, 3)].aa_e9 == w10 and out[(2, 3)].aa_e9 == w10


def test_adamic_adar_salting_invariant(spark):
    """bucket_size=2 (forces multi-bucket salting on every center) must
    produce bit-identical pairs to the unsalted regime."""
    from pyspark.sql import Row

    from melt_spark.functions.graph import adamic_adar

    edges = spark.createDataFrame(
        [Row(supp=s, cust=c) for c in range(5) for s in range(c + 2)])
    a = sorted(map(tuple, adamic_adar(edges, "supp", "cust",
                                      k=100, bucket_size=2).collect()))
    b = sorted(map(tuple, adamic_adar(edges, "supp", "cust",
                                      k=100, bucket_size=1024).collect()))
    assert a == b and len(a) > 0


def test_kmv_reach_path_graph(spark):
    """Path a-b-c-d-e: ball(c,2) = all 5, ball(a,2) = {a,b,c} — exact
    counts below the sketch size k."""
    from pyspark.sql import Row

    from melt_spark.functions.graph import kmv_reach

    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=3, b=4), Row(a=4, b=5)])
    got = {r.node: r.reach for r in
           kmv_reach(pairs, "a", "b", radius=2, k=16).collect()}
    assert got == {1: 3, 2: 4, 3: 5, 4: 4, 5: 3}


def test_kmv_reach_saturated_estimates(spark):
    """A star with 40 leaves saturates the k=16 sketch at the hub: the
    estimate must be within the ~1/sqrt(k-2) relative bound of 41."""
    from pyspark.sql import Row

    from melt_spark.functions.graph import kmv_reach

    pairs = spark.createDataFrame([Row(a=0, b=i) for i in range(1, 41)])
    got = {r.node: r for r in
           kmv_reach(pairs, "a", "b", radius=1, k=16).collect()}
    hub = got[0]
    assert hub.n_mins == 16
    assert abs(hub.reach - 41) / 41 < 0.8
    # every leaf sees {self, hub} -> exact 2... via radius 1
    assert got[5].reach == 2


# --- modularity (r7) --------------------------------------------------------

def test_modularity_two_triangles_with_bridge(spark):
    """Two triangles joined by one bridge edge, perfectly partitioned:
    m = 7, each community e = 3, d = 7 -> per-community contribution
    3/7 - (7/14)^2 = 0.1785714..., Q = 0.357."""
    from pyspark.sql import functions as F

    from melt_spark.functions.graph import modularity

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a long, b long")
    labels = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)] + [(n, 2) for n in (4, 5, 6)],
        "node long, community long")
    out = {r.community: r for r in
           modularity(pairs, "a", "b", labels).collect()}
    for c in (1, 2):
        assert (out[c].n_nodes, out[c].e_intra, out[c].d_sum) == (3, 3, 7)
        assert out[c].q_e9 == 178571429
    # degenerate one-community partition scores lower than the split
    one = labels.select("node", F.lit(9).alias("community"))
    q_one = sum(r.q_e9 for r in
                modularity(pairs, "a", "b", one).collect())
    assert q_one == 0  # e/m = 1, (d/2m)^2 = 1 -> Q exactly 0
    assert sum(out[c].q_e9 for c in (1, 2)) > q_one
