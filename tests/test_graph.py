"""Fixed-point PageRank (functions/graph.py): exactness against an
independent Python reference, invariants, and graph construction."""

from pyspark.sql import functions as F

from melt_spark.functions.graph import (DAMP_DEN, DAMP_NUM, SCALE,
                                        pagerank_int, symmetrize)


def _ref_pagerank(edges, iters):
    """Independent driver-side reference of the same integer recurrence."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _d in edges:
        outdeg[s] += 1
    nodes = sorted(outdeg)
    score = {v: SCALE for v in nodes}
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    for _ in range(iters):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += score[s] // outdeg[s]
        score = {v: base + DAMP_NUM * inflow[v] // DAMP_DEN for v in nodes}
    return score


def test_matches_python_reference_exactly(spark):
    pairs = [(1, 10), (1, 11), (2, 10), (3, 10), (3, 12), (4, 12)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    edges = symmetrize(pdf, "a", "b")
    got = {r.node: r.score for r in pagerank_int(edges, iters=4).collect()}
    sym = pairs + [(b, a) for a, b in pairs]
    assert got == _ref_pagerank(sym, iters=4)


def test_star_center_dominates(spark):
    pairs = [(0, i) for i in range(1, 8)]
    edges = symmetrize(spark.createDataFrame(pairs, "a long, b long"),
                       "a", "b")
    scores = {r.node: r.score for r in pagerank_int(edges, iters=3).collect()}
    assert scores[0] > max(v for k, v in scores.items() if k != 0)
    # leaves are symmetric -> identical scores
    assert len({v for k, v in scores.items() if k != 0}) == 1


def test_invariants_on_fixture_graph(spark, sf_dir):
    from melt_spark.sources.parquet import read_table

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("cust"),
                     (F.lit(1_000_000) + F.col("l_suppkey")).alias("supp"))
             .distinct())
    edges = symmetrize(pairs, "cust", "supp")
    n = edges.select("src").distinct().count()
    scores = pagerank_int(edges, iters=3).cache()
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    assert scores.count() == n
    agg = scores.agg(F.min("score"), F.sum("score")).first()
    assert agg[0] >= base                 # teleport floor
    assert agg[1] <= n * SCALE            # floor division only loses mass
    # suppliers are the high-in-degree side of the bipartite graph
    top = scores.orderBy(F.desc("score")).first()
    assert top.node >= 1_000_000
    scores.unpersist()


def test_symmetrize_both_directions(spark):
    pdf = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {(r.src, r.dst) for r in symmetrize(pdf, "a", "b").collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}
