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
from .util import one_partition

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


def salted_neighbor_pairs(e: DataFrame,
                          bucket_size: int = 1024,
                          deg: DataFrame | None = None) -> DataFrame:
    """(l, r) edges → one row per unordered pair of a center vertex l's
    neighbors: columns (l, r, r2) with r < r2 — the wedge generator
    shared by the butterfly census and Adamic-Adar link prediction,
    carrying the HUB-SKEW GUARD those operators need at 100 TB.

    A plain self-join on l puts ONE hub vertex's C(d, 2) pairs inside the
    single task that owns key l. So the join is SALTED: each center's
    neighbor list splits into nb = ceil(d / bucket_size) deterministic
    buckets (pmod(xxhash64(r), nb)); the A side replicates each edge to
    keys (l, b, j) for j in b..nb-1 and the B side to (l, i, b) for
    i in 0..b, so every bucket-pair (i <= j) is an INDEPENDENT join key
    and no task sees more than ~bucket_size² pairs per key. Each
    unordered pair lands under exactly one key (cross-bucket pairs once
    under (min_b, max_b); same-bucket pairs deduplicated by r < r2) —
    output is provably identical to the unsalted join, and for the
    non-hub bulk (d <= bucket_size) nb = 1 so there is NO replication.
    Planted-hub probe: tools/butterfly_hub_probe.py.

    ``deg``: optional precomputed (l, d) center-degree frame — callers
    that already aggregate degrees (weights, totals) pass it so the
    count runs once (r12; pure plumbing, counts unchanged)."""
    if deg is None:
        deg = e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
    eb = (e.join(deg, "l")
          .withColumn("nb", F.expr(f"(d + {bucket_size - 1})"
                                   f" div {bucket_size}"))
          .withColumn("b", F.pmod(F.xxhash64("r"), F.col("nb"))))
    a_side = eb.select(
        "l", "r", F.col("b").alias("i"),
        F.explode(F.sequence(F.col("b"), F.col("nb") - 1)).alias("j"))
    b_side = eb.select(
        F.col("l").alias("l2"), F.col("r").alias("r2"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("b")))
        .alias("i2"), F.col("b").alias("j2"))
    joined = a_side.join(
        b_side, (F.col("l") == F.col("l2")) & (F.col("i") == F.col("i2"))
        & (F.col("j") == F.col("j2"))
        # cross-bucket keys hold each unordered pair exactly once (the two
        # neighbors' buckets differ); same-bucket keys need the r < r2 cut
        & ((F.col("i") < F.col("j")) | (F.col("r") < F.col("r2"))))
    return joined.select("l", F.least("r", "r2").alias("r"),
                         F.greatest("r", "r2").alias("r2"))


def butterfly_count(edges: DataFrame, left: str, right: str,
                    bucket_size: int = 1024) -> DataFrame:
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

    HUB-SKEW GUARD (the side choice bounds total volume, not per-task
    volume): a plain self-join on l puts ONE hub vertex's C(d, 2) wedge
    pairs inside the single task that owns key l — at 100 TB a 10^5-degree
    hub is 5x10^9 pairs in one task. So the wedge join is SALTED: each
    left vertex's neighbor list is split into nb = ceil(d / bucket_size)
    deterministic buckets (pmod(xxhash64(r), nb)); the A side replicates
    each edge to keys (l, b, j) for j in b..nb-1 and the B side to
    (l, i, b) for i in 0..b, so every bucket-pair (i <= j) is an
    INDEPENDENT join key and no task sees more than ~bucket_size^2 pairs
    per key. Each unordered neighbor pair lands under exactly one key
    (cross-bucket pairs once under (min_b, max_b); same-bucket pairs
    deduplicated by r < r2) — the count is provably identical to the
    unsalted join, and for the non-hub bulk (d <= bucket_size) nb = 1 so
    there is NO replication. Replication for a hub is nb/2 per side
    (= d / 2*bucket_size), vanishing next to its C(d, 2) output.

    Determinism: pure integer arithmetic; bucketing cannot change counts;
    the coefficient is one IEEE divide of exact integers.
    """
    # the distinct edge set is COMPACT (two keys) but derives from the
    # corpus join upstream — localCheckpoint it once (r12): it feeds the
    # wedge generator's degree table, its bucketed self-join sides and
    # the totals branch, and without the checkpoint each consumer
    # re-derived the whole join+distinct lineage inside one plan
    e = (edges.select(F.col(left).alias("l"), F.col(right).alias("r"))
         .distinct().localCheckpoint(eager=True))
    degs = (e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=True))   # shared: salting + totals
    pairs = (salted_neighbor_pairs(e, bucket_size, deg=degs)
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


def triangle_count(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Exact triangle census of an undirected graph — ONE summary row
    with node/edge/wedge/triangle counts plus global transitivity.

    Background (public): degree-ordered node-iterator counting — Schank &
    Wagner, "Finding, counting and listing all triangles in large graphs"
    (WEA 2005); the MapReduce formulation and the skew analysis are Suri
    & Vassilvitskii, "Counting triangles and the curse of the last
    reducer" (WWW 2011). Orient every edge from the endpoint of lower
    (degree, id) rank to the higher; each triangle then has EXACTLY ONE
    source node with two outgoing oriented edges, so triangles = oriented
    wedges whose far pair is itself an oriented edge.

    Why this is the 100 TB shape: under degree ordering a node's
    out-degree is O(sqrt(m)) regardless of its raw degree (a hub's edges
    orient INTO it once neighbors outrank it) — the same hub that needs
    explicit salting in the bipartite butterfly census is defused here by
    the orientation itself, which is the published point of the
    vertex-ordering family. Wedge volume is sum(outdeg^2) <= m^1.5, and
    the closing step is an equi-join of compact (v, w) pairs.

    Determinism: pure integer arithmetic; transitivity = one IEEE divide
    of exact integers (3T / #wedges), sentinel -1.0 on wedge-free graphs.
    """
    und = (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                        F.greatest(F.col(a), F.col(b)).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    both = und.unionByName(und.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # oriented: src = lower (deg, id) endpoint
    du = deg.select(F.col("u").alias("_u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("_v"), F.col("d").alias("dv"))
    ranked = (und.join(du, und["u"] == du["_u"])
              .join(dv, und["v"] == dv["_v"]))
    fwd = (F.col("du") < F.col("dv")) | \
          ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"))
    o2 = oriented.select(F.col("src").alias("src2"),
                         F.col("dst").alias("dst2"))
    owedges = (oriented.join(o2, (F.col("src") == F.col("src2"))
                             & (F.col("dst") < F.col("dst2")))
               .select(F.col("dst").alias("x"), F.col("dst2").alias("y")))
    # close the wedge: (x, y) must be an oriented edge IN EITHER DIRECTION
    # (x and y's relative rank is unrelated to their shared source's)
    closing = oriented.select(
        F.least("src", "dst").alias("cx"), F.greatest("src", "dst")
        .alias("cy"))
    tri = (owedges.select(F.least("x", "y").alias("cx"),
                          F.greatest("x", "y").alias("cy"))
           .join(closing, ["cx", "cy"])
           .agg(F.count(F.lit(1)).alias("triangles")))
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1)")).alias("w2"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").alias("deg_sum"))
    out = tri.crossJoin(F.broadcast(wed)).select(
        "n_nodes", F.expr("deg_sum div 2").alias("n_edges"),
        F.expr("w2 div 2").alias("wedges"), "triangles")
    transitivity = F.when(
        F.col("wedges") > 0,
        (F.lit(3) * F.col("triangles")).cast("double")
        / F.col("wedges").cast("double")).otherwise(F.lit(-1.0))
    return out.select("n_nodes", "n_edges", "wedges", "triangles",
                      transitivity.alias("transitivity"))


def kcore(pairs: DataFrame, a: str, b: str, k: int = 3,
          rounds: int = 4) -> DataFrame:
    """k-core decomposition by UNROLLED peeling — `rounds` synchronous
    rounds of "drop every vertex with degree < k, recompute degrees"
    (Matula & Beck, "Smallest-last ordering and clustering and graph
    coloring algorithms", JACM 1983; the distributed synchronous-peeling
    formulation is Montresor, De Pellegrini, Miorandi, "Distributed
    k-core decomposition", IEEE TPDS 2013). The k-core is the standard
    dense-region extractor — spam rings, bot clusters, well-connected
    entity hubs.

    Round count is PINNED (the pagerank contract): peeling converges in
    at most |V| rounds but real graphs settle in a handful; a fixed
    `rounds` makes the operator deterministic and lets the oracle unroll
    the same rounds as CTEs. Callers needing certified convergence check
    that round r and r-1 agree (n_alive stabilizes) and re-run deeper.

    Spark-first shape: each round is one degree aggregation + two
    semi-joins restricting the edge list — all keyed on vertex ids; the
    edge list localCheckpoints per round so the unrolled lineage stays
    flat (Catalyst reuses exchanges, not subplans). At 100 TB: degrees
    are compact (vertex, int64) rows; no round materializes anything
    bigger than the surviving edge list.

    Output: (node, deg) for vertices still alive after `rounds` peels,
    with their degree in the surviving subgraph.
    """
    und = (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                        F.greatest(F.col(a), F.col(b)).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct()
           .localCheckpoint(eager=True))
    edges = und
    for _ in range(rounds):
        deg = (edges.select(F.col("u").alias("n"))
               .unionByName(edges.select(F.col("v").alias("n")))
               .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
        alive = deg.filter(F.col("d") >= k).select("n")
        edges = (edges
                 .join(alive.withColumnRenamed("n", "u"), "u", "left_semi")
                 .join(alive.withColumnRenamed("n", "v"), "v", "left_semi")
                 .localCheckpoint(eager=True))
    final_deg = (edges.select(F.col("u").alias("node"))
                 .unionByName(edges.select(F.col("v").alias("node")))
                 .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    return final_deg.filter(F.col("deg") >= k)


def adamic_adar(edges: DataFrame, left: str, right: str, k: int = 50,
                bucket_size: int = 1024) -> DataFrame:
    """Link prediction over a bipartite graph: top-k pairs of `left`
    vertices scored by Adamic-Adar — the sum over common `right`
    neighbors w of 1/ln(deg(w)), which discounts promiscuous hubs
    (Adamic & Adar, "Friends and neighbors on the Web", Social Networks
    2003; the link-prediction benchmark standard since Liben-Nowell &
    Kleinberg, CIKM 2003).

    Integer-exact cross-engine: ln is not correctly rounded, so each
    neighbor's weight is scaled to an integer ONCE —
    w_e9 = round(1e9 / ln(deg)) — and the pair score aa_e9 = Σ w_e9 is
    an order-independent BIGINT sum (the pagerank fixed-point argument:
    no float reduction ever crosses a shuffle). deg >= 2 for any common
    neighbor, so ln never sees 1.

    Scale shape (100 TB): wedge volume is Σ_w C(deg(w), 2) — generation
    goes through salted_neighbor_pairs, so a hub's pairs spread over
    independent bucket-pair keys instead of one task (the butterfly
    census guard). The per-center weight join adds one compact
    (center, int64) table; the pair aggregation is map-side combined on
    (u, v) keys bounded by the candidate-pair count, never the corpus.
    """
    from pyspark.sql.window import Window

    # center the wedge on the RIGHT vertex: pairs of left vertices share w
    # (r12: checkpoint the compact edge set and share ONE degree table —
    # previously the corpus join+distinct re-derived for the weight
    # branch AND twice inside the wedge generator, whose internal degree
    # count also duplicated the weight branch's)
    e = (edges.select(F.col(right).alias("l"), F.col(left).alias("r"))
         .distinct().localCheckpoint(eager=True))
    deg = (e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
           .localCheckpoint(eager=True))
    weights = (deg.filter(F.col("d") >= 2)
               .select("l", F.round(F.lit(1e9)
                                    / F.log(F.col("d").cast("double")))
                       .cast("bigint").alias("w_e9")))
    prs = (salted_neighbor_pairs(e, bucket_size, deg=deg)
           .join(weights, "l")
           .groupBy(F.col("r").alias("u"), F.col("r2").alias("v"))
           .agg(F.count(F.lit(1)).alias("n_common"),
                F.sum("w_e9").cast("bigint").alias("aa_e9")))
    top = prs.orderBy(F.desc("aa_e9"), F.asc("u"), F.asc("v")).limit(k)
    w = Window.partitionBy(one_partition(F.col("aa_e9")))\
        .orderBy(F.desc("aa_e9"), F.asc("u"), F.asc("v"))
    return top.withColumn("rank", F.row_number().over(w))


def kmv_reach(pairs: DataFrame, a: str, b: str, radius: int = 2,
              k: int = 16) -> DataFrame:
    """Neighborhood-function estimation: per vertex, the approximate
    size of its radius-r ball |{u : dist(v,u) <= r}| via mergeable
    KMV sketch propagation — HyperBall with KMV in place of HLL
    (Boldi & Vigna, "In-core computation of geometric centralities
    with HyperBall", ICDMW 2013; Palmer/Gibbons/Faloutsos ANF, KDD
    2002), because KMV's estimate is bit-deterministic across engines
    (functions/sketches.py rationale) where HLL implementations are not.

    Per round, every vertex's sketch is the k-min merge of its own and
    its neighbors' previous sketches; after r rounds the sketch covers
    exactly the radius-r ball (union-merge of truncated k-min sets is
    exact sketch algebra, property-tested in tests/test_sketches.py).

    Scale shape (100 TB): per-round state is <= k 8-byte hashes per
    vertex; the propagate join ships <= k rows per directed edge —
    O(k·|E|) per round, the published HyperBall bound — and every
    shuffle key is a vertex id. Rounds localCheckpoint so the unrolled
    lineage stays flat (the kcore pattern). Output: (node, n_mins, kth,
    reach) with reach exact below k and the Bar-Yossef floor-estimator
    above it.
    """
    from pyspark.sql.window import Window

    from .sketches import kmv_estimate, kmv_hash

    und = symmetrize(pairs, a, b).localCheckpoint(eager=True)
    nodes = und.select(F.col("src").alias("node")).distinct()
    mins = nodes.select("node", kmv_hash(F.col("node")).alias("h"))
    w = Window.partitionBy("node").orderBy("h")
    for _ in range(radius):
        prop = (und.join(mins.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), "h"))
        u = mins.unionByName(prop).distinct()
        mins = (u.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).select("node", "h")
                .localCheckpoint(eager=True))
    sk = mins.groupBy("node").agg(F.count("h").alias("n_mins"),
                                  F.max("h").alias("kth"))
    return (kmv_estimate(sk, k=k)
            .select("node", "n_mins", "kth",
                    F.col("kmv_est").alias("reach")))


def hits_int(edges: DataFrame, iters: int = 2,
             scale: int = 10 ** 6,
             checkpoint_edges: bool = False) -> DataFrame:
    """(node, hub, authority) after `iters` HITS iterations in integer
    fixed-point (Kleinberg, "Authoritative sources in a hyperlinked
    environment", JACM 1999). edges: DIRECTED (src, dst), distinct —
    unlike pagerank_int's symmetrized input, direction is the point:
    hubs are good pointers (customers that buy broadly), authorities are
    good targets (suppliers bought from by good hubs).

    Normalization is the float-killer in HITS (the classic L2 norm is a
    sqrt of a sum — order-safe, but the division isn't integer-exact), so
    this uses max-normalization in fixed point: after each sum, scores
    rescale to x * scale div max(x). Max and floor-div are exact and
    order-independent, so a pinned iteration count is bit-reproducible in
    any engine — the same argument as pagerank_int's (see module
    docstring). The max is a 1-row aggregate broadcast back via
    crossJoin (the documented scalar-broadcast exception, like ivf.py's
    centroids).

    Per iteration: two edge joins + two map-side-combined sums, both
    shuffling (int64, int64) pairs. Overflow headroom: scores <= scale
    (1e6) after each rescale, so a sum over d in-edges <= d * 1e6 —
    BIGINT-safe to in-degrees of ~9e12; the rescale PRODUCT x * scale
    runs in DECIMAL(38,0) (exact, matches DuckDB's HUGEINT `//`), so it
    never wraps even at that bound. Nodes that never appear as dst
    (resp. src) carry authority (resp. hub) 0.

    Each pre-rescale score table localCheckpoints: it is read THREE ways
    (the max aggregate, the rescale projection, the next half-iteration's
    edge join) and Catalyst reuses exchanges, not arbitrary subplans —
    without the checkpoint the unrolled plan re-derives the whole chain
    per reference (measured 178 exchanges vs 14 at 2 iterations on the
    suite's purchase graph). Same lineage-cap role as pagerank's
    checkpoint_edges and dedup.connected_components' per-round cut.
    """
    if checkpoint_edges:
        edges = edges.localCheckpoint(eager=True)
    edges = edges.select("src", "dst")
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    hub = nodes.withColumn("h", F.lit(scale).cast("bigint"))

    def _rescale(df: DataFrame, col: str) -> DataFrame:
        df = df.localCheckpoint(eager=True)
        m = df.agg(F.max(col).alias("__m"))
        return (df.crossJoin(F.broadcast(m))
                .select("node",
                        F.expr(f"CAST(CAST({col} AS DECIMAL(38,0))"
                               f" * {scale} div __m AS BIGINT)")
                        .alias(col)))

    auth = None
    for _ in range(iters):
        a_raw = (edges.join(hub.withColumnRenamed("node", "src"), "src")
                 .groupBy("dst").agg(F.sum("h").alias("a")))
        auth = _rescale(
            nodes.join(a_raw.withColumnRenamed("dst", "node"),
                       "node", "left")
            .select("node", F.coalesce("a", F.lit(0)).alias("a")), "a")
        h_raw = (edges.join(auth.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src").agg(F.sum("a").alias("h")))
        hub = _rescale(
            nodes.join(h_raw.withColumnRenamed("src", "node"),
                       "node", "left")
            .select("node", F.coalesce("h", F.lit(0)).alias("h")), "h")
    return (hub.join(auth, "node")
            .select("node", F.col("h").alias("hub"),
                    F.col("a").alias("authority")))


def ppr_int(edges: DataFrame, seeds: list[int], iters: int = 3,
            checkpoint_edges: bool = False) -> DataFrame:
    """(node, score) Personalized PageRank in the same BIGINT fixed-point
    discipline as pagerank_int: restart mass returns to the SEED set
    instead of uniformly (Page et al. 1999 §6 personalized vectors;
    Jeh & Widom, "Scaling personalized web search", WWW 2003) — the
    ranker behind graph-based recommendation and GraphRAG-style
    neighborhood retrieval ("what is close to THESE nodes").

    score' = restart + (85 · inflow) div 100, where restart =
    (SCALE·15/100) div |seeds| at seed nodes and 0 elsewhere — every op
    is an integer sum / floor division, so a pinned iteration count is
    bit-reproducible and the unrolled CTE oracle matches exactly.
    Initial mass: SCALE div |seeds| on each seed, 0 elsewhere (the
    standard e_S start), so early iterations already rank locality.

    Seeds ship as a BROADCAST one-column table (literal-free codegen —
    the kmeans lesson), joined once per iteration to add restart mass.
    Same shuffle shape as pagerank_int: the per-iteration cost is two
    (int64, int64) exchanges regardless of seed count.
    """
    if checkpoint_edges:
        edges = edges.localCheckpoint(eager=True)
    edges = edges.select("src", "dst")
    spark = edges.sparkSession
    seed_df = spark.createDataFrame([(int(s),) for s in sorted(set(seeds))],
                                    schema="node bigint")
    restart = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN // len(set(seeds))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    base = (nodes.join(F.broadcast(seed_df.withColumn("__seed", F.lit(1))),
                       "node", "left")
            .select("node",
                    F.when(F.col("__seed").isNotNull(), F.lit(restart))
                    .otherwise(F.lit(0)).cast("bigint").alias("restart"))
            .localCheckpoint(eager=True))
    init = SCALE // len(set(seeds))
    scores = base.select(
        "node",
        F.when(F.col("restart") > 0, F.lit(init)).otherwise(F.lit(0))
        .cast("bigint").alias("score"))

    for _ in range(iters):
        contrib = (edges
                   .join(scores.withColumnRenamed("node", "src"), "src")
                   .join(outdeg, "src")
                   .select("dst", F.expr("score div outdeg").alias("c")))
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        scores = (base
                  .join(inflow.withColumnRenamed("dst", "node"),
                        "node", "left")
                  .select("node",
                          (F.col("restart")
                           + F.expr(f"({DAMP_NUM} * coalesce(s, 0))"
                                    f" div {DAMP_DEN}"))
                          .cast("bigint").alias("score")))
    return scores


def lpa_communities(pairs: DataFrame, a: str, b: str,
                    rounds: int = 3) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert, Kumara, "Near linear time algorithm to detect community
    structures in large-scale networks", Phys. Rev. E 2007), made
    DETERMINISTIC: every node simultaneously adopts the most frequent
    label among its neighbors, ties broken toward the SMALLEST label —
    no randomized visit order, so the result is engine-independent and
    the oracle can unroll the same rounds as CTEs (the pagerank/kcore
    contract; round count pinned, convergence checked by the caller
    comparing round r to r-1 if certification is needed).

    Spark-first shape per round: one equi-join (edges ⋈ labels on the
    source endpoint) + one (node, label) count aggregation + one argmax
    aggregation — the argmax is max(struct(cnt, -label)), a plain
    partial-aggregable max, NOT a window over the neighbor table. The
    label table localCheckpoints per round so the unrolled lineage
    stays flat (the HITS 178→4 exchange lesson). At 100 TB: each round
    shuffles (node, label, cnt) triples bounded by the edge count, and
    the label state is one (node, bigint) row per vertex.

    Output: (node, community) after `rounds` synchronous updates.
    """
    und = (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                        F.greatest(F.col(a), F.col(b)).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    edges = (und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
             .unionByName(
                 und.select(F.col("v").alias("src"),
                            F.col("u").alias("dst")))
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(rounds):
        neigh = (edges.join(labels.withColumnRenamed("node", "src"),
                            "src")
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        best = (neigh.groupBy("node")
                .agg(F.max(F.struct(F.col("cnt"),
                                    (-F.col("label")).alias("nl")))
                     .alias("m"))
                .select("node", (-F.col("m.nl")).alias("label")))
        labels = best.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def random_walks(pairs: DataFrame, a: str, b: str,
                 steps: int = 3) -> DataFrame:
    """Deterministic DeepWalk/node2vec-style walk generation (Perozzi,
    Al-Rfou, Skiena, "DeepWalk: online learning of social
    representations", KDD 2014): one walk per vertex, `steps` hops, the
    next hop from node n at step t being the neighbor m minimizing the
    portable 48-bit md5 fold of "n:t:m" — a hash-seeded uniform choice
    that is reproducible on any engine (the corpus for training graph
    embeddings, generated without any RNG state).

    Spark-first shape: because the hop hash depends only on
    (cur, step, next) — never on the walk — the step-t move is a
    per-NODE transition function, not a per-walk one. Each step
    therefore computes ONE argmin transition table over the edge list
    (O(E), a partial-aggregable min) and maps the walk frontier through
    it with a |V|-row equi-join. The naive frontier⋈edges formulation
    instead pays Σ_walks deg(cur), which explodes when walks
    concentrate on hubs — measured 10.8 s for step 2 vs 2.2 s for step
    3 on the fixture's customer→supplier funnel; the transition-table
    form is hub-concentration-immune by construction. (A walk-dependent
    variant would hash walk_id too — more diverse corpus, but then the
    hub blowup is real and needs the salted-wedge treatment.)

    Output: (start, n1, .., n_steps) — one row per start vertex; dead
    ends (no neighbor) terminate the walk and carry -1 thereafter
    (cannot happen on a symmetrized edge list, but the contract is
    total).
    """
    from .sketches import kmv_hash

    und = (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                        F.greatest(F.col(a), F.col(b)).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    edges = (und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
             .unionByName(
                 und.select(F.col("v").alias("src"),
                            F.col("u").alias("dst")))
             .localCheckpoint(eager=True))
    walks = (edges.select(F.col("src").alias("start")).distinct()
             .withColumn("cur", F.col("start")))
    hops: list[str] = []
    for t in range(1, steps + 1):
        h = kmv_hash(F.concat_ws(":", F.col("src").cast("string"),
                                 F.lit(str(t)),
                                 F.col("dst").cast("string")))
        trans = (edges.groupBy("src")
                 .agg(F.min(F.struct(h.alias("h"),
                                     F.col("dst").alias("d"))).alias("m"))
                 .select(F.col("src").alias("cur"),
                         F.col("m.d").alias("nxt")))
        col = f"n{t}"
        walks = (walks.join(trans, "cur", "left")
                 .select("start", F.coalesce("nxt", F.lit(-1)).alias(col))
                 .withColumn("cur", F.col(col))
                 .localCheckpoint(eager=True))
        # accumulate the path columns (|V|-row equi-joins, flat lineage)
        hops.append(col)
        if t == 1:
            path = walks.select("start", col)
        else:
            path = path.join(walks.select("start", col), "start")
    return path.select("start", *hops)


def modularity(pairs: DataFrame, a: str, b: str,
               labels: DataFrame) -> DataFrame:
    """Newman-Girvan modularity of a node partition (Newman & Girvan,
    "Finding and evaluating community structure in networks", Phys.
    Rev. E 2004): Q = Σ_c (e_c/m − (d_c/2m)²) over communities c, with
    e_c = intra-community edges, d_c = total degree inside c, m = total
    undirected edges — the standard quality score for lpa_communities'
    output (``labels`` = (node, community)).

    Returns per community: n_nodes, e_intra, d_sum (exact integers) and
    q_e9 — the community's contribution in 1e-9 units (pinned IEEE,
    rounded once; sum the column for Q). Communities with zero intra
    edges still appear (their −(d/2m)² term is part of Q).

    Scale shape: the canonical undirected edge set and the degree table
    are each one map-side-combined shuffle; m is a keyless 1-row
    aggregate cross-joined broadcast; community sums are
    community-cardinality tables."""
    und = (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                        F.greatest(F.col(a), F.col(b)).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct()
           .localCheckpoint(eager=True))
    m1 = und.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    deg = (und.select(F.col("u").alias("node"))
           .unionByName(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("__deg")))
    lu = labels.select(F.col("node").alias("u"),
                       F.col("community").alias("__cu"))
    lv = labels.select(F.col("node").alias("v"),
                       F.col("community").alias("__cv"))
    intra = (und.join(lu, "u").join(lv, "v")
             .filter(F.col("__cu") == F.col("__cv"))
             .groupBy(F.col("__cu").alias("community"))
             .agg(F.count(F.lit(1)).alias("e_intra")))
    per = (deg.join(labels, "node")
           .groupBy("community")
           .agg(F.count(F.lit(1)).alias("n_nodes"),
                F.sum("__deg").alias("d_sum")))
    out = (per.join(intra, "community", "left")
           .withColumn("e_intra", F.coalesce("e_intra", F.lit(0)))
           .crossJoin(F.broadcast(m1)))
    md = F.col("__m").cast("double")
    frac = F.col("e_intra").cast("double") / md
    half = F.col("d_sum").cast("double") / (F.lit(2.0) * md)
    q = frac - half * half
    return out.select(
        "community",
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("e_intra").cast("bigint").alias("e_intra"),
        F.col("d_sum").cast("bigint").alias("d_sum"),
        F.round(q * F.lit(1e9)).cast("bigint").alias("q_e9"))
