"""Distributed Lloyd k-means in integer fixed-point arithmetic — the
training half of the IVF/PQ vector stack (functions/ivf.py consumes
centroids; this is where they come from).

Background (public): Lloyd's algorithm (IEEE Trans. IT 1982). The Spark
shape is the canonical MLlib one: centroids broadcast to executors each
iteration (O(k·d) scalars through the driver — the documented exception
class, like ivf.py's centroid collect), assignment is a pure projection,
and the update is ONE map-side-combined aggregation of per-dimension
sums — k·d rows per task regardless of corpus size. At 100 TB that is
one corpus scan per iteration with a fixed-size shuffle, the textbook
scalable k-means loop (use k-means|| seeding — Bahmani et al., VLDB
2012 — instead of first-k seeding when clusters must be quality-seeded).

Why integer fixed-point (the pagerank argument, functions/graph.py):
float centroid means depend on summation order, which no shuffled
aggregation can pin, so float centroids can never hash-match across
engines or even across runs. Components quantize ONCE to
q = floor((x + OFFSET) · 1e6 + 0.5) — OFFSET shifts the domain
non-negative so the BIGINT mean (sum div n) is the same floor division
in Spark, DuckDB and Python — and every distance, assignment and update
after that is exact integer arithmetic: bit-identical results for a
pinned iteration count. Distance magnitudes: |q| <= 32e6 per component,
diff² <= 4e12 on unit-ish data, ×64 dims ~2.6e14 per vector — BIGINT
sums hold to ~3e4 vectors per cluster per unit scale; far below 2^63.

Empty-cluster rule (pinned so the oracle can mirror it): a cluster that
loses all members keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OFFSET = 16.0        # shifts embedding components non-negative
QSCALE = 1_000_000.0


def quantize_q(vec: Column) -> Column:
    """array<double> -> array<bigint> fixed-point components; floor(+0.5)
    is the portable half-up (similarity.quantize_int8 note)."""
    return F.transform(
        vec,
        lambda x: F.floor((x + F.lit(OFFSET)) * F.lit(QSCALE) + F.lit(0.5))
        .cast("long"))


def _dist_to(carr: Column) -> Column:
    return F.aggregate(
        F.zip_with(F.col("q"), carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign(q: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """(id, q, cid, dist): nearest centroid, ties to the lower cid —
    array_min over (dist, cid) structs evaluates each distance once and
    compares lexicographically.

    The centroids arrive as a BROADCAST 1-row array-of-structs (a
    zero-shuffle crossJoin), NOT as literal arrays baked into the
    expression: k·d literals regenerate different codegen source every
    iteration (each compile ~2 s, dominating small inputs and adding a
    constant tax at any scale), while the data-shaped expression
    compiles once and hits the Janino cache for every subsequent
    iteration and run. Same scalar-broadcast exception class as
    ivf.py's centroid table; assignment stays a pure projection."""
    spark = q.sparkSession
    cdf = spark.createDataFrame(
        [([(cid, [int(x) for x in cents[cid]]) for cid in sorted(cents)],)],
        schema="cs array<struct<cid:int,c:array<bigint>>>")
    m = F.array_min(F.transform(
        F.col("cs"),
        lambda s: F.struct(_dist_to(s["c"]).alias("d"),
                           s["cid"].alias("cid"))))
    return (q.crossJoin(F.broadcast(cdf))
            .select("id", "q", m["cid"].alias("cid"), m["d"].alias("dist")))


def kmeans_fit(df: DataFrame, n_clusters: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding"
               ) -> tuple[DataFrame, dict[int, list[int]]]:
    """`iters` Lloyd iterations from first-k seeds. Returns (q, cents):
    the quantized (id, q) vector table (localCheckpointed — every caller
    re-reads it) and the trained centroid dict — O(k·d) driver state,
    the documented scalar-broadcast exception class."""
    from .similarity import _dvec

    q = (df.select(F.col(id_col).alias("id"),
                   quantize_q(_dvec(vec_col)).alias("q"))
         .localCheckpoint(eager=True))
    cents = {int(r["id"]): [int(x) for x in r["q"]]
             for r in q.filter(F.col("id") < n_clusters).collect()}

    for _ in range(iters):
        a = _assign(q, cents)
        sums = (a.select("cid", F.posexplode("q").alias("i", "val"))
                .groupBy("cid", "i")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect())
        upd: dict[int, dict[int, int]] = {}
        for r in sums:
            upd.setdefault(int(r["cid"]), {})[int(r["i"])] = \
                int(r["s"]) // int(r["n"])  # non-negative: floor == trunc
        cents = {cid: ([upd[cid][i] for i in range(len(comps))]
                       if cid in upd else comps)
                 for cid, comps in cents.items()}
    return q, cents


def kmeans_train(df: DataFrame, n_clusters: int = 8, iters: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """`iters` Lloyd iterations from first-k seeds; output one row per
    cluster: (cid, n_assigned, sse, c1, c2) — final membership count,
    integer sum of squared distances, and the first two centroid
    components (the full centroid is O(k·d) driver state; two components
    pin it in the hash without widening the row)."""
    spark = df.sparkSession
    q, cents = kmeans_fit(df, n_clusters, iters, id_col, vec_col)
    a = _assign(q, cents)
    stats = (a.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n_assigned"),
                  F.sum("dist").alias("sse")))
    cinfo = spark.createDataFrame(
        [(cid, cents[cid][0], cents[cid][1]) for cid in sorted(cents)],
        schema="cid int, c1 long, c2 long")
    return (cinfo.join(stats, "cid", "left")
            .select("cid",
                    F.coalesce("n_assigned", F.lit(0)).cast("bigint")
                    .alias("n_assigned"),
                    F.coalesce("sse", F.lit(0)).cast("bigint")
                    .alias("sse"),
                    "c1", "c2"))


def kmeans_outliers(df: DataFrame, n_clusters: int = 8, iters: int = 2,
                    top_n: int = 20, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-N vectors FARTHEST from their assigned centroid — the
    embedding-outlier gate of a training-data pipeline (prune encoder
    glitches / out-of-domain samples before contrastive training; the
    distance-to-centroid criterion is the classic k-means outlier score,
    e.g. Chawla & Gionis, "k-means--", SDM 2013). Rides kmeans_fit, so
    distances are exact integers and the (dist desc, id asc) top-N is
    bit-deterministic — at scale the global limit is a TakeOrdered
    (per-partition heaps + driver merge of top_n rows), never a full
    sort. Output: (id_col, cid, dist)."""
    q, cents = kmeans_fit(df, n_clusters, iters, id_col, vec_col)
    a = _assign(q, cents)
    return (a.orderBy(F.desc("dist"), F.asc("id")).limit(top_n)
            .select(F.col("id").alias(id_col), "cid", "dist"))
