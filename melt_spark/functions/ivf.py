"""IVF (inverted-file) approximate nearest-neighbor — the clustered scale
path for similarity search.

Hyperplane LSH (similarity.py) buckets by random sign patterns; IVF instead
partitions the corpus by nearest centroid and probes only the `nprobe`
closest lists per query — the structure behind FAISS-style ANN at scale:

    assign:  corpus × centroids (centroids broadcast) → argmin distance
    search:  queries × centroids → top-nprobe lists; then only those lists'
             vectors are scored (a semi-join on list id, NOT a full scan)

Centroids here are chosen deterministically from the corpus (every Nth
vector) so results are reproducible and oracle-restatable; swap in k-means
centroids (Spark MLlib) for production recall without touching the search
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _dvec, cosine


# few-file parallelism guard now shared across the operator library;
# re-exported here because ivf callers import it from this module
from .util import spread_input  # noqa: E402,F401


def deterministic_centroids(corpus: DataFrame, every: int = 50,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            max_lists: int = 4096) -> DataFrame:
    """Every `every`-th vector (by id) becomes a centroid. Deterministic,
    trivially reproducible in SQL.

    ``max_lists`` (r8): the centroid table BROADCASTS into every assign
    pass, and a fixed FRACTION of the corpus is unbounded at 100 TB —
    the one shape that cannot adapt away. The smallest ``max_lists``
    ids win (TakeOrdered — deterministic AND plan-visible, so the
    downstream broadcast passes plan lint); every fixture scale up to
    the 64x probe stays below the cap, so results are unchanged there.
    Beyond the cap, switch to kmeans_centroids with fixed k — centroid
    quality converges long before centroid count has to track corpus
    size."""
    return (corpus.filter(F.col(id_col) % every == 0)
            .orderBy(id_col).limit(max_lists)
            .select((F.col(id_col) / every).cast("long").alias("list_id"),
                    _dvec(vec_col).alias("centroid")))


def kmeans_centroids(corpus: DataFrame, k: int = 10, seed: int = 42,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Production centroids: seeded MLlib KMeans over the corpus. Same
    (list_id, centroid) contract as deterministic_centroids, so the search
    plan (ivf_assign / ivf_topk centroids=...) is unchanged. Train on a
    sample at 100 TB — centroid quality converges long before full data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(_dvec(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
    spark = corpus.sparkSession
    rows = [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(rows, "list_id long, centroid array<double>")


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties → lowest
    list_id). Centroids are tiny → broadcast; one pass over the corpus.

    argmax is max_by over (sim, -list_id), NOT a row_number window: after
    the crossJoin every vector carries nlists rows, and max_by pre-reduces
    them map-side to one row per vector before the shuffle — a window would
    ship and sort all nlists× rows. At 100 TB that is the difference
    between shuffling the corpus once and shuffling it nlists times."""
    corpus = spread_input(corpus, id_col)
    c = corpus.select(F.col(id_col), _dvec(vec_col).alias("v"))
    scored = (c.crossJoin(F.broadcast(centroids))
              .withColumn("sim", cosine(F.col("v"), F.col("centroid"))))
    best = scored.groupBy(id_col).agg(
        F.max_by(F.struct(F.col("list_id"), F.col("v")),
                 F.struct(F.col("sim"),
                          (-F.col("list_id")).alias("neg"))).alias("b"))
    return best.select(id_col, F.col("b.list_id").alias("list_id"),
                       F.col("b.v").alias("v"))


def two_level_assign(corpus: DataFrame, centroids: DataFrame,
                     group: int = 16, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Coarse-quantized assignment — the sub-quadratic scale path.

    Single-level assign is O(N * k) cosine evaluations; when cluster count
    k grows with the corpus (k = N/target_cluster_size, the SemDeDup
    regime), that is O(N²/target) — measured super-linear at the 16x
    probe (ratio 36x). The classic escape (FAISS IMI / two-level k-means)
    scores a small COARSE codebook first:

        super-centroid  = element-wise MEAN of each group of `group`
                          consecutive lists (the parent node a hierarchical
                          k-means would produce — a group MEMBER would be a
                          terrible representative when members are mutually
                          dissimilar, routing would be chance)
        step 1: vector -> nearest of k/group super-centroids
        step 2: vector -> nearest of the `group` centroids in that
                super-group

    Cost N * (k/group + group), minimized at group ~ sqrt(k) -> O(N*sqrt(k)).
    Assignment is approximate (a vector near a group boundary may land in
    a neighboring list); tests/test_ivf.py pins agreement >= 0.9 with
    exact assign on clustered data (the fixture's uniform random vectors
    are the no-structure worst case — any coarse router degrades there).
    Both codebook frames broadcast; the corpus still moves zero times
    during scoring. For best routing pair this with kmeans_centroids
    (similar centroids land in nearby list_ids via cluster ordering)."""
    cents = centroids.withColumn(
        "super_id", (F.col("list_id") / group).cast("long"))
    supers = (cents
              .select("super_id", F.posexplode("centroid").alias("pos", "x"))
              .groupBy("super_id", "pos").agg(F.avg("x").alias("m"))
              .groupBy("super_id")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "m"))),
                  lambda s: s["m"]).alias("scentroid")))

    corpus = spread_input(corpus, id_col)
    c = corpus.select(F.col(id_col), _dvec(vec_col).alias("v"))
    step1 = (c.crossJoin(F.broadcast(supers))
             .withColumn("ssim", cosine(F.col("v"), F.col("scentroid")))
             .groupBy(id_col)
             .agg(F.max_by(F.struct(F.col("super_id"), F.col("v")),
                           F.struct(F.col("ssim"),
                                    (-F.col("super_id")).alias("neg")))
                  .alias("b"))
             .select(id_col, F.col("b.super_id").alias("super_id"),
                     F.col("b.v").alias("v")))
    step2 = (step1.join(F.broadcast(cents), "super_id")
             .withColumn("sim", cosine(F.col("v"), F.col("centroid")))
             .groupBy(id_col)
             .agg(F.max_by(F.struct(F.col("list_id"), F.col("v")),
                           F.struct(F.col("sim"),
                                    (-F.col("list_id")).alias("neg")))
                  .alias("b")))
    return step2.select(id_col, F.col("b.list_id").alias("list_id"),
                        F.col("b.v").alias("v"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             nprobe: int = 3, every: int = 50,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """Top-k neighbors per query, probing only the nprobe nearest lists.
    Work per query ≈ (nprobe / nlists) of the corpus — the ANN trade-off.
    Pass centroids=kmeans_centroids(...) for trained lists; defaults to the
    deterministic (oracle-restatable) choice."""
    cents = centroids if centroids is not None else \
        deterministic_centroids(corpus, every, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    # probe selection: nprobe nearest centroids per query
    qc = (q.crossJoin(F.broadcast(cents))
          .withColumn("csim", cosine(F.col("qv"), F.col("centroid"))))
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"),
                                                F.asc("list_id"))
    probes = (qc.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "list_id"))

    # score ONLY vectors in probed lists. probes is queries×nprobe rows →
    # broadcast it so the corpus-sized `assigned` side never shuffles.
    cand = F.broadcast(probes).join(assigned, "list_id") \
        .filter(F.col("query_id") != F.col(id_col))
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"),
                    "rank", "cos"))


# ---------------------------------------------------------------------------
# index persistence — the build-once / probe-many lifecycle

def write_index(corpus: DataFrame, path: str, every: int = 50,
                id_col: str = "vec_id", vec_col: str = "embedding",
                centroids: DataFrame | None = None) -> None:
    """Materialize the IVF index: assignments partitioned BY LIST so a
    probe touches only its lists' files (Hive partition pruning — the
    storage analogue of the in-memory probe join), plus the centroid
    table beside it. Build once, serve many: the corpus is scanned at
    build time only; every later query reads nprobe/nlists of the data
    from disk."""
    cents = centroids if centroids is not None else \
        deterministic_centroids(corpus, every, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    (assigned.write.mode("overwrite").partitionBy("list_id")
     .parquet(f"{path}/lists"))
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(spark, path: str, queries: DataFrame, k: int = 10,
                     nprobe: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Top-k against a PERSISTED index: probe selection runs on the small
    centroid table, and the list filter lands on the partition column, so
    Spark's scan planner prunes unprobed list directories before reading
    a byte (verified file-level in tests/test_ivf_persist.py)."""
    cents = spark.read.parquet(f"{path}/centroids")
    lists = spark.read.parquet(f"{path}/lists")

    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    qc = (q.crossJoin(F.broadcast(cents))
          .withColumn("csim", cosine(F.col("qv"), F.col("centroid"))))
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"),
                                                F.asc("list_id"))
    probes = (qc.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "list_id"))
    probe_ids = [r.list_id for r in
                 probes.select("list_id").distinct().collect()]
    # the isin on the PARTITION column is the pruning predicate; the
    # driver-side collect is nprobe×queries ints — scalar metadata
    cand = (F.broadcast(probes)
            .join(lists.filter(F.col("list_id").isin(probe_ids)),
                  "list_id")
            .filter(F.col("query_id") != F.col(id_col)))
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"),
                    "rank", "cos"))
