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


def deterministic_centroids(corpus: DataFrame, every: int = 50,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Every `every`-th vector (by id) becomes a centroid. Deterministic,
    trivially reproducible in SQL."""
    return (corpus.filter(F.col(id_col) % every == 0)
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
    c = corpus.select(F.col(id_col), _dvec(vec_col).alias("v"))
    scored = (c.crossJoin(F.broadcast(centroids))
              .withColumn("sim", cosine(F.col("v"), F.col("centroid"))))
    best = scored.groupBy(id_col).agg(
        F.max_by(F.struct(F.col("list_id"), F.col("v")),
                 F.struct(F.col("sim"),
                          (-F.col("list_id")).alias("neg"))).alias("b"))
    return best.select(id_col, F.col("b.list_id").alias("list_id"),
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
