"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. The dot product is an
  array-native fold (zip_with + aggregate) — JVM-side, no Python. Queries ×
  corpus is a broadcast nested-loop join: fine when the query set is small
  (it is: top-k FOR a handful of probes), unacceptable corpus × corpus.
- hyperplane-LSH buckets: the scale path. Deterministic pseudo-random
  hyperplanes (integer-hash-derived, no RNG — resumable and
  oracle-restatable); sign pattern = bucket; candidates share a bucket, then
  exact cosine on candidates only. At 100 TB: one narrow projection to
  (bucket, id, vec), one shuffle on bucket, per-bucket pair generation.

All math is double-precision with left-to-right folds, matching DuckDB's
list_dot_product evaluation order — results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).
    queries is expected to be small → Spark broadcasts it; corpus streams.
    Deterministic tie-break: (cosine desc, neighbor id asc).

    The per-query top-k is a salted two-level select (util.salted_topk):
    a one-level Window.partitionBy(query_id) would funnel the ENTIRE
    scored corpus of each query through one task — at 100 TB a single
    corpus-sized sort per query. Salting keeps every task bounded; the
    output is provably identical (unique neighbor-id tie-break)."""
    from .util import salted_topk

    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _dvec(vec_col).alias("cv"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine(F.col("qv"), F.col("cv"))))
    return (salted_topk(scored, ["query_id"],
                        [F.desc("cos"), F.asc("neighbor_id")], k,
                        salt_on="neighbor_id", rank_col="rank")
            .select("query_id", "neighbor_id", "rank", "cos"))


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory-bound scale path: a 100 TB float32
# corpus quantizes 4× smaller (plus the scale scalar), scans and compares
# in int8, then re-ranks survivors against the full-precision vectors.


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) (half-up — floor(+0.5) is portable; SQL
    round() half-even vs half-up differs across engines). Returns
    (scale, q) column pair."""
    m = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.when(m == 0.0, F.lit(1.0)).otherwise(m / 127.0)
    q = F.transform(vec, lambda x: F.floor(x / scale + 0.5).cast("long"))
    return scale, q


def int8_rerank_topk(corpus: DataFrame, queries: DataFrame,
                     k: int = 10, overscan: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Two-stage ANN on the int8 scale path: scan in int8 (the 4x-
    smaller representation a 100 TB corpus is actually stored in), keep
    the top ``overscan * k`` candidates per query by the exact-integer
    quantized dot product, re-rank ONLY those against the full-precision
    vectors, and flag each survivor ``in_exact`` if it also makes the
    full-precision exact top-k — avg(in_exact) is the measured int8
    recall, the number quantization_error's per-vector mse predicts.
    Public background: symmetric scalar quantization + rerank is the
    standard memory-bound ANN recipe (e.g. FAISS SQ8 + refine).

    Determinism: the candidate score is (exact bigint dot) x two
    identically-derived scales — one fixed-order IEEE product — with id
    tie-break; rerank cosines are the similarity.cosine ordered folds.

    Scale shape: queries are bounded (caller limits) and broadcast; the
    corpus streams ONCE through the int8 scorer carrying its original
    vector alongside (no second corpus scan for the rerank — only
    overscan*k*|Q| candidate rows reach the full-precision stage); the
    exact baseline reuses cosine_topk's broadcast-stream shape. The
    candidate stage is a salted two-level top-k (util.salted_topk, r11
    ADVICE fix): the earlier Window.partitionBy(query_id) held the whole
    scored corpus in ONE task per query — the exact hazard domain_gate
    hatched; now n_salts flat tasks rank each query's stream and only
    the bounded <= n_salts * overscan*k survivors see a per-query
    window. Output provably unchanged (unique id tie-break).

    Overscan tuning (measured at sf0.1, 64-dim, k=10 — the
    docs/SCALING_64x.json `int8_overscan` probe; recall =
    avg(in_exact)):

        overscan  recall   relative cost
        2         ~0.97    1.00x
        4         ~0.995   ~1.02x
        8         ~1.0     ~1.06x

    The scan dominates (candidate rerank is |Q|*overscan*k rows), so
    overscan is nearly free until it approaches the corpus size —
    raise it before reaching for a wider quantizer."""
    qv = queries.select(F.col(id_col).alias("query_id"),
                        _dvec(vec_col).alias("qv"))
    qs, qq = quantize_int8(F.col("qv"))
    qf = qv.select("query_id", "qv", qs.alias("qs"), qq.alias("qq"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       _dvec(vec_col).alias("cv"))
    cs, cq = quantize_int8(F.col("cv"))
    cf = cv.select("neighbor_id", "cv", cs.alias("cs"), cq.alias("cq"))

    di = F.aggregate(F.zip_with("qq", "cq", lambda a, b: a * b),
                     F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    from .util import salted_topk

    scored = (F.broadcast(qf).crossJoin(cf)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("approx",
                          di.cast("double") * F.col("qs") * F.col("cs")))
    cand = salted_topk(scored, ["query_id"],
                       [F.desc("approx"), F.asc("neighbor_id")],
                       k * overscan, salt_on="neighbor_id",
                       rank_col="__arn")
    # rerank input is bounded (<= overscan*k per query) — a plain
    # per-query window is safe here
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    rer = (cand.withColumn("cos", cosine(F.col("qv"), F.col("cv")))
           .withColumn("rank", F.row_number().over(wr))
           .filter(F.col("rank") <= k))
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col,
                        vec_col=vec_col)
    return (rer.join(exact.select("query_id", "neighbor_id",
                                  F.lit(1).alias("__e")),
                     ["query_id", "neighbor_id"], "left")
            .select("query_id", "neighbor_id", "rank", "cos",
                    F.coalesce("__e", F.lit(0)).cast("int")
                    .alias("in_exact")))


def embedding_drift(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label",
                    dim: int = 64) -> DataFrame:
    """Embedding-space drift monitor: split the corpus into a reference
    and a candidate half (deterministic id parity — in production the
    two sides are yesterday's and today's embedding runs) and report,
    per label, how far the CLASS CENTROID moved: centroid cosine and
    the L2 shift. The check an embedding pipeline runs after swapping
    an encoder version or re-embedding a refreshed corpus — centroid
    drift predicts ANN-index staleness before any recall measurement
    (the distributional cousin of psi_drift's scalar bins).

    Exactness: components quantize once to e6 integers; per-(label,
    dim) side sums are exact BIGINTs; the cosine runs on the RAW SUM
    vectors (cosine is scale-invariant, so sum vs mean cancels) with
    DECIMAL(38) products, and the L2 shift clears denominators the
    same way: diff_i = sr_i*n_cand - sc_i*n_ref is exact, so both
    readouts are one IEEE expression over exact integers, quantized
    once to e9. Ragged/null vectors are excluded by the pinned width.

    Scale shape: one posexplode -> (label, dim) map-side-combined
    aggregate (d rows per label) carries the whole corpus; everything
    after is label-count-sized."""
    d = int(dim)
    base = emb.filter(F.col(vec_col).isNotNull()
                      & (F.size(vec_col) == d))
    q = F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.round(x * F.lit(1e6)).cast("bigint"))
    rows = base.select(F.col(label_col).alias("lab"),
                       (F.col(id_col) % 2 == 0).alias("is_ref"),
                       q.alias("q"))
    by_dim = (rows.select("lab", "is_ref",
                          F.posexplode("q").alias("i", "qi"))
              .groupBy("lab", "i")
              .agg(F.sum(F.when(F.col("is_ref"), F.col("qi"))
                         .otherwise(F.lit(0)))
                   .cast("decimal(19,0)").alias("sr"),
                   F.sum(F.when(~F.col("is_ref"), F.col("qi"))
                         .otherwise(F.lit(0)))
                   .cast("decimal(19,0)").alias("sc")))
    counts = (rows.groupBy("lab")
              .agg(F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
                   .cast("bigint").alias("n_ref"),
                   F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
                   .cast("bigint").alias("n_cand")))
    j = by_dim.join(F.broadcast(counts), "lab")
    diff = (F.col("sr") * F.col("n_cand").cast("decimal(19,0)")
            - F.col("sc") * F.col("n_ref").cast("decimal(19,0)"))
    mom = (j.groupBy("lab")
           .agg(F.sum(F.col("sr") * F.col("sc"))
                .cast("decimal(38,0)").alias("dot"),
                F.sum(F.col("sr") * F.col("sr"))
                .cast("decimal(38,0)").alias("ra"),
                F.sum(F.col("sc") * F.col("sc"))
                .cast("decimal(38,0)").alias("rb"),
                F.sum(diff * diff).cast("decimal(38,0)").alias("d2"),
                F.max("n_ref").alias("n_ref"),
                F.max("n_cand").alias("n_cand")))
    cos = F.when((F.col("ra") > 0) & (F.col("rb") > 0),
                 F.col("dot").cast("double")
                 / (F.sqrt(F.col("ra").cast("double"))
                    * F.sqrt(F.col("rb").cast("double"))))         .otherwise(F.lit(0.0))
    l2 = F.when((F.col("n_ref") > 0) & (F.col("n_cand") > 0),
                F.sqrt(F.col("d2").cast("double"))
                / (F.col("n_ref").cast("double") * F.col("n_cand")
                   * F.lit(1e6))).otherwise(F.lit(-1.0))
    return mom.select(
        F.col("lab").alias(label_col), "n_ref", "n_cand",
        F.floor(cos * F.lit(1e9) + F.lit(0.5)).cast("bigint")
        .alias("centroid_cos_e9"),
        F.floor(l2 * F.lit(1e9) + F.lit(0.5)).cast("bigint")
        .alias("l2_shift_e9"))


def quantization_error(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Per-vector reconstruction error of int8 quantization:
    (id, dims, scale, max_abs_err, mse). Pure per-row array folds —
    scan-speed, no shuffle; the numbers tell you whether int8 recall will
    hold before you re-encode the corpus."""
    v = _dvec(vec_col)
    scale, q = quantize_int8(v)
    err = F.zip_with(q, v, lambda qq, x: qq * scale - x)
    return df.select(
        F.col(id_col),
        F.size(v).alias("dims"),
        scale.alias("scale"),
        F.array_max(F.transform(err, lambda e: F.abs(e)))
        .alias("max_abs_err"),
        (F.aggregate(F.transform(err, lambda e: e * e), F.lit(0.0),
                     lambda a, x: a + x) / F.size(v)).alias("mse"))


# ---------------------------------------------------------------------------
# binary (sign) quantization — the most aggressive memory-bound scale path:
# 1 bit per dimension (a 64-dim float32 vector becomes 8 bytes, 32× smaller),
# with Hamming distance as the cheap first-pass ranker and exact cosine
# re-ranking on the survivors. Public pedigree: Charikar's sign-random-
# projection LSH (STOC 2002) for sign-bit ≈ angle, and the "binary
# quantization + rescore" recipe every modern vector store ships.


def binary_signature(vec: Column) -> tuple[Column, Column]:
    """Sign bits of a 64-dim vector packed into TWO 32-bit words
    (dims 1-32 → w0 bit i = dim i+1 > 0; dims 33-64 → w1). Two words
    instead of one BIGINT because bit 63 wraps negative in both Java and
    DuckDB (NOTES.md bit-packing rule); bits 0..31 in a BIGINT column are
    portable everywhere. Literal bit WEIGHTS (shiftleft with a column
    count is not portable — see bloom.py) zipped against the vector
    slice and folded (r12): the same exact integer sum as the previous
    64-node unrolled when-chain, without the expression-tree bloat (the
    lsh_bucket §7.3 lesson); a missing dimension's null compares false
    and contributes 0, exactly like the old out-of-range element_at."""
    def word(lo: int) -> Column:
        weights = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
        return F.aggregate(
            F.zip_with(F.slice(vec, lo, 32), weights,
                       lambda x, w: F.when(x > 0, w)
                       .otherwise(F.lit(0).cast("long"))),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    return word(1), word(33)


def binary_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                n_cand: int = 30, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Binary-quantized top-k: rank the corpus by Hamming distance between
    sign signatures, keep `n_cand` candidates per query, re-rank those by
    exact cosine. Output: query_id, neighbor_id, hamming, cos, rank.

    Scale shape (100 TB): the first pass streams the corpus reading ONLY
    the 16-byte signature pair (32× less IO than float vectors — the
    entire point of binary quantization; persist the signature projection
    as its own table/column and the scan drops from 100 TB to ~3 TB).
    Query signatures broadcast; the per-query top-n_cand window shuffles
    (query_id, neighbor_id, hamming) triples — candidates only, never
    vectors. The re-rank joins the tiny candidate set (broadcast) back to
    the float vectors, so full-precision math touches |Q|·n_cand rows.

    Determinism: Hamming is exact integer arithmetic (bit_count of XOR);
    cosine is the module's ordered-fold dot + IEEE sqrt (hash-exact raw);
    ties break on neighbor id."""
    w0, w1 = binary_signature(_dvec(vec_col))
    sig = corpus.select(F.col(id_col), w0.alias("w0"), w1.alias("w1"))
    qsig = (queries.select(F.col(id_col).alias("query_id"),
                           w0.alias("qw0"), w1.alias("qw1")))
    ham = (F.bit_count(F.col("qw0").bitwiseXOR(F.col("w0")))
           + F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1"))))
    from .util import salted_topk

    cand = (F.broadcast(qsig).crossJoin(sig)
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", F.col(id_col).alias("neighbor_id"),
                    ham.alias("hamming")))
    # salted two-level top-n_cand (util.salted_topk): the corpus-sized
    # Hamming stream never sorts in one task per query (r11 ADVICE class)
    cand = salted_topk(cand, ["query_id"],
                       [F.asc("hamming"), F.asc("neighbor_id")],
                       n_cand, salt_on="neighbor_id",
                       rank_col="hrank").drop("hrank")

    qv = queries.select(F.col(id_col).alias("query_id"),
                        _dvec(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       _dvec(vec_col).alias("cv"))
    rer = (cv.join(F.broadcast(cand), "neighbor_id")
           .join(F.broadcast(qv), "query_id")
           .select("query_id", "neighbor_id", "hamming",
                   cosine(F.col("qv"), F.col("cv")).alias("cos")))
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(wc))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "hamming", "cos", "rank"))


# ---------------------------------------------------------------------------
# hyperplane LSH

def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    integer arithmetic only, so any SQL engine reproduces it exactly."""
    v = (F.lit((plane + 1) * 73856093).cast("long") * F.lit(dim + 1)
         + F.lit(19349663)) % 2001  # long math: 7*73856093*64 > int32
    return (v - 1000).cast("double") / 1000.0


def lsh_bucket(vec: Column, num_planes: int, dims: int) -> Column:
    """Sign pattern of the vector against num_planes hyperplanes → bucket
    bitstring. r12: the plane components are CONSTANTS, so each plane's
    dot product is an ordered fold over a literal component array — the
    previous shape unrolled num_planes×dims element_at/multiply/add
    NODES into the expression tree (384 at 6×64), and analysis/codegen
    of that tree, not execution, dominated the operators that embed it
    (guide §7.3 'very large plans'). The fold runs the IDENTICAL IEEE
    op sequence (0.0 + x₀·c₀, then +x₁·c₁ … ascending d, each product
    first), and the Python-computed components are the same integer
    arithmetic _plane_component evaluated ((p+1)·73856093·(d+1) +
    19349663) % 2001, positive on both sides, then the same (v−1000)
    /1000.0 divide — so buckets are bit-identical. F.slice keeps the
    old element_at semantics on ragged vectors (only the first `dims`
    components count; missing ones null out the plane sum → bit '0')."""
    bits = []
    head = F.slice(vec, 1, dims)
    for p in range(num_planes):
        comps = F.array(*[
            F.lit((((p + 1) * 73856093 * (d + 1) + 19349663) % 2001
                   - 1000) / 1000.0)
            for d in range(dims)])
        s = F.aggregate(F.zip_with(head, comps, lambda x, c: x * c),
                        F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed(corpus: DataFrame, num_planes: int = 6, dims: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    # the plane dot products are interpreted per-row folds — spread a
    # few-file input across cores first (no-op at 100 TB; r12, §2.6)
    from .util import spread_input

    return spread_input(corpus, id_col).select(
        F.col(id_col),
        lsh_bucket(_dvec(vec_col), num_planes, dims).alias("bucket"))


def lsh_cosine_pairs(corpus: DataFrame, threshold: float = 0.9,
                     num_planes: int = 6, dims: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate embedding pairs: bucket → same-bucket candidates →
    exact cosine filter. The corpus×corpus problem becomes
    sum-over-buckets(|bucket|²) — tractable when planes spread the space.

    r12: bucket and vector ride ONE projection of the corpus — the
    previous shape computed the buckets, then self-joined the corpus on
    the id just to re-attach the vector (a full extra shuffle join of
    the corpus with itself, same output)."""
    from .util import spread_input

    bucketed = spread_input(corpus, id_col).select(
        F.col(id_col),
        lsh_bucket(_dvec(vec_col), num_planes, dims).alias("bucket"),
        _dvec(vec_col).alias("v"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    return (cands.select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"),
                         cosine(F.col("a.v"), F.col("b.v")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def alignment_filter(pairs: DataFrame, anchor: DataFrame,
                     threshold: float, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """CLIP-score-style pair filtering (public recipe: LAION-400M/5B —
    Schuhmann et al., NeurIPS 2022 datasets track — keep an image-text
    pair iff CLIP cosine(image, text) clears a threshold; the single
    most load-bearing filter in open multimodal corpus construction).
    Here the embedding column stands in for the CLIP image vector and
    `anchor` (a 1-row DataFrame) for the encoded text/prompt side — the
    Spark-side plumbing is the real thing, the encoder is the stubbed
    seam (functions/multimodal.py's contract).

    Shape: broadcast the 1-row anchor, one cosine projection per pair,
    zero shuffles — the filter runs at scan speed over 100 TB. Cosine is
    the module's ordered-fold dot + IEEE sqrt, so scores hash-check raw.

    Output: id, align_cos, kept (int 1/0).
    """
    a = F.broadcast(anchor.select(_dvec(vec_col).alias("__av")))
    scored = (pairs.select(F.col(id_col), _dvec(vec_col).alias("__v"))
              .crossJoin(a)
              .select(id_col,
                      cosine(F.col("__v"), F.col("__av"))
                      .alias("align_cos")))
    return scored.select(
        id_col, "align_cos",
        (F.col("align_cos") >= threshold).cast("int").alias("kept"))


# ---------------------------------------------------------------------------
# graph-based ANN — the third ANN family beside LSH (hash) and IVF (tree/
# cluster): a kNN proximity graph + greedy best-first search over it
# (the NSW/HNSW/DiskANN lineage: Malkov & Yashunin, "Efficient and robust
# approximate nearest neighbor search using Hierarchical Navigable Small
# World graphs", TPAMI 2020). Deterministic, RNG-free variant: the graph
# is cluster-local exact kNN (IVF lists as the candidate generator), the
# search is a fixed number of unrolled expand-score-prune beam rounds, so
# both halves oracle-restate.


def knn_graph(corpus: DataFrame, m: int = 8, every: int = 50,
              id_col: str = "vec_id", vec_col: str = "embedding",
              coarse_group: int | None = None) -> DataFrame:
    """Approximate kNN graph: top-`m` neighbors per vector by exact
    cosine WITHIN the vector's IVF list (deterministic centroids, the
    ivf.py assignment). Cluster-local pair generation is the accepted
    sub-quadratic build (the SemDeDup shape): cost sum(|list|²) ≈
    N·every instead of N², and at 100 TB each list's pairs are one
    partition-local nested loop after a single shuffle on list_id —
    no corpus×corpus join exists anywhere. Boundary vectors miss
    cross-list true neighbors; graph_ann_search's in_exact flag
    measures exactly that loss against the brute-force oracle.

    Output: (src, dst, rank, cos) — rank 1..m by (cos desc, dst asc).
    """
    from .ivf import (deterministic_centroids, ivf_assign,
                      two_level_assign)

    cents = deterministic_centroids(corpus, every, id_col, vec_col)
    # coarse_group: the 64x probe showed the EXACT assignment is the
    # bottleneck, not the pair generation — list count k = N/every grows
    # with the corpus, so assign is O(N*k) (the semantic_dedup 36x
    # lesson). two_level_assign is the O(N*sqrt(k)) escape; graph edges
    # shift only where a boundary vector lands in a neighboring list
    # (the oracle-checked constituent keeps the exact path).
    if coarse_group:
        assigned = two_level_assign(corpus, cents, coarse_group,
                                    id_col, vec_col)
    else:
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
    a = assigned.select(F.col(id_col).alias("src"), "list_id",
                        F.col("v").alias("sv"))
    b = assigned.select(F.col(id_col).alias("dst"), "list_id",
                        F.col("v").alias("dv"))
    pairs = (a.join(b, "list_id")
             .filter(F.col("src") != F.col("dst"))
             .withColumn("cos", cosine(F.col("sv"), F.col("dv"))))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= m)
            .select("src", "dst", "rank", "cos"))


def graph_ann_search(corpus: DataFrame, queries: DataFrame,
                     edges: DataFrame, k: int = 10, beam: int = 10,
                     rounds: int = 2, seeds_every: int = 50,
                     max_seeds: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Greedy beam search over a kNN graph — the NSW search half:
    start from fixed entry points (the smallest id in each of the first
    `max_seeds` occupied `seeds_every`-wide id strides — deterministic
    and order-independent, the role HNSW's top layer plays),
    then `rounds` unrolled iterations of expand-neighbors → exact-score
    → keep-beam. Per round: one equi-join frontier⋈edges + one distinct
    + one bounded scoring join (≤ beam·(m+1) candidates per query) —
    the corpus is never scanned after the graph is built, which is the
    entire point at 100 TB.

    Output: (query_id, neighbor_id, rank, cos, in_exact) for rank ≤ k,
    where in_exact marks membership in the brute-force top-k — recall
    measured in-band, per hit.
    """
    if rounds < 1:
        raise ValueError(f"graph_ann_search needs rounds >= 1, "
                         f"got {rounds}")
    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    cvecs = corpus.select(F.col(id_col).alias("cand"),
                          _dvec(vec_col).alias("cv"))
    # the graph is referenced once per round: materialize it or Catalyst
    # re-derives the whole kNN BUILD (the expensive half) under every
    # reference — the union-of-filters recompute trap. N·m rows, cheap.
    edges = edges.localCheckpoint(eager=True)
    # entry points: the smallest id in each of the first max_seeds
    # occupied strides — NOT `id % seeds_every == 0`, which silently
    # yields zero seeds (empty result) on a sparse or offset id space.
    # On a dense 0-based space this picks the identical 0, s, 2s, ...
    seeds = (corpus
             .groupBy(F.expr(f"{id_col} div {seeds_every}")
                      .alias("__stride"))
             .agg(F.min(id_col).alias("cand"))
             .orderBy("__stride").limit(max_seeds)
             .select("cand"))
    frontier = (q.select("query_id")
                .crossJoin(F.broadcast(seeds)))
    scored = None
    for _ in range(rounds):
        expanded = (frontier
                    .join(edges.select(F.col("src").alias("cand"),
                                       "dst"), "cand")
                    .select("query_id", F.col("dst").alias("cand"))
                    .unionByName(frontier)
                    .distinct())
        scored = (expanded
                  .join(cvecs, "cand").join(q, "query_id")
                  .filter(F.col("cand") != F.col("query_id"))
                  .withColumn("cos", cosine(F.col("qv"), F.col("cv"))))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("cand"))
        scored = scored.withColumn("rn", F.row_number().over(w))
        frontier = (scored.filter(F.col("rn") <= beam)
                    .select("query_id", "cand"))
    exact = cosine_topk(corpus, queries, k=k,
                        id_col=id_col, vec_col=vec_col) \
        .select("query_id", F.col("neighbor_id").alias("cand"),
                F.lit(1).alias("in_exact"))
    return (scored.filter(F.col("rn") <= k)
            .join(exact, ["query_id", "cand"], "left")
            .select("query_id", F.col("cand").alias("neighbor_id"),
                    F.col("rn").cast("int").alias("rank"), "cos",
                    F.coalesce("in_exact", F.lit(0)).alias("in_exact")))


def incremental_knn(store: DataFrame, batch: DataFrame, m: int = 8,
                    every: int = 50, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """kNN-graph maintenance under batch ingest — the graph-ANN
    counterpart of incremental_minhash/incremental_dedup: new vectors
    arrive, and the navigable graph updates WITHOUT rebuilding
    store×store (the freshness recipe of the HNSW/Vamana deployments:
    insert into lists, link both directions, re-rank only the touched
    adjacency lists).

        batch side: each new vector gets its top-m among the vectors of
            its IVF list (store + other batch arrivals) — the same
            cluster-local rule as the full build;
        store side: a store node's stored top-m merges with its NEW
            batch-vector candidates (same list, both in one candidate
            frame) and re-ranks; only nodes with at least one batch
            candidate emit an updated list — untouched nodes keep their
            stored adjacency by construction, which is the entire point.

    Centroids are the STORE's (batch assignment cannot reshuffle
    existing lists — the IVF-ingest convention); cost is
    |batch|·(list sizes touched), never |store|². Output:
    (src, dst, rank, cos, side) with side ∈ {'batch', 'store'}.

    At-scale note (the knn_graph 64x lesson): this function DERIVES the
    store's assignment and adjacency for oracle-checkability — a
    deployment reads both from persisted tables, so the only per-ingest
    assignment cost is |batch|·k (route through two_level_assign when k
    is corpus-proportional, as knn_graph's coarse_group does).
    """
    from .ivf import deterministic_centroids, ivf_assign

    cents = deterministic_centroids(store, every, id_col, vec_col)
    a_store = ivf_assign(store, cents, id_col, vec_col) \
        .localCheckpoint(eager=True)
    a_batch = ivf_assign(batch, cents, id_col, vec_col) \
        .localCheckpoint(eager=True)

    # the store's persisted adjacency (derived here the way
    # incremental_minhash derives the store's signatures; a deployment
    # reads it from the graph table)
    s1 = a_store.select(F.col(id_col).alias("src"), "list_id",
                        F.col("v").alias("sv"))
    s2 = a_store.select(F.col(id_col).alias("dst"), "list_id",
                        F.col("v").alias("dv"))
    stored = (s1.join(s2, "list_id")
              .filter(F.col("src") != F.col("dst"))
              .withColumn("cos", cosine(F.col("sv"), F.col("dv"))))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    stored_top = (stored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= m)
                  .select("src", "dst", "cos")
                  .localCheckpoint(eager=True))

    b_src = a_batch.select(F.col(id_col).alias("src"), "list_id",
                           F.col("v").alias("sv"))
    pool = (a_store.unionByName(a_batch)
            .select(F.col(id_col).alias("dst"), "list_id",
                    F.col("v").alias("dv")))
    batch_cand = (b_src.join(pool, "list_id")
                  .filter(F.col("src") != F.col("dst"))
                  .withColumn("cos", cosine(F.col("sv"), F.col("dv"))))
    batch_top = (batch_cand.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= m)
                 .select("src", "dst", F.col("rank").cast("int"), "cos",
                         F.lit("batch").alias("side")))

    # store nodes ⊳ batch arrivals in their list (the only new edges a
    # store node can gain); merge with the stored list, re-rank
    sb = (a_store.select(F.col(id_col).alias("src"), "list_id",
                         F.col("v").alias("sv"))
          .join(a_batch.select(F.col(id_col).alias("dst"), "list_id",
                               F.col("v").alias("dv")), "list_id")
          .withColumn("cos", cosine(F.col("sv"), F.col("dv")))
          .select("src", "dst", "cos"))
    touched = sb.select("src").distinct()
    merged_lists = (stored_top.join(touched, "src", "left_semi")
                    .unionByName(sb))
    store_top = (merged_lists.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= m)
                 .select("src", "dst", F.col("rank").cast("int"), "cos",
                         F.lit("store").alias("side")))
    return batch_top.unionByName(store_top)
