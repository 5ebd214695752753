"""Product quantization (PQ) — the vector-compression half of IVF-PQ,
the standard memory layout for billion-scale ANN (Jégou, Douze, Schmid:
"Product quantization for nearest neighbor search", TPAMI 2011; the
public FAISS architecture).

A 64-dim float vector (256 B) compresses to M sub-codes (M bytes at
ks <= 256): split dims into M contiguous subspaces, quantize each
subvector to its nearest codebook entry. Search then scores candidates
against lookup tables of code-to-query distances instead of raw floats —
at 100 TB the corpus fits in RAM as codes when it never could as floats.

Spark-first shape:
    codebooks: M * ks subvectors — picked deterministically from the
               corpus (every-Nth, like ivf.deterministic_centroids) so
               the whole operator restates in the DuckDB oracle; swap in
               per-subspace k-means for production recall.
    assign:    corpus x broadcast(codebooks) -> per (vector, subspace)
               argmin L2 via min_by — map-side combined, so the
               crossJoin's M*ks rows per vector reduce to M BEFORE the
               shuffle (same discipline as ivf.ivf_assign).
    pack:      the M codes Horner-fold into ONE BIGINT
               (acc*ks + code_m, m ascending) — integer-exact,
               hash-comparable, and the natural storage form.

Determinism: L2 distances are left-to-right double folds (bit-equal in
DuckDB, see similarity.py header); argmin ties break on code index; the
reconstruction error folds subspace distances in fixed subspace order —
never an unordered SUM over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dvec, cosine


def _l2(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def pq_codebooks(corpus: DataFrame, m_sub: int = 8, ks: int = 16,
                 every: int = 31, sub_dim: int = 8,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(m, code, subvec): entry `code` of subspace `m` is that subspace's
    slice of the corpus vector with id == code * every — deterministic
    and oracle-restatable."""
    # the value predicate bounds this to ks rows; the no-op limit makes
    # the bound PLAN-VISIBLE so the broadcast below it passes plan lint
    seeds = (corpus.filter((F.col(id_col) % every == 0)
                           & (F.col(id_col) < ks * every))
             .limit(ks)
             .select((F.col(id_col) / every).cast("long").alias("code"),
                     _dvec(vec_col).alias("v")))
    subs = None
    for m in range(m_sub):
        part = seeds.select(
            F.lit(m).cast("int").alias("m"), "code",
            F.slice(F.col("v"), m * sub_dim + 1, sub_dim).alias("subvec"))
        subs = part if subs is None else subs.unionByName(part)
    return subs


def pq_encode(corpus: DataFrame, codebooks: DataFrame, ks: int = 16,
              sub_dim: int = 8, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, packed_code BIGINT, recon_err DOUBLE). packed_code is the
    Horner fold of per-subspace argmin codes; recon_err the m-ordered
    fold of the per-subspace squared errors."""
    c = corpus.select(F.col(id_col), _dvec(vec_col).alias("v"))
    sub_of_v = F.slice(F.col("v"), F.col("m") * sub_dim + 1, sub_dim)
    scored = (c.crossJoin(F.broadcast(codebooks))
              .withColumn("dist", _l2(sub_of_v, F.col("subvec"))))
    best = (scored.groupBy(id_col, "m")
            .agg(F.min_by(F.struct(F.col("code"), F.col("dist")),
                          F.struct(F.col("dist"), F.col("code")))
                 .alias("b"))
            .select(id_col, "m", F.col("b.code").alias("code"),
                    F.col("b.dist").alias("dist")))
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("m"), F.col("code"),
                                F.col("dist"))))
    packed = F.aggregate(
        F.transform(ordered, lambda s: s["code"]),
        F.lit(0).cast("bigint"), lambda acc, x: acc * ks + x)
    err = F.aggregate(
        F.transform(ordered, lambda s: s["dist"]),
        F.lit(0.0), lambda acc, x: acc + x)
    return (best.groupBy(id_col)
            .agg(packed.alias("packed_code"), err.alias("recon_err")))


def pq_adc_topk(codes: DataFrame, queries: DataFrame,
                codebooks: DataFrame, k: int = 10, m_sub: int = 8,
                ks: int = 16, sub_dim: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric distance computation (ADC) top-k — the SEARCH half of
    IVF-PQ (Jégou et al. TPAMI 2011, §IV): each query builds a lookup
    table of L2 distances from its M subvectors to every codebook entry
    (M*ks doubles per query — broadcast-sized), and every candidate is
    scored by summing M table lookups of its packed codes. The corpus
    side touches ONLY integer codes — the float vectors never load,
    which is the entire point of PQ at 100 TB: the exchange carries
    (id, m:int, code:int) triples and the broadcast LUT.

    Determinism: the LUT distances are the module's left-to-right L2
    folds; each candidate's ADC distance folds its M lookups in subspace
    order; ranking ties break on candidate id. Exact arithmetic
    end-to-end (no sqrt, no ln) — hash-comparable unrounded.

    Output: (query_id, cand_id, rank, adc_dist).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    sub_of_q = F.slice(F.col("qv"), F.col("m") * sub_dim + 1, sub_dim)
    lut = (q.crossJoin(F.broadcast(codebooks))
           .select("query_id", "m", "code",
                   _l2(sub_of_q, F.col("subvec")).alias("d")))
    # ONE explode over the code table, codes unpacked with shift/mask
    # arithmetic on the m column — a per-subspace union would make
    # Catalyst re-derive the (crossJoin + groupBy) `codes` subplan once
    # per subspace (Catalyst reuses exchanges, not arbitrary subplans;
    # the pagerank checkpoint lesson). Requires ks to be a power of two,
    # which the packed-BIGINT layout wants anyway.
    bits = ks.bit_length() - 1
    if (1 << bits) != ks:
        raise ValueError(f"ks={ks} must be a power of two for packed "
                         "shift/mask decoding")
    dec = (codes.select(
        F.col(id_col).alias("cand_id"), "packed_code",
        F.explode(F.sequence(F.lit(0), F.lit(m_sub - 1))).alias("m"))
        .select("cand_id", "m",
                F.expr(f"shiftright(packed_code, {bits} * "
                       f"({m_sub - 1} - m)) & {ks - 1}").cast("long")
                .alias("code")))
    scored = (dec.join(F.broadcast(lut), ["m", "code"])
              .groupBy("query_id", "cand_id")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(F.struct("m", "d"))),
                  F.lit(0.0), lambda acc, s: acc + s["d"])
                  .alias("adc_dist")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "rank", "adc_dist"))


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                nprobe: int = 3, every: int = 50, m_sub: int = 8,
                ks: int = 16, sub_dim: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """The COMPOSED IVF-PQ search — the production FAISS IndexIVFPQ
    recipe (Jégou et al. TPAMI 2011 §V): the coarse quantizer restricts
    candidates to the query's nprobe nearest lists (the IVF half), and
    asymmetric distance over PQ codes scores only those candidates (the
    PQ half). Work per query ≈ (nprobe/nlists) of the corpus, touched as
    INTEGER CODES — the float corpus exists only long enough to encode.

    Plan shape at 100 TB: centroids + the per-query LUT broadcast; the
    coded corpus shuffles once to its list assignment and is then
    probe-joined by list_id (the persisted-index variant reads
    list-partitioned code files and prunes at the directory level, see
    ivf.write_index); ranking is a per-query window over ~nprobe list
    volumes.

    Output: (query_id, cand_id, rank, adc_dist) — rank ascending by
    reconstructed distance, ties on cand_id.
    """
    from .ivf import deterministic_centroids, ivf_assign

    cents = deterministic_centroids(corpus, every, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col) \
        .select(id_col, "list_id")
    cb = pq_codebooks(corpus, m_sub, ks, every=31, sub_dim=sub_dim,
                      id_col=id_col, vec_col=vec_col)
    codes = pq_encode(corpus, cb, ks, sub_dim, id_col, vec_col) \
        .select(id_col, "packed_code")
    coded = assigned.join(codes, id_col)

    q = queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
    from pyspark.sql.window import Window
    qc = (q.crossJoin(F.broadcast(cents))
          .withColumn("csim", cosine(F.col("qv"), F.col("centroid"))))
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"),
                                                F.asc("list_id"))
    probes = (qc.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "list_id"))

    sub_of_q = F.slice(F.col("qv"), F.col("m") * sub_dim + 1, sub_dim)
    lut = (q.crossJoin(F.broadcast(cb))
           .select("query_id", "m", "code",
                   _l2(sub_of_q, F.col("subvec")).alias("d")))

    bits = ks.bit_length() - 1
    if (1 << bits) != ks:
        raise ValueError(f"ks={ks} must be a power of two")
    cand = (F.broadcast(probes.select("query_id", "list_id"))
            .join(coded, "list_id")
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", F.col(id_col).alias("cand_id"),
                    "packed_code"))
    dec = (cand.select(
        "query_id", "cand_id", "packed_code",
        F.explode(F.sequence(F.lit(0), F.lit(m_sub - 1))).alias("m"))
        .select("query_id", "cand_id", "m",
                F.expr(f"shiftright(packed_code, {bits} * "
                       f"({m_sub - 1} - m)) & {ks - 1}").cast("long")
                .alias("code")))
    scored = (dec.join(F.broadcast(lut), ["query_id", "m", "code"])
              .groupBy("query_id", "cand_id")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(F.struct("m", "d"))),
                  F.lit(0.0), lambda acc, s: acc + s["d"])
                  .alias("adc_dist")))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "rank", "adc_dist"))
