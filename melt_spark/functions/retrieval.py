"""BM25 lexical retrieval — keyword top-k over the corpus, the lexical
counterpart of the vector paths in similarity.py/ivf.py (a real retrieval
stack serves both and fuses results).

Okapi BM25 with the standard +1 idf smoothing:

    idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape: the corpus is scanned ONCE for (doc, term-in-query) counts —
the isin(query_terms) filter lands right after the explode, so only
query-term postings survive (tiny next to the corpus). df/idf per term is a
few rows (broadcast); doc lengths ride the same scan. At 100 TB with large
postings lists, drop the tf broadcast hint and let AQE pick the join.

Cross-engine float discipline (the repo's hash rules): the per-doc sum folds
CONTRIBUTIONS SORTED BY TERM from a 0.0 seed (Spark aggregate ==
DuckDB list_reduce), avgdl divides an exact integer sum, and every float
expression is written with the same literal shape on both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .util import one_partition


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 15,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents for a bag-of-terms query. Output: doc_id, score,
    rank (deterministic tie-break: score desc, doc_id asc)."""
    from pyspark.sql.window import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")

    toks = F.split(F.col(text_col), " ")
    # scan 1 (column-pruned to text): corpus-wide doc count + avg length.
    # Needs docs with NO query terms too, so it can't come from the
    # postings side.
    stats = (docs.select(F.size(toks).alias("dl"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.avg("dl").alias("avgdl")))  # exact int sum / count

    # scan 2: ONE pass builds postings WITH the doc length folded in (dl is
    # functionally dependent on the id, so adding it to the grouping is
    # free). The isin() filter sits directly on the explode — only
    # query-term tokens survive the scan.
    tf = (docs.select(F.col(id_col), F.size(toks).alias("dl"),
                      F.explode(toks).alias("tok"))
          .filter(F.col("tok").isin(*list(query_terms)))
          .groupBy(id_col, "dl", "tok").agg(F.count(F.lit(1)).alias("tf")))
    # df per term as a window over the (tiny, post-filter) postings — a
    # groupBy would re-run the whole corpus scan lineage instead
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("tok"))

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf")
             + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    contrib = (idf * (F.col("tf") * (k1 + 1) / denom)).alias("c")

    scored = (tf.withColumn("df", dfreq)
              .crossJoin(F.broadcast(stats))
              .select(F.col(id_col), F.col("tok"), contrib))
    per_doc = scored.groupBy(id_col).agg(
        F.aggregate(
            F.transform(F.array_sort(F.collect_list(F.struct("tok", "c"))),
                        lambda s: s["c"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("score"))
    top = per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    # rank over the k survivors only (the global sort already happened)
    from pyspark.sql.window import Window
    w = Window.partitionBy(one_partition(F.col("score")))\
        .orderBy(F.desc("score"), F.asc(id_col))
    # ln is NOT IEEE-correctly-rounded (JVM Math.log vs libm differ by
    # 1 ulp on some inputs — observed), so the raw double can't be
    # hash-compared across engines; 9 decimals is ~7 orders above ulp
    # noise and far below real score gaps
    return top.withColumn("rank", F.row_number().over(w)) \
              .select(id_col, F.round("score", 9).alias("score"), "rank")


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame,
             id_a: str, id_b: str, k: int = 10, c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (the standard hybrid-
    retrieval combiner — vector ANN + BM25 each vote by rank, score scales
    cancel out):

        fused(d) = 1/(c + rank_a(d)) + 1/(c + rank_b(d))

    with an absent list contributing 0. Both inputs must carry a `rank`
    column. Rank-only arithmetic: division is IEEE-correctly-rounded and
    the two-addend sum has a fixed order, so the double is hash-exact
    cross-engine (unlike ln — see bm25_topk). Inputs are top-k lists
    (tiny); everything here is driver-free but trivially small."""
    a = ranked_a.select(F.col(id_a).alias("item"),
                        F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_b).alias("item"),
                        F.col("rank").alias("rank_b"))
    fused = (F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_a")), F.lit(0.0))
             + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_b")),
                          F.lit(0.0)))
    j = a.join(b, "item", "full_outer").select("item", fused.alias("fused"))
    top = j.orderBy(F.desc("fused"), F.asc("item")).limit(k)
    from pyspark.sql.window import Window
    w = Window.partitionBy(one_partition(F.col("fused")))\
        .orderBy(F.desc("fused"), F.asc("item"))
    return top.withColumn("rank", F.row_number().over(w))


def phrase_match(docs: DataFrame, phrase: Sequence[str],
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Exact-phrase retrieval: documents containing the tokens of `phrase`
    consecutively, with match count and first position.

    Implemented as a PURE PROJECTION over the scan — per document, the
    match-start positions are the i with toks[i..i+m-1] == phrase,
    computed by an array filter over a bounded integer sequence. Zero
    shuffles, zero joins, whole-stage codegen: at 100 TB the cost is the
    corpus scan itself, which any phrase query must pay without a
    positional index. (The index-backed variant — explode (token, pos),
    semi-join m posting lists on (doc, pos+offset) — trades that scan for
    index maintenance; the projection form is the right default engine
    primitive and the one the oracle can restate verbatim.)

    Spark gotcha (NOTES.md): sequence(1, n) DESCENDS for n < 1, so the
    candidate range is gated behind a length check; DuckDB's
    generate_series is empty there naturally.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    m = len(phrase)
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)

    def is_match(i):
        cond = None
        for off, w in enumerate(phrase):
            c = F.element_at(toks, i + off) == F.lit(w)
            cond = c if cond is None else cond & c
        return cond

    starts = F.when(
        n >= m, F.filter(F.sequence(F.lit(1), n - m + 1), is_match)
    ).otherwise(F.array().cast("array<int>"))
    out = docs.select(F.col(id_col),
                      F.size(starts).alias("n_matches"),
                      F.coalesce(F.element_at(starts, 1), F.lit(-1))
                      .cast("int").alias("first_pos"))
    return out.filter(F.col("n_matches") > 0)


def _varint_bytes(gap):
    """Length-in-bytes of the LEB128 varint for `gap`: ceil(bits/7),
    where bits comes from the BINARY STRING length — log2() is
    transcendental and 1-ulp-hazardous at power-of-two boundaries, the
    string length is exact integer arithmetic on both engines (Spark
    conv(g,10,2) == DuckDB to_base(g,2))."""
    bits = F.length(F.conv(gap.cast("bigint").cast("string"), 10, 2))
    return ((bits + F.lit(6)) - ((bits + F.lit(6)) % 7)) / 7


def postings_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Positional inverted-index layout costing: per term, the size of a
    delta+varint-encoded postings list (doc-id gaps + in-doc position
    gaps) next to the uncompressed 8-byte-per-entry baseline — the
    d-gap/LEB128 layout every IR engine stores (Manning/Raghavan/Schütze,
    "Introduction to Information Retrieval", ch. 5).

    Scale shape: one corpus explode, one (term, doc) aggregation whose
    per-group state is a single document's position list (bounded by doc
    length), then a per-term pass where DOC gaps come from a lag() window
    — never a collect of a term's full posting list, so a stopword's
    millions of docs stream through the window instead of materializing
    in one task's memory. Output is vocabulary-sized.

    Determinism: everything is integer arithmetic; the compression ratio
    is one IEEE divide of exact integers.
    """
    from pyspark.sql.window import Window

    df = docs
    toks = F.split(F.col(text_col), " ")
    exploded = (df.select(F.col(id_col).alias("doc"),
                          F.posexplode(toks).alias("pos0", "term"))
                .select("doc", "term", (F.col("pos0") + 1).alias("pos")))
    # per (term, doc): tf and the varint cost of position deltas (first
    # position absolute, then gaps) via an ordered fold
    per_td = (exploded.groupBy("term", "doc")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.sort_array(F.collect_list("pos")).alias("ps")))
    pos_bytes = F.aggregate(
        F.col("ps"),
        F.struct(F.lit(0).cast("bigint").alias("prev"),
                 F.lit(0).cast("bigint").alias("b")),
        lambda acc, p: F.struct(
            p.cast("bigint").alias("prev"),
            (acc["b"] + _varint_bytes(p - acc["prev"]).cast("bigint"))
            .alias("b")),
        lambda acc: acc["b"])
    td = per_td.select("term", "doc", "tf", pos_bytes.alias("pos_bytes"))
    # per term: doc-id gaps via lag() — no posting-list materialization
    w = Window.partitionBy("term").orderBy("doc")
    gap = F.col("doc") - F.coalesce(F.lag("doc").over(w), F.lit(0))
    td2 = td.select("term", "tf", "pos_bytes",
                    _varint_bytes(gap).cast("bigint").alias("doc_bytes"))
    out = (td2.groupBy("term")
           .agg(F.count(F.lit(1)).alias("df"),
                F.sum("tf").alias("total_tf"),
                F.sum("doc_bytes").alias("doc_gap_bytes"),
                F.sum("pos_bytes").alias("pos_gap_bytes")))
    raw = (F.col("df") + F.col("total_tf")) * 8
    return out.select(
        "term", "df", "total_tf", "doc_gap_bytes", "pos_gap_bytes",
        (raw.cast("double")
         / (F.col("doc_gap_bytes") + F.col("pos_gap_bytes")).cast("double"))
        .alias("compression"))


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_cand: int = 20, lam: float = 0.7, mu: float = 0.3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998) — the standard re-ranker that trades raw
    relevance against redundancy so the result list isn't k near-copies
    of the same document (the RAG-context / search-results diversifier):

        pick_r = argmax_{d ∉ S} [ lam·sim(q,d) − mu·max_{s ∈ S} sim(d,s) ]

    `lam`/`mu` are INDEPENDENT weights (not lam/1−lam): 1−0.7 is
    0.30000000000000004 in IEEE, so deriving mu would bake a different
    literal into the two engines' plans.

    Scale shape (100 TB): the expensive part is the candidate generation
    (delegate to any ANN path in this package at real scale; here exact
    cosine_topk) — everything after runs on |Q|·n_cand rows: the pairwise
    sim table is n_cand² PER QUERY (bounded, never corpus²), and the k
    greedy rounds are statically unrolled joins over those tiny tables,
    localCheckpointed so Catalyst doesn't re-derive the corpus scan once
    per round (the pagerank lesson, functions/graph.py).

    Determinism: relevance and pairwise sims are the ordered-fold cosine
    (hash-exact raw); each round's score is two exact-rounded IEEE ops;
    ties break on candidate id. Output: query_id, neighbor_id, pick
    (1-based selection order), score.
    """
    from pyspark.sql.window import Window

    from .similarity import _dvec, cosine, cosine_topk

    cand = (cosine_topk(corpus, queries, k=n_cand, id_col=id_col,
                        vec_col=vec_col)
            .select("query_id", F.col("neighbor_id").alias("id"),
                    F.col("cos").alias("rel")))
    vecs = corpus.select(F.col(id_col).alias("id"),
                        _dvec(vec_col).alias("v"))
    cv = cand.join(vecs, "id").select("query_id", "id", "v")
    a = cv.select("query_id", F.col("id").alias("a"),
                  F.col("v").alias("va"))
    b = cv.select("query_id", F.col("id").alias("b"),
                  F.col("v").alias("vb"))
    rel = cand.localCheckpoint(eager=False)
    pw = (a.join(b, "query_id").filter(F.col("a") != F.col("b"))
          .select("query_id", "a", "b",
                  cosine(F.col("va"), F.col("vb")).alias("s"))
          .localCheckpoint(eager=False))

    w = Window.partitionBy("query_id")
    sel1 = (rel.withColumn(
        "rn", F.row_number().over(w.orderBy(F.desc("rel"), F.asc("id"))))
        .filter(F.col("rn") == 1)
        .select("query_id", "id", F.lit(1).alias("pick"),
                (F.lit(lam) * F.col("rel")).alias("score")))
    picks = [sel1]
    cum = sel1.select("query_id", "id")
    for r in range(2, k + 1):
        mx = (pw.join(cum.select("query_id", F.col("id").alias("b")),
                      ["query_id", "b"])
              .groupBy("query_id", F.col("a").alias("id"))
              .agg(F.max("s").alias("mx")))
        scored = (rel.join(mx, ["query_id", "id"])
                  .join(cum, ["query_id", "id"], "left_anti")
                  .select("query_id", "id",
                          (F.lit(lam) * F.col("rel")
                           - F.lit(mu) * F.col("mx")).alias("score")))
        sel_r = (scored.withColumn(
            "rn", F.row_number().over(
                w.orderBy(F.desc("score"), F.asc("id"))))
            .filter(F.col("rn") == 1)
            .select("query_id", "id", F.lit(r).alias("pick"), "score"))
        picks.append(sel_r)
        cum = cum.unionByName(sel_r.select("query_id", "id"))

    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select("query_id", F.col("id").alias("neighbor_id"),
                      "pick", "score")


def tfidf_topk_terms(docs: DataFrame, k: int = 3,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document top-k keyword extraction by TF-IDF — the classic
    salience ranking (Salton & Buckley 1988; Manning/Raghavan/Schütze
    ch. 6) that labels every document with its most distinctive terms,
    the metadata a corpus browser / topic sampler keys on.

    score(t, d) = tf(t, d) · ln(N / df(t))

    Integer-exact cross-engine: ln is not correctly rounded (see
    bm25_topk), so the idf is scaled to an INTEGER once —
    idf_e9 = round(ln(N/df) · 1e9) — and every downstream comparison
    (score = tf · idf_e9, the per-doc ranking) is exact BIGINT
    arithmetic. 1 ulp of ln noise is ~1e-7 after the 1e9 scale, far
    below the 0.5 rounding margin except on measure-zero boundaries.

    Scale shape (100 TB): one corpus explode feeds the (doc, term, tf)
    aggregation — shuffle #1, map-side combined; df(t) re-aggregates
    that TABLE (vocabulary × avg-df sized, never a second corpus scan)
    — shuffle #2, vocab-sized; the idf join is broadcast (vocabulary
    fits executor memory by Heaps' law); the per-doc top-k window is
    shuffle #3 keyed on doc id, its state bounded by per-doc distinct
    terms. No step is corpus-quadratic and no raw text rides a shuffle
    wider than the (doc, term) pairs themselves.
    """
    from pyspark.sql.window import Window

    from .util import spread_input

    docs = spread_input(docs, id_col)
    toks = F.split(F.col(text_col), " ")
    tf = (docs.select(F.col(id_col), F.explode(toks).alias("term"))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    idf_e9 = F.round(F.log(F.col("n_docs").cast("double")
                           / F.col("df").cast("double"))
                     * F.lit(1e9)).cast("bigint")
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(n_docs))
              .select(F.col(id_col), "term", "tf",
                      (F.col("tf") * idf_e9).alias("score_e9")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score_e9"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "tf", "score_e9", "rank"))


# nDCG@k (Järvelin & Kekäläinen, "Cumulated gain-based evaluation of IR
# techniques", TOIS 2002): graded-relevance ranking quality, the metric
# that distinguishes "found the right docs" (recall) from "put the best
# ones FIRST". Relevance grades here derive from the exact ground-truth
# ranking (rel = k+1 - true_rank), so the metric needs no human labels.
#
# Determinism: log2 is not correctly rounded across engines, so each
# position's rel/log2(rank+1) contribution rounds to 9 decimals and the
# fold runs in rank order (the BM25/PSI discipline); the ideal DCG is a
# Python-computed literal baked identically into both engines' plans.

def _idcg(k: int) -> float:
    import math

    acc = 0.0
    for i in range(1, k + 1):
        acc += round((k + 1 - i) / math.log2(i + 1), 9)
    return round(acc, 9)


def ndcg_at_k(system: DataFrame, truth: DataFrame,
              sys_item: str = "item", truth_item: str = "neighbor_id",
              k: int = 10) -> DataFrame:
    """One row (dcg, ndcg): `system` = (item, rank) ranking to score;
    `truth` = (item, rank) exact top-k whose ranks grade relevance.
    Items outside the truth list contribute 0."""
    rel = truth.select(F.col(truth_item).alias("item"),
                       (F.lit(k + 1) - F.col("rank")).cast("double")
                       .alias("rel"))
    s = (system.filter(F.col("rank") <= k)
         .select(F.col(sys_item).alias("item"), "rank"))
    j = (s.join(rel, "item", "left")
         .select("rank", F.coalesce("rel", F.lit(0.0)).alias("rel")))
    contrib = F.round(
        F.col("rel") / F.log2(F.col("rank").cast("double") + F.lit(1.0)),
        9)
    dcg = F.round(F.aggregate(
        F.array_sort(F.collect_list(F.struct("rank",
                                             contrib.alias("c")))),
        F.lit(0.0), lambda acc, x: acc + x["c"]), 9)
    idcg = _idcg(k)
    return (j.agg(dcg.alias("dcg"))
            .select("dcg",
                    F.round(F.col("dcg") / F.lit(idcg), 9).alias("ndcg")))
