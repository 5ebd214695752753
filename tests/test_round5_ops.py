"""Round-5 operators: longest-repeated-n-gram ladder + token entropy,
PIT join, DSIR importance weighting, PQ asymmetric-distance search —
structural/semantic assertions a hash match can't express."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_repeat_ladder_and_entropy_hand_cases(spark):
    from melt_spark.functions.cleaning import repeat_entropy_cols

    rows = [
        Row(doc_id=1, text="a b c d e f"),            # all distinct
        Row(doc_id=2, text="a b a b c"),              # repeated bigram
        Row(doc_id=3, text="x y z w x y z w q"),      # repeated 4-gram
        Row(doc_id=4, text="t t t t t t t t"),        # one token: H=0
    ]
    cols = repeat_entropy_cols("text")
    out = {r.doc_id: r for r in spark.createDataFrame(rows).select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}
    assert out[1].max_rep_ngram == 0
    assert out[2].max_rep_ngram == 2
    assert out[3].max_rep_ngram == 4
    # 8 tokens -> only one 8-gram exists (no repeat possible); the
    # repeated 6-gram is the top attainable rung
    assert out[4].max_rep_ngram == 6
    # entropy: doc 1 uniform over 6 -> ln 6; doc 4 single symbol -> 0
    assert abs(out[1].token_entropy - math.log(6)) < 1e-8
    assert out[4].token_entropy == 0.0
    # doc 2: counts a:2 b:2 c:1 over 5 -> H = ln5 - (2ln2+2ln2)/5
    want = math.log(5) - (2 * math.log(2) + 2 * math.log(2)) / 5
    assert abs(out[2].token_entropy - want) < 1e-8


def test_pit_join_hand_case(spark):
    """Versions 10 and 20 for key A (20 open), delete at 15 for key B
    (opened at 5): facts must hit the interval covering their own time,
    facts in B's post-delete hole must drop out."""
    from melt_spark.operators.scd import pit_join, scd2_intervals

    changes = spark.createDataFrame([
        Row(k="A", sys_change_operation="I", sys_change_version=10),
        Row(k="A", sys_change_operation="U", sys_change_version=20),
        Row(k="B", sys_change_operation="I", sys_change_version=5),
        Row(k="B", sys_change_operation="D", sys_change_version=15),
    ])
    dim = scd2_intervals(changes, "k")
    facts = spark.createDataFrame([
        Row(k="A", at=12), Row(k="A", at=25), Row(k="B", at=7),
        Row(k="B", at=16),    # after B's delete -> no match
        Row(k="A", at=5),     # before A's first version -> no match
    ])
    got = {(r.k, r.at): (r.valid_from, r.valid_to, r.is_current)
           for r in pit_join(facts, dim, "k", "at").collect()}
    assert got == {("A", 12): (10, 20, 0),
                   ("A", 25): (20, None, 1),
                   ("B", 7): (5, 15, 0)}


def test_dsir_prefers_target_like_documents(spark):
    """Raw docs written in the target's vocabulary must outrank raw docs
    in a disjoint vocabulary — the operator's entire purpose."""
    from melt_spark.functions.importance import (bucket_log_ratios,
                                                 hashed_bigram_counts,
                                                 importance_topk)

    target = [Row(doc_id=i * 10, text="alpha beta gamma delta " * 4)
              for i in range(1, 6)]
    like = [Row(doc_id=i, text="alpha beta gamma delta epsilon")
            for i in (1, 2, 3)]
    unlike = [Row(doc_id=i, text="zig zag zoom crash boom bang")
              for i in (4, 5, 6)]
    docs = spark.createDataFrame(target + like + unlike)
    counts = hashed_bigram_counts(docs)
    is_t = F.col("id") % 10 == 0
    ratios = bucket_log_ratios(counts.filter(is_t), counts.filter(~is_t))
    top = importance_topk(counts.filter(~is_t), ratios, k=6).collect()
    by_rank = [r.id for r in sorted(top, key=lambda r: r.rank)]
    assert set(by_rank[:3]) == {1, 2, 3}
    assert all(r.logw > 0 for r in top if r.id in (1, 2, 3))
    assert all(r.logw < 0 for r in top if r.id in (4, 5, 6))


def test_pq_adc_ranks_match_reconstructed_distances(spark, sf_dir):
    """ADC distance of (query, cand) must equal the L2 distance between
    the query and the candidate's RECONSTRUCTION (sum of per-subspace
    code distances) — verified against a python recomputation on a
    sample; and each query's rank-1 neighbor under ADC must be itself
    when the query is in the corpus (self-code distance is minimal
    for these spread-out fixtures)."""
    from melt_spark.functions.pq import pq_adc_topk, pq_codebooks, pq_encode
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_adc_topk(codes, queries, cb, k=5).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    for qid in (0, 1, 2):
        rows = sorted([r for r in out if r.query_id == qid],
                      key=lambda r: r.rank)
        assert len(rows) == 5
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(rows[i].adc_dist <= rows[i + 1].adc_dist
                   for i in range(4))
    # python cross-check of one pair: decode codes, rebuild ADC distance
    cbs = {(r.m, r.code): r.subvec for r in cb.collect()}
    qv = {r.vec_id: [float(x) for x in r.embedding]
          for r in queries.collect()}
    packed = {r.vec_id: r.packed_code for r in codes.collect()}
    r0 = [r for r in out if r.query_id == 0 and r.rank == 1][0]
    p = packed[r0.cand_id]
    dist = 0.0
    for m in range(8):
        code = (p // (16 ** (7 - m))) % 16
        sub_q = qv[0][m * 8:(m + 1) * 8]
        sub_c = cbs[(m, code)]
        dist += sum((a - b) * (a - b) for a, b in zip(sub_q, sub_c))
    assert abs(dist - r0.adc_dist) < 1e-9


def test_bloom_no_false_negatives_and_low_fpr(spark, sf_dir):
    """Bloom contract: EVERY member answers might_contain (zero false
    negatives — structural, not probabilistic), and the planted
    never-seen cohort's false-positive rate respects a generous bound
    over (1-e^(-dn/m))^d."""
    from pyspark.sql import functions as F2

    from melt_spark.functions.bloom import (BLOOM_BITS, BLOOM_DEPTH,
                                            bloom_build,
                                            bloom_might_contain)
    from melt_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    members = ev.filter(F2.col("user_id") % 2 == 0) \
        .select("user_id").distinct()
    bloom = bloom_build(members, "user_id")
    # members: all positive
    got = bloom_might_contain(bloom, members, "user_id")
    assert got.filter(~F2.col("might_contain")).count() == 0
    # planted non-members
    unseen = members.select((F2.col("user_id") + 500000).alias("user_id"))
    n_unseen = unseen.count()
    fp = (bloom_might_contain(bloom, unseen, "user_id")
          .filter(F2.col("might_contain")).count())
    import math
    n = members.count()
    theory = (1 - math.exp(-BLOOM_DEPTH * n / BLOOM_BITS)) ** BLOOM_DEPTH
    assert fp / n_unseen <= max(4 * theory, 0.05), (fp, n_unseen, theory)


def test_bloom_merge_equals_build_of_union(spark):
    from pyspark.sql import Row

    from melt_spark.functions.bloom import bloom_build, bloom_merge

    a = spark.createDataFrame([Row(x=i) for i in range(50)])
    b = spark.createDataFrame([Row(x=i) for i in range(40, 90)])
    merged = {(r.word, r.bits)
              for r in bloom_merge(bloom_build(a, "x"),
                                   bloom_build(b, "x")).collect()}
    direct = {(r.word, r.bits)
              for r in bloom_build(a.unionByName(b), "x").collect()}
    assert merged == direct and merged


def test_ngram_novelty_hand_case(spark):
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import ngram_novelty

    train = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat on the mat")])
    val = spark.createDataFrame([
        Row(doc_id=10, text="the cat sat on a rug"),   # shares 2 3-grams
        Row(doc_id=11, text="completely novel words here"),
        Row(doc_id=12, text="the cat sat"),            # fully seen
    ])
    out = {r.doc_id: (r.n_grams, r.n_seen, r.n_novel)
           for r in ngram_novelty(val, train).collect()}
    # doc 10 grams: "the cat sat","cat sat on","sat on a","on a rug"
    assert out[10] == (4, 2, 2)
    assert out[11] == (2, 0, 2)
    assert out[12] == (1, 1, 0)


def test_split_corpus_stable_and_proportional(spark, sf_dir):
    """Split assignment is a pure function of doc_id (two runs identical)
    and val/test land within a generous envelope of their 5% targets;
    every doc gets exactly one split."""
    from melt_spark.functions.cleaning import split_corpus
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in
         split_corpus(docs).select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in
         split_corpus(docs).select("doc_id", "split").collect()}
    assert a == b and len(a) == docs.count()
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.01 * n <= c["val"] <= 0.12 * n
    assert 0.01 * n <= c["test"] <= 0.12 * n
    assert c["train"] >= 0.8 * n


def test_incremental_minhash_finds_planted_twins(spark, sf_dir):
    """Every store doc's id-shifted twin in the batch must be found at
    jaccard 1.0, and no pair may fall below the threshold."""
    from pyspark.sql import functions as F2

    from melt_spark.functions.dedup import (_minhash_col, _with_digest,
                                            incremental_minhash_pairs,
                                            shingles)
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    store_sh = _with_digest(shingles(docs)).cache()
    store_sigs = store_sh.groupBy("doc_id").agg(
        *[_minhash_col(s).alias(f"mh{s}") for s in range(8)])
    batch = docs.withColumn("doc_id", F2.col("doc_id") + 20000)
    out = incremental_minhash_pairs(
        batch, store_sigs, store_sh.select("doc_id", "sid"),
        threshold=0.8).collect()
    twins = {(r.batch_doc, r.store_doc) for r in out
             if r.batch_doc == r.store_doc + 20000}
    n_docs = docs.count()
    assert len(twins) == n_docs            # every twin found (j = 1.0)
    assert all(r.jaccard >= 0.8 for r in out)
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in out
               if (r.batch_doc, r.store_doc) in twins)


def test_ndcg_reference_values(spark):
    """Perfect ranking = 1.0; a ranking with zero truth overlap = 0;
    putting the best item last scores strictly below putting it first."""
    from melt_spark.functions.retrieval import ndcg_at_k

    truth = spark.createDataFrame(
        [Row(neighbor_id=i, rank=i) for i in range(1, 11)])
    perfect = spark.createDataFrame(
        [Row(item=i, rank=i) for i in range(1, 11)])
    [p] = ndcg_at_k(perfect, truth).collect()
    assert abs(p.ndcg - 1.0) < 1e-9
    none = spark.createDataFrame(
        [Row(item=i + 100, rank=i) for i in range(1, 11)])
    [z] = ndcg_at_k(none, truth).collect()
    assert z.ndcg == 0.0
    # best item (truth rank 1, rel 10) demoted to position 10
    demoted = spark.createDataFrame(
        [Row(item=(i + 1 if i < 10 else 1), rank=i)
         for i in range(1, 11)])
    [d] = ndcg_at_k(demoted, truth).collect()
    assert 0.0 < d.ndcg < p.ndcg


def test_ivf_pq_recall_floor_and_ordering(spark, sf_dir):
    """Composed IVFPQ: recall@10 vs exact cosine must clear a floor (the
    compression+probe trade costs recall, but not everything), ranks are
    dense and distances ascend."""
    from melt_spark.functions.pq import ivf_pq_topk
    from melt_spark.functions.similarity import cosine_topk
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    got = ivf_pq_topk(emb, queries, k=10, nprobe=3).collect()
    exact = cosine_topk(emb, queries, k=10).collect()
    for qid in (0, 1, 2):
        rows = sorted([r for r in got if r.query_id == qid],
                      key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(rows[i].adc_dist <= rows[i + 1].adc_dist
                   for i in range(len(rows) - 1))
    hits = len({(r.query_id, r.cand_id) for r in got}
               & {(r.query_id, r.neighbor_id) for r in exact})
    # 30 truth pairs; uniform-random fixture vectors are the worst case
    # for BOTH stages (no cluster structure: nprobe 3/10 alone caps
    # recall ~30%, and 4-bit codes distort heavily on top) — this floor
    # guards against total breakage (0-2 hits), not quality; the
    # per-stage quality gates live in test_ivf.py (probe monotonicity)
    # and the pq_adc reconstruction cross-check
    assert hits >= 4, hits


def test_alignment_filter_keeps_anchor_and_thresholds(spark, sf_dir):
    from melt_spark.functions.similarity import alignment_filter
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = alignment_filter(emb, emb.filter(F.col("vec_id") == 0),
                           threshold=0.1).collect()
    by_id = {r.vec_id: r for r in out}
    assert abs(by_id[0].align_cos - 1.0) < 1e-12   # the anchor itself
    assert by_id[0].kept == 1
    assert all((r.kept == 1) == (r.align_cos >= 0.1) for r in out)
    assert 0 < sum(r.kept for r in out) < len(out)  # non-degenerate


def test_audio_windows_hand_case(spark):
    """len 64 -> exactly 1 window; len 63 -> 0; len 160 -> 3 windows
    (starts 0/48/96, last covering chars 96..159); unicode payloads are
    character-addressed (no surrogate splitting)."""
    import hashlib

    from melt_spark.functions.multimodal import audio_windows

    t64 = "a" * 64
    t160 = "".join(chr(ord("a") + i % 26) for i in range(160))
    uni = ("é" * 100)
    rows = [Row(doc_id=1, text=t64), Row(doc_id=2, text="x" * 63),
            Row(doc_id=3, text=t160), Row(doc_id=4, text=uni)]
    out = {r.doc_id: r for r in
           audio_windows(spark.createDataFrame(rows)).collect()}
    assert (out[1].n_windows, out[2].n_windows, out[3].n_windows) \
        == (1, 0, 3)
    assert out[2].win_fp_first == ""
    assert out[3].win_fp_first == hashlib.md5(
        t160[:64].encode()).hexdigest()
    assert out[3].win_fp_last == hashlib.md5(
        t160[96:160].encode()).hexdigest()
    assert out[4].n_chars == 100 and out[4].n_windows == 1
    assert out[4].win_fp_first == hashlib.md5(
        ("é" * 64).encode("utf-8")).hexdigest()


def test_fuzzy_match_finds_every_planted_typo(spark, sf_dir):
    """Every typo'd name must match its own source at lev == 1 (one
    substitution), and no surviving pair may exceed the distance bound."""
    from melt_spark.plans.analytics_suite import q_fuzzy_match

    from melt_spark.sources.parquet import read_table

    out = q_fuzzy_match(spark, sf_dir).collect()
    own = {(r.t_id, r.c_custkey) for r in out
           if r.t_id == r.c_custkey + 100000}
    n_cust = min(200, read_table(spark, sf_dir, "customer").count())
    assert len(own) == n_cust
    assert all(r.lev == 1 for r in out
               if r.t_id == r.c_custkey + 100000)
    assert all(r.lev <= 2 for r in out)


def test_fuzzy_match_prefilter_is_complete(spark):
    """Hand pairs at distance exactly max_dist must survive the q-gram
    count bound (the Gravano completeness guarantee), and far pairs must
    be rejected by levenshtein even when they share grams."""
    from melt_spark.functions.fuzzy import fuzzy_match

    left = spark.createDataFrame(
        [Row(lid=1, ls="abcdefghijklmnop"),
         Row(lid=2, ls="abcdefgh__klmnop"),     # dist 2 from lid=1's str
         Row(lid=3, ls="zzzzzzzzzzzzzzzz")])
    right = spark.createDataFrame(
        [Row(rid=10, rs="abcdefghijklmnop")])
    got = {(r.lid, r.rid, r.lev) for r in
           fuzzy_match(left, right, "lid", "ls", "rid", "rs",
                       q=3, max_dist=2).collect()}
    assert (1, 10, 0) in got
    assert (2, 10, 2) in got
    assert all(lid != 3 for lid, _r, _l in got)


def test_bloom_pruned_membership_join_equals_exact(spark, sf_dir):
    """Bloom as a join PRUNER: filtering the probe side through
    might_contain before the exact join must lose nothing (zero false
    negatives) while shrinking the exact join's input — the runtime-
    filter composition the operator exists for."""
    from pyspark.sql import functions as F2

    from melt_spark.functions.bloom import bloom_build, bloom_might_contain
    from melt_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    members = ev.filter(F2.col("user_id") % 3 == 0) \
        .select("user_id").distinct()
    probes = (ev.select("user_id").distinct()
              .unionByName(ev.select((F2.col("user_id") + 777777)
                                     .alias("user_id")).distinct()))
    exact = {r.user_id for r in probes.join(members, "user_id").collect()}
    bloom = bloom_build(members, "user_id")
    pruned = (bloom_might_contain(bloom, probes, "user_id")
              .filter(F2.col("might_contain"))
              .select(F2.col("item").alias("user_id")))
    n_probes = probes.distinct().count()
    n_pruned = pruned.count()
    via_bloom = {r.user_id for r in
                 pruned.join(members, "user_id").collect()}
    assert via_bloom == exact          # pruning loses nothing
    assert n_pruned < n_probes         # and actually prunes


def test_fuzzy_reciprocal_best_resolves_each_typo_uniquely(spark, sf_dir):
    """Entity resolution on top of the candidates: every typo has exactly
    one is_best=1 partner — its own source (lev 1 beats the lev-2
    neighbors) — and best flags are mutually exclusive per entity."""
    from collections import Counter

    from melt_spark.plans.analytics_suite import q_fuzzy_match

    out = q_fuzzy_match(spark, sf_dir).collect()
    best = [(r.t_id, r.c_custkey) for r in out if r.is_best == 1]
    ct = Counter(t for t, _ in best)
    cc = Counter(c for _, c in best)
    assert all(v == 1 for v in ct.values())
    assert all(v == 1 for v in cc.values())
    assert all(t == c + 100000 for t, c in best)   # resolves to source
    assert len(best) >= 100


def test_contrastive_triplets_are_valid(spark, sf_dir):
    """Every triplet: negative differs from anchor AND positive, both
    directions of every pair appear, negatives are real corpus ids, and
    a re-run is bit-identical (no RNG)."""
    from melt_spark.functions.cleaning import contrastive_pairs
    from melt_spark.functions.dedup import jaccard_pairs
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5)
    t1 = contrastive_pairs(pairs, docs).collect()
    t2 = contrastive_pairs(pairs, docs).collect()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    n_pairs = pairs.count()
    assert len(t1) == 2 * n_pairs
    for r in t1:
        assert r.negative not in (r.anchor, r.positive)
        assert r.negative in ids


def test_tfidf_topk_hand_case(spark):
    """idf dominates tf: the corpus-unique term outranks the frequent
    common one, and the integer-scaled score matches round(ln*1e9)."""
    from melt_spark.functions.retrieval import tfidf_topk_terms

    rows = [
        Row(doc_id=1, text="apple banana apple"),
        Row(doc_id=2, text="banana cherry"),
        Row(doc_id=3, text="banana banana date"),
        Row(doc_id=4, text="cherry date"),
    ]
    out = tfidf_topk_terms(spark.createDataFrame(rows), k=1).collect()
    top = {r.doc_id: r for r in out}
    assert top[1].term == "apple"
    # df(apple)=1 of N=4 -> idf_e9 = round(ln 4 * 1e9), tf = 2
    assert top[1].score_e9 == 2 * round(math.log(4) * 1e9)
    # d3: date (df=2) beats banana (tf=2 but df=3)
    assert top[3].term == "date"
    assert top[3].score_e9 == round(math.log(2) * 1e9)


def test_pmi_planted_collocation(spark):
    """A bigram whose words appear ONLY together gets the top PMI slot;
    the integer score matches the closed-form ln within 1 (ulp slack)."""
    from melt_spark.functions.text import pmi_collocations

    rows = [Row(doc_id=i, text="san francisco the cat the dog the cat")
            for i in range(5)]
    out = pmi_collocations(spark.createDataFrame(rows),
                           min_count=5, k=3).collect()
    byrank = {r.rank: r for r in out}
    assert byrank[1].bigram == "san francisco"
    assert byrank[1].c_ab == 5
    # c_ab=5, N=40 tokens, T=35 bigrams, c_a=c_b=5
    want = math.log((5 * 40) / (35 * 5) * (40 / 5)) * 1e9
    assert abs(byrank[1].pmi_e9 - round(want)) <= 1


def _vec64(*pairs):
    """64-dim vector with (index, value) pairs set, zeros elsewhere."""
    v = [0.0] * 64
    for i, x in pairs:
        v[i] = float(x)
    return v


def test_binary_signature_packing_and_topk(spark):
    from melt_spark.functions.similarity import binary_topk

    # dims 1 and 33 positive -> bit 0 of each word; negatives never set
    rows = [
        Row(vec_id=0, embedding=_vec64((0, 1.0), (32, 2.0), (1, -1.0))),
        Row(vec_id=1, embedding=_vec64((0, 1.0), (32, 2.0))),   # same signs
        Row(vec_id=2, embedding=_vec64((5, 1.0), (40, 3.0))),   # disjoint
    ]
    df = spark.createDataFrame(rows)
    out = binary_topk(df, df.filter(F.col("vec_id") == 0), k=2, n_cand=3)
    got = {r.rank: r for r in out.collect()}
    # vec 1 shares both sign bits with the query -> hamming 0, top rank
    assert got[1].neighbor_id == 1 and got[1].hamming == 0
    # vec 2: query sets bits {0,32-word-bit}, v2 sets {5, 40} -> 4 bits
    assert got[2].neighbor_id == 2 and got[2].hamming == 4


def test_mmr_prefers_diversity_over_redundancy(spark):
    """After picking the best doc (rel 0.9), its exact duplicate scores
    0.7*0.9 - 0.3*1 = 0.33 and must lose to a less-relevant doc pointing
    away from pick 1 (rel 0.6, sim-to-pick 0.191: score ~0.363)."""
    from melt_spark.functions.retrieval import mmr_rerank

    q = _vec64((0, 1.0))
    d1 = _vec64((0, 0.9), (1, 0.4358898943540674))   # unit, rel 0.9
    rows = [
        Row(vec_id=100, embedding=q),                  # the query
        Row(vec_id=1, embedding=d1),
        Row(vec_id=2, embedding=[2 * x for x in d1]),  # duplicate dir
        Row(vec_id=3, embedding=_vec64((0, 0.6), (1, -0.8))),
    ]
    df = spark.createDataFrame(rows)
    out = mmr_rerank(df.filter(F.col("vec_id") != 100),
                     df.filter(F.col("vec_id") == 100), k=3, n_cand=3)
    picks = {r.pick: r.neighbor_id for r in out.collect()}
    assert picks[1] == 1            # highest rel, lowest id tie-break
    assert picks[2] == 3            # diversity beats the duplicate
    assert picks[3] == 2


def test_kmeans_separates_planted_blobs(spark):
    """Two tight 2-D blobs; seeds (vec_id < 2) land one in each. The
    integer centroid means and SSEs are computable by hand from the
    q = floor((x+16)*1e6 + 0.5) quantization."""
    from melt_spark.functions.kmeans import kmeans_train

    rows = [Row(vec_id=0, embedding=[0.0, 0.1]),
            Row(vec_id=1, embedding=[10.0, 9.9]),
            Row(vec_id=2, embedding=[0.1, -0.1]),
            Row(vec_id=3, embedding=[-0.1, 0.0]),
            Row(vec_id=4, embedding=[10.1, 10.0]),
            Row(vec_id=5, embedding=[9.9, 10.1])]
    out = {r.cid: r for r in kmeans_train(
        spark.createDataFrame(rows), n_clusters=2, iters=2).collect()}
    assert out[0].n_assigned == 3 and out[1].n_assigned == 3
    # blob means: (0,0) -> 16e6 per component; (10,10) -> 26e6
    assert (out[0].c1, out[0].c2) == (16_000_000, 16_000_000)
    assert (out[1].c1, out[1].c2) == (26_000_000, 26_000_000)
    # each blob: offsets {0, ±0.1} per axis -> sum of diff² = 4e10
    assert out[0].sse == 40_000_000_000
    assert out[1].sse == 40_000_000_000


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """Duplicate seeds tie iteration-1 assignment to the lower cid, so
    cluster 1 empties and keeps its seed centroid (the pinned rule) —
    which lets it win the two origin points BACK in iteration 2 after
    cluster 0's mean drifted toward the outlier. The final split only
    happens if the keep-rule fired."""
    from melt_spark.functions.kmeans import kmeans_train

    rows = [Row(vec_id=0, embedding=[0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.0]),
            Row(vec_id=2, embedding=[0.2, 0.0])]
    out = {r.cid: r for r in kmeans_train(
        spark.createDataFrame(rows), n_clusters=2, iters=2).collect()}
    assert out[0].n_assigned == 1 and out[0].sse == 0
    assert (out[0].c1, out[0].c2) == (16_200_000, 16_000_000)
    assert out[1].n_assigned == 2 and out[1].sse == 0
    assert (out[1].c1, out[1].c2) == (16_000_000, 16_000_000)


def test_greedy_coverage_hand_case(spark):
    """d1/d2 tie at 4 grams (id asc -> d1); d2's residual gain is 3
    once 'a b c' is covered; d4 is a pure subset of d1 and never wins;
    covered_total is the running (disjoint) sum."""
    from melt_spark.functions.cleaning import greedy_coverage

    rows = [Row(doc_id=1, text="a b c d e f"),
            Row(doc_id=2, text="a b c x y z"),
            Row(doc_id=3, text="q r s"),
            Row(doc_id=4, text="b c d")]
    got = [(r.pick, r.doc_id, r.gain, r.covered_total)
           for r in greedy_coverage(spark.createDataFrame(rows),
                                    k=3, n=3)
           .orderBy("pick").collect()]
    assert got == [(1, 1, 4, 4), (2, 2, 3, 7), (3, 3, 1, 8)]


def test_hits_hand_computed_scores(spark):
    """4-edge directed graph; every normalization and floor division is
    hand-checkable: after 2 iterations hub(1)=1e6 (points at both strong
    authorities), hub(2)=625000, hub(3)=124999 (integer floor of
    199999*1e6/1.6e6); authorities mirror in-link weight."""
    from melt_spark.functions.graph import hits_int

    edges = spark.createDataFrame(
        [Row(src=1, dst=10), Row(src=1, dst=11),
         Row(src=2, dst=10), Row(src=3, dst=12)])
    out = {r.node: (r.hub, r.authority)
           for r in hits_int(edges, iters=2).collect()}
    assert out[1] == (1_000_000, 0)
    assert out[2] == (625_000, 0)
    assert out[3] == (124_999, 0)
    assert out[10] == (0, 1_000_000)
    assert out[11] == (0, 600_000)
    assert out[12] == (0, 199_999)


def test_containment_catches_subset_jaccard_misses(spark):
    """doc 1's entire shingle set sits inside doc 2's: containment = 1.0
    while Jaccard = 6/18 — the asymmetric case the overlap coefficient
    exists for."""
    from melt_spark.functions.dedup import containment_pairs, jaccard_pairs

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g h"),
        Row(doc_id=2, text="a b c d e f g h i j k l m n o p q r s t"),
        Row(doc_id=3, text="z y x w v u")])
    cont = containment_pairs(docs, k=3, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in cont] == [(1, 2, 1.0)]
    assert jaccard_pairs(docs, k=3, threshold=0.9).count() == 0


def test_nb_classifier_separates_and_breaks_ties_low_label(spark):
    """Two cleanly separable vocabularies classify perfectly; a doc whose
    tokens are unseen in training scores identically under both labels
    (all-miss mass + equal priors) and the pinned tie-break picks the
    ascending label."""
    from melt_spark.functions.classify import nb_classify, nb_model

    train = spark.createDataFrame(
        [Row(doc_id=i, source="ham", text="meeting agenda notes budget")
         for i in range(4)]
        + [Row(doc_id=4 + i, source="spam", text="cheap pills win prize")
           for i in range(4)])
    model, labels = nb_model(train)
    score = spark.createDataFrame(
        [Row(doc_id=100, text="agenda budget meeting"),
         Row(doc_id=101, text="win cheap prize pills win"),
         Row(doc_id=102, text="totally novel tokens only")])
    pred = {r.id: r.predicted
            for r in nb_classify(score, model, labels).collect()}
    assert pred[100] == "ham"
    assert pred[101] == "spam"
    assert pred[102] == "ham"      # exact integer tie -> label asc


def test_ewma_int_hand_recurrence(spark):
    """Buckets 0h,1h,2h with counts 4,2,8: s = 4, (4+2)>>1 = 3,
    (3+8)>>1 = 5 — final 5, max 5; a single-bucket key returns its own
    count for both."""
    import datetime as dt

    from melt_spark.functions.timeseries import ewma_int

    base = dt.datetime(2024, 1, 1)
    rows = [Row(ts=base + dt.timedelta(hours=h, minutes=m), k="a")
            for h, n in [(0, 4), (1, 2), (2, 8)] for m in range(n)]
    rows += [Row(ts=base, k="b")]
    out = {r.k: r for r in ewma_int(
        spark.createDataFrame(rows), "ts", ["k"], 3600).collect()}
    assert (out["a"].n_buckets, out["a"].ewma_final,
            out["a"].ewma_max) == (3, 5, 5)
    assert (out["b"].n_buckets, out["b"].ewma_final,
            out["b"].ewma_max) == (1, 1, 1)


def test_kmeans_outliers_picks_farthest(spark):
    """Planted outlier far from both blobs is the top distance; within
    the blobs, ties resolve by id asc and the limit is respected."""
    from melt_spark.functions.kmeans import kmeans_outliers

    rows = [Row(vec_id=0, embedding=[0.0, 0.0]),
            Row(vec_id=1, embedding=[10.0, 10.0]),
            Row(vec_id=2, embedding=[0.1, 0.0]),
            Row(vec_id=3, embedding=[10.1, 10.0]),
            Row(vec_id=4, embedding=[5.0, 5.0])]   # the outlier
    out = kmeans_outliers(spark.createDataFrame(rows), n_clusters=2,
                          iters=2, top_n=2).collect()
    assert out[0].vec_id == 4
    assert out[0].dist > out[1].dist
    assert len(out) == 2


def test_ewma_incremental_continuation_equals_batch(spark):
    """Split the series at a bucket boundary, run phase 1, feed its
    output as state to phase 2 — identical (n_buckets, final, max) to
    one batch over everything, because the recurrence is
    prefix-decomposable. A key appearing ONLY in phase 2 seeds fresh."""
    import datetime as dt

    from melt_spark.functions.timeseries import ewma_int

    base = dt.datetime(2024, 1, 1)
    series = {"a": [4, 2, 8, 1, 9, 3], "b": [7, 7, 7, 7, 7, 7]}
    rows = [Row(ts=base + dt.timedelta(hours=h, minutes=m), k=k)
            for k, xs in series.items()
            for h, n in enumerate(xs) for m in range(n)]
    rows += [Row(ts=base + dt.timedelta(hours=4, minutes=m), k="late")
             for m in range(5)]          # only in phase 2
    df = spark.createDataFrame(rows)
    cut = base + dt.timedelta(hours=3)

    batch = {r.k: (r.n_buckets, r.ewma_final, r.ewma_max)
             for r in ewma_int(df, "ts", ["k"], 3600).collect()}
    s1 = ewma_int(df.filter(F.col("ts") < cut), "ts", ["k"], 3600)
    two = {r.k: (r.n_buckets, r.ewma_final, r.ewma_max)
           for r in ewma_int(df.filter(F.col("ts") >= cut), "ts", ["k"],
                             3600, state=s1).collect()}
    # phase-2 output only covers keys with new buckets; all had some
    assert two == batch


def test_ppr_concentrates_mass_near_seed(spark):
    """Chain 1-2-3-4 (symmetrized), seed {1}: mass decays with distance
    from the seed, and every score is reproducible integer arithmetic —
    checked against a hand-rolled python fold of the same recurrence."""
    from melt_spark.functions.graph import ppr_int, symmetrize

    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=3, b=4)])
    out = {r.node: r.score
           for r in ppr_int(symmetrize(pairs, "a", "b"), seeds=[1],
                            iters=3).collect()}
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    outdeg = {n: sum(1 for s, _ in edges if s == n) for n in (1, 2, 3, 4)}
    restart = {1: 10**9 * 15 // 100}
    s = {n: (10**9 if n == 1 else 0) for n in (1, 2, 3, 4)}
    for _ in range(3):
        inflow = {n: 0 for n in s}
        for a, b in edges:
            inflow[b] += s[a] // outdeg[a]
        s = {n: restart.get(n, 0) + 85 * inflow[n] // 100 for n in s}
    assert out == s
    assert out[1] > out[3] and out[2] > out[4]


def test_streaming_ewma_continuation_equals_batch(spark, tmp_path):
    """Three TIME-ORDERED micro-batches; foreachBatch continues the EWMA
    from the carried state — final state equals the batch EWMA over the
    whole stream (state is per-key 3 ints: fixed memory by construction,
    the CMS-test pattern)."""
    import datetime as dt

    from melt_spark.functions.timeseries import ewma_int

    base = dt.datetime(2024, 1, 1)
    series = {"a": [4, 2, 8, 1, 9, 3], "b": [7, 1, 7, 1, 7, 1]}
    all_rows = [Row(ts=base + dt.timedelta(hours=h, minutes=m), k=k)
                for k, xs in series.items()
                for h, n in enumerate(xs) for m in range(n)]
    df = spark.createDataFrame(all_rows)
    src = str(tmp_path / "stream")
    for phase in range(3):           # hours [0,2), [2,4), [4,6) in order
        lo = base + dt.timedelta(hours=2 * phase)
        hi = base + dt.timedelta(hours=2 * phase + 2)
        df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)) \
            .repartition(1).write.mode("append").parquet(src)

    state_rows: list = []

    def step(batch_df, batch_id):
        state = (spark.createDataFrame(
            state_rows, schema="k string, n_buckets long,"
            " ewma_final long, ewma_max long")
            if state_rows else None)
        out = ewma_int(batch_df, "ts", ["k"], 3600, state=state).collect()
        merged = {r.k: r for r in out}
        for r in state_rows:
            if r[0] not in merged:      # key silent this batch: keep
                merged[r[0]] = r
        state_rows.clear()
        state_rows.extend(
            (r.k, r.n_buckets, r.ewma_final, r.ewma_max)
            if not isinstance(r, tuple) else r for r in merged.values())

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(step) \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {k: (n, f, m) for k, n, f, m in state_rows}
    want = {r.k: (r.n_buckets, r.ewma_final, r.ewma_max)
            for r in ewma_int(df, "ts", ["k"], 3600).collect()}
    assert got == want


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: two documents sharing a run of
    w + k - 1 = 8 tokens share at least one fingerprint, while documents
    with no common 4-gram share none; selections are far sparser than
    the full gram set (density ~2/(w+1))."""
    from melt_spark.functions.text import winnow_fingerprints

    shared = "q w e r t y u i"                     # 8 shared tokens
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a1 b1 c1 " + shared + " d1 e1"),
        Row(doc_id=2, text=shared + " x2 y2 z2 k2 m2 n2"),
        Row(doc_id=3, text="p3 q3 r3 s3 t3 u3 v3 w3 x3 y3")])
    fps = winnow_fingerprints(spark.createDataFrame(
        [Row(doc_id=r.doc_id, text=r.text) for r in docs.collect()]),
        k=4, w=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fp"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: doc 3 has 7 grams, 3 windows -> far fewer picks than grams
    assert 1 <= len(by_doc[3]) <= 3

def test_winnow_rightmost_min_tie_break(spark):
    """'t5a t5b t5c t5d' repeated: grams 1 and 5 hash identically AND
    that hash is the window minimum (verified by hand against md5), so
    the rightmost-min rule must select pos 5, never pos 1 — a strict-<
    fold would keep pos 1."""
    from melt_spark.functions.text import winnow_fingerprints

    out = winnow_fingerprints(spark.createDataFrame(
        [Row(doc_id=1, text="t5a t5b t5c t5d t5a t5b t5c t5d")]),
        k=4, w=5).collect()
    assert [(r.pos, r.fp) for r in out] == [(5, 49975895507665)]


def test_waterfill_regimes_and_budget_exact(spark):
    """Two cap-bound sources, two lambda-bound: allocations match the
    hand-solved waterfill, the budget binds exactly, and no allocation
    exceeds its cap. All-fit regime: caps sum under budget -> everyone
    cap-bound."""
    from melt_spark.functions.cleaning import budget_waterfill

    rows = [Row(source="tiny", w=10), Row(source="small", w=100),
            Row(source="big", w=10_000), Row(source="huge", w=50_000)]
    out = {r.source: r for r in budget_waterfill(
        spark.createDataFrame(rows), budget=10_000, cap_epochs=4,
        weight_col="w").collect()}
    assert out["tiny"].alloc_tokens == 40       # cap-bound
    assert out["small"].alloc_tokens == 400     # cap-bound
    assert out["big"].alloc_tokens == 4780      # lambda
    assert out["huge"].alloc_tokens == 4780     # lambda
    assert sum(r.alloc_tokens for r in out.values()) == 10_000
    assert all(r.alloc_tokens <= r.cap_tokens for r in out.values())

    allfit = budget_waterfill(
        spark.createDataFrame(rows), budget=10**9, cap_epochs=4,
        weight_col="w").collect()
    assert all(r.alloc_tokens == r.cap_tokens for r in allfit)


def test_canonical_docs_one_keep_per_cluster(spark):
    """Pairs {1-2, 2-3} cluster as {1,2,3}; 4 is singleton. The longest
    member (doc 2) is the keeper; the singleton keeps itself."""
    from melt_spark.functions.dedup import canonical_docs

    docs = spark.createDataFrame(
        [Row(doc_id=1, n_chars=50), Row(doc_id=2, n_chars=80),
         Row(doc_id=3, n_chars=80), Row(doc_id=4, n_chars=10)])
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2),
                                   Row(doc_a=2, doc_b=3)])
    out = {r.doc_id: (r.cluster_id, r.keep)
           for r in canonical_docs(docs, pairs).collect()}
    assert out == {1: (1, 0), 2: (1, 1),    # 80-char tie -> lower id 2
                   3: (1, 0), 4: (4, 1)}


def test_skew_report_hand_shares(spark):
    """70 rows on one key + 30 singletons: top1 = 700000 ppm,
    top10 = 790000 ppm, top100 = everything."""
    from melt_spark.operators.skew import skew_report

    rows = ([Row(k="hot") for _ in range(70)]
            + [Row(k=f"k{i:02d}") for i in range(30)])
    r = skew_report(spark.createDataFrame(rows), ["k"]).collect()[0]
    assert (r.n_keys, r.total_rows, r.max_key_rows) == (31, 100, 70)
    assert (r.top1_share_e6, r.top10_share_e6,
            r.top100_share_e6) == (700_000, 790_000, 1_000_000)


def test_diversity_profile_hand_ratios_and_slope_sign(spark):
    """Repetitive source: 10 copies of one token -> TTR 100000 ppm and
    a steep negative 'slope'... actually a single type has no slope
    variance; use 2 types. Diverse source: all-distinct tokens -> TTR
    1e6 and distinct-3 = 1e6."""
    from melt_spark.functions.text import diversity_profile

    rows = [Row(source="rep", text="x x x x x x x x x y"),
            Row(source="div", text="a b c d e f g h i j")]
    out = {r.source: r for r in diversity_profile(
        spark.createDataFrame(rows), top_r=100).collect()}
    assert out["rep"].ttr_e6 == 200_000          # 2 types / 10 tokens
    assert out["div"].ttr_e6 == 1_000_000
    assert out["div"].distinct3_e6 == 1_000_000  # 8 distinct 3-grams
    assert out["rep"].distinct3_e6 < 1_000_000   # xxx repeats
    # Zipf slope: rep source has freq (9,1) over ranks (1,2) ->
    # slope = (ln1 - ln9)/(ln2 - ln1) = -ln9/ln2 ~ -3.1699
    import math
    want = round((math.log(1) - math.log(9)) / math.log(2), 4)
    assert round(out["rep"].zipf_slope, 4) == want


def test_trimmed_mean_drops_outliers_exactly(spark):
    """10 values with one huge outlier: 10% trim drops exactly the
    bottom-1 and top-1 by (cents, event_id); the mean of the middle 8 is
    exact integer cents."""
    import datetime as dt

    from melt_spark.functions.timeseries import trimmed_mean_cents

    base = dt.datetime(2024, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    rows = [Row(event_id=i, event_type="t", value=v,
                ts=base + dt.timedelta(minutes=i))
            for i, v in enumerate(vals)]
    r = trimmed_mean_cents(spark.createDataFrame(rows), "value",
                           ["event_type"]).collect()[0]
    assert (r.n, r.n_kept) == (10, 8)
    # middle 8: 2..9 -> sum 4400 cents, mean 550
    assert r.trimmed_sum_cents == 4400
    assert r.trimmed_mean_cents == 550


def test_cross_source_leakage_counts_only_cross_pairs(spark):
    """Pairs (1,2) same-source and (1,3),(2,4) cross-source: the matrix
    keeps only cross pairs, normalizes order, and max_sim is exact."""
    from melt_spark.functions.dedup import cross_source_leakage

    docs = spark.createDataFrame(
        [Row(doc_id=1, source="a"), Row(doc_id=2, source="a"),
         Row(doc_id=3, source="b"), Row(doc_id=4, source="c")])
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2, jaccard=0.95),
         Row(doc_a=1, doc_b=3, jaccard=0.85),
         Row(doc_a=2, doc_b=4, jaccard=0.9),
         Row(doc_a=3, doc_b=4, jaccard=0.82)])
    out = {(r.source_a, r.source_b): (r.n_pairs, r.max_sim)
           for r in cross_source_leakage(docs, pairs).collect()}
    assert out == {("a", "b"): (1, 0.85), ("a", "c"): (1, 0.9),
                   ("b", "c"): (1, 0.82)}


def test_langid_char_ngrams_discriminate_real_languages(spark):
    """The char-trigram NB langid (r11) on a REAL multilingual
    micro-corpus: orthographically distinct languages classify
    perfectly on held-out docs — the discrimination property the
    synthetic fixture can't exercise."""
    from melt_spark.functions.classify import langid_ngram

    corpus = {
        "en": ["the quick brown fox jumps over the lazy dog",
               "she sells sea shells by the sea shore",
               "a journey of a thousand miles begins with one step",
               "to be or not to be that is the question",
               "all the world is a stage and we are players"],
        "de": ["der schnelle braune fuchs springt ueber den faulen hund",
               "sie verkauft muscheln am ufer des meeres",
               "eine reise von tausend meilen beginnt mit einem schritt",
               "sein oder nicht sein das ist hier die frage",
               "die ganze welt ist eine buehne und wir sind spieler"],
        "fr": ["le rapide renard brun saute par dessus le chien",
               "elle vend des coquillages au bord de la mer",
               "un voyage de mille lieues commence par un pas",
               "etre ou ne pas etre telle est la question",
               "le monde entier est une scene et nous des acteurs"],
    }
    rows, i = [], 0
    for lang, texts in corpus.items():
        for t in texts:
            rows.append(Row(doc_id=i, lang=lang, text=t))
            i += 1
    docs = spark.createDataFrame(rows)
    out = langid_ngram(docs, train_mod=5)   # ids % 5 == 0 held out
    got = {r.doc_id: (r.lang, r.predicted, r.correct)
           for r in out.collect()}
    assert len(got) == 3   # one held-out doc per language
    for _id, (lang, predicted, correct) in got.items():
        assert predicted == lang and correct == 1, got
