"""LLM-pipeline operators: dedup, similarity, text analysis, multimodal."""

import math

from pyspark.sql import functions as F

from melt_spark.functions.dedup import (exact_dedup, jaccard_pairs,
                                        lsh_candidate_pairs,
                                        minhash_signatures, shingles, simhash)
from melt_spark.functions.multimodal import (attach_binary, decode_metadata,
                                             fake_decode, sample_frames)
from melt_spark.functions.similarity import cosine_topk, lsh_bucketed
from melt_spark.functions.text import lang_id, quality_score, with_text_stats

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2, "the quick brown fox jumps over the lazy dog near the old barn"),
    (3, "the quick brown fox jumps over the lazy dog near the new barn"),
    (4, "completely different words entirely unrelated anything else here"),
    (5, "der hund ist nicht auf der couch und das ist gut"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark))
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 is an exact dup of 1


def test_bm25_ranks_term_rich_docs_first(spark):
    from melt_spark.functions.retrieval import bm25_topk

    rows = [
        (1, "spark join window spark join"),   # all 3 terms, high tf
        (2, "spark filter map reduce sort"),   # 1 term
        (3, "other words entirely different"),  # 0 terms → not a candidate
        (4, "join window other other other"),   # 2 terms
    ]
    out = bm25_topk(_docs(spark, rows), ("spark", "join", "window"),
                    k=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 1            # most matching terms wins
    assert 3 not in ranked           # no query term -> no candidate row
    assert len(ranked) == 3
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_rrf_recall_floor(spark, sf_dir):
    """Hybrid-retrieval quality gate: the RRF-fused top-10 must retain a
    minimum fraction of the exact cosine ground truth — ANN or BM25 changes
    can't silently destroy fusion quality. (Fusing 10 vector + 15 lexical
    candidates into a top-10 legitimately trades some vector recall for
    lexical evidence, so the floor is below 1.0 by design.)"""
    from melt_spark.plans.pipeline_suite import q_rrf_recall

    row = q_rrf_recall(spark, sf_dir).collect()[0]
    assert row["recall"] == row["hits"] / 10.0
    assert 0.2 <= row["recall"] <= 1.0


def test_bm25_rejects_empty_query(spark):
    from melt_spark.functions.retrieval import bm25_topk

    import pytest
    with pytest.raises(ValueError, match="query_terms"):
        bm25_topk(_docs(spark), ())


def test_rrf_fusion_combines_both_lists(spark):
    from melt_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "nid long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "did long, rank int")
    out = {r["item"]: (r["fused"], r["rank"])
           for r in rrf_fuse(a, b, "nid", "did", k=10).collect()}
    # item 20 appears in both lists -> highest fused score
    assert out[20] == (1 / 62 + 1 / 61, 1)
    assert out[10] == (1 / 61, 2)       # rank-1 single-list beats rank-2
    assert out[40] == (1 / 62, 3)
    assert out[30] == (1 / 63, 4)


def test_span_dedup_first_occurrence_wins(spark):
    from melt_spark.functions.dedup import span_dedup

    rows = [
        (1, "a b c d e f"),          # spans (k=3): "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" dup of doc1 → only "x y z" kept
        (3, "a b c d e f"),          # full dup → everything removed
        (4, "p q"),                  # short doc: single 2-token span, unique
    ]
    out = {r["doc_id"]: r for r in
           span_dedup(_docs(spark, rows), k=3).collect()}
    assert (out[1]["text_dedup"], out[1]["n_spans"],
            out[1]["n_removed"]) == ("a b c d e f", 2, 0)
    assert (out[2]["text_dedup"], out[2]["n_removed"]) == ("x y z", 1)
    assert (out[3]["text_dedup"], out[3]["n_kept"],
            out[3]["n_removed"]) == ("", 0, 2)
    assert (out[4]["text_dedup"], out[4]["n_spans"]) == ("p q", 1)


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, [(1, "one two")])
    assert shingles(df, k=3).count() == 0


def test_jaccard_pairs_finds_near_dup(spark):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert (1, 3) in out and 0.5 <= out[(1, 3)] < 1.0
    assert not any(4 in p for p in out)


def test_minhash_lsh_candidates_catch_identical(spark):
    sigs = minhash_signatures(_docs(spark), num_hashes=8)
    cands = {(r["doc_a"], r["doc_b"])
             for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in cands  # identical docs always share every band


def test_simhash_near_dups_close(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(out[a], out[b]))
    assert ham(1, 2) == 0
    assert ham(1, 3) <= ham(1, 4)


def test_cosine_topk_matches_bruteforce(spark):
    vecs = [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]), (4, [-1.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df.filter("vec_id = 1"), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [2, 3, 4]
    top = [r for r in out if r["rank"] == 1][0]
    expect = 0.9 / math.sqrt(0.9 ** 2 + 0.1 ** 2)
    assert abs(top["cos"] - expect) < 1e-12


def test_lsh_bucket_identical_vectors_collide(spark):
    vecs = [(1, [0.5] * 8), (2, [0.5] * 8), (3, [-0.5] * 8)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["bucket"]
           for r in lsh_bucketed(df, num_planes=4, dims=8).collect()}
    assert out[1] == out[2] and out[1] != out[3]


def test_lang_id_and_stats(spark):
    out = {r["doc_id"]: r for r in
           with_text_stats(_docs(spark)).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[5]["lang_pred"] == "de"
    assert out[4]["lang_pred"] == "und"
    assert out[1]["n_tokens_ws"] == 13
    assert out[1]["fingerprint"] == out[2]["fingerprint"]


def test_quality_score_bounds(spark):
    rows = quality_score(_docs(spark)).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    by_id = {r["doc_id"]: r["quality"] for r in rows}
    assert by_id[1] > by_id[4]  # stopword-rich beats stopword-free


def test_df_cap_preserves_rare_near_dups(spark):
    """The hot-shingle cap must not lose near-dup pairs whose shingles are
    rare; pairs driven only by ubiquitous shingles disappear."""
    rows = DOCS + [(6 + i, "common filler words shared by every document here")
                   for i in range(4)]
    out = {(r["doc_a"], r["doc_b"])
           for r in jaccard_pairs(_docs(spark, rows), threshold=0.5,
                                  max_df=3).collect()}
    assert (1, 2) in out          # rare-shingle near-dup survives
    # the 4 identical filler docs share only capped shingles (df=4 > 3)
    assert not any(a >= 6 and b >= 6 for a, b in out)


def test_connected_components_chain_and_islands(spark):
    from melt_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> one component, min 1
         (10, 11),                    # island pair
         (20, 21), (21, 22)],         # triangle-ish chain
        "doc_a long, doc_b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_simhash_near_dup_pairs(spark):
    from melt_spark.functions.dedup import simhash_near_dup_pairs

    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_dup_pairs(_docs(spark)).collect()}
    assert out.get((1, 2)) == 0          # identical docs: distance 0
    assert all(h <= 3 for h in out.values())


def test_extract_features_histogram(spark):
    from melt_spark.functions.multimodal import extract_features

    docs = attach_binary(_docs(spark, [(1, "ab1 2!")]))
    r = extract_features(docs).collect()[0]
    assert (r["f_alpha"], r["f_digit"], r["f_space"], r["f_other"]) \
        == (2, 2, 1, 1)


def test_multimodal_decode_and_frames(spark):
    docs = attach_binary(_docs(spark, [(1, "abcdefgh")]))  # 8 bytes
    meta = decode_metadata(docs).collect()[0]
    expect = fake_decode(b"abcdefgh")
    assert (meta["n_bytes"], meta["width"], meta["height"], meta["n_frames"]) \
        == (8, expect["width"], expect["height"], expect["n_frames"])
    frames = sample_frames(docs).collect()
    assert len(frames) == expect["n_frames"]
    assert {r["frame_idx"] for r in frames} == set(range(expect["n_frames"]))


def test_quantize_int8_error_bounds(spark):
    from melt_spark.functions.similarity import quantization_error

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in quantization_error(df).collect()}
    r1 = rows[1]
    assert r1.dims == 4
    assert abs(r1.scale - 1.0 / 127) < 1e-12
    # symmetric int8: reconstruction error bounded by half a step
    assert r1.max_abs_err <= r1.scale / 2 + 1e-12
    assert r1.mse <= (r1.scale / 2) ** 2 + 1e-12
    # all-zero vector: guard scale=1, zero error
    assert rows[2].scale == 1.0
    assert rows[2].max_abs_err == 0.0


def test_heaps_curve_monotone_and_exact_totals(spark):
    """Checkpoints are monotone in both axes; the last checkpoint sees
    the whole corpus (exact type/token totals); beta > 0 on growing
    vocabulary."""
    from pyspark.sql import Row

    from melt_spark.functions.text import heaps_curve

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{j}" for j in range(i + 1)))
         for i in range(20)])
    out = sorted(heaps_curve(docs, n_points=5).collect(),
                 key=lambda r: r.pt)
    toks = [r.n_tokens for r in out]
    typs = [r.n_types for r in out]
    assert toks == sorted(toks) and typs == sorted(typs)
    assert out[-1].n_tokens == sum(range(1, 21))    # 210 exact
    assert out[-1].n_types == 20                    # w0..w19
    assert all(r.beta_e6 == out[0].beta_e6 for r in out)
    assert 0 < out[0].beta_e6 <= 1_000_000


def test_conformal_nb_partition_and_quantile_semantics(spark):
    """Prediction sets partition the test split (sum n_docs == n_test);
    a doc's true label outside its set is exactly the uncovered count;
    with distinctive per-class vocabulary most sets should be small."""
    from pyspark.sql import Row

    from melt_spark.functions.classify import conformal_nb
    from melt_spark.functions.cleaning import hash_bucket
    from pyspark.sql import functions as F

    # two well-separated classes, 60 docs each
    rows = []
    for i in range(120):
        lab = "a" if i % 2 == 0 else "b"
        word = "apple" if lab == "a" else "banana"
        rows.append(Row(doc_id=i, source=lab,
                        text=" ".join([word] * 6)))
    docs = spark.createDataFrame(rows)
    out = conformal_nb(docs).collect()
    bkt = hash_bucket(
        F.concat(F.lit("cp:"), F.col("doc_id").cast("string")))
    n_test = docs.filter((bkt >= 20) & (bkt < 40)).count()
    assert sum(r.n_docs for r in out) == n_test
    assert all(r.n_covered <= r.n_docs for r in out)
    assert all(0 <= r.set_size <= 2 for r in out)
    # perfectly separable vocab: every covered doc needs only its label
    cov = sum(r.n_covered for r in out)
    assert cov / n_test >= 0.85   # the 1-alpha=0.9 guarantee, n-fuzzed


def test_conformal_nb_tiny_calibration_clamps_quantile(spark):
    """n_cal < 9 makes ceil(0.9*(n_cal+1)) exceed n_cal; the rank is
    clamped to n_cal (q-hat = max nonconformity) instead of silently
    emitting zero rows."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from melt_spark.functions.classify import conformal_nb
    from melt_spark.functions.cleaning import hash_bucket

    rows = []
    for i in range(40):
        lab = "a" if i % 2 == 0 else "b"
        word = "apple" if lab == "a" else "banana"
        rows.append(Row(doc_id=i, source=lab,
                        text=" ".join([word] * 6)))
    docs = spark.createDataFrame(rows)
    bkt = hash_bucket(
        F.concat(F.lit("cp:"), F.col("doc_id").cast("string")))
    n_cal = docs.filter(bkt < 20).count()
    n_test = docs.filter((bkt >= 20) & (bkt < 40)).count()
    assert 0 < n_cal < 9 and n_test > 0, "fixture must hit the tiny band"
    out = conformal_nb(docs).collect()
    assert out, "tiny calibration must not collapse to zero rows"
    assert all(r.n_cal == n_cal for r in out)
    assert sum(r.n_docs for r in out) == n_test


def test_regex_pretokens_gpt2_boundaries(spark):
    """Contractions split; leading space glues to the following run;
    digits/punct are their own runs (the public GPT-2 pattern, ASCII
    subset)."""
    from pyspark.sql import Row

    from melt_spark.functions.text import regex_pretokens

    df = spark.createDataFrame([Row(t="Don't stop, x9y 42 ok!")])
    [row] = df.select(regex_pretokens("t").alias("toks")).collect()
    assert row.toks == ["Don", "'t", " stop", ",", " x", "9", "y",
                        " 42", " ok", "!"]


def test_conformal_nb_empty_calibration_full_sets(spark):
    """r10 ADVICE fix: an EMPTY calibration band (n_cal = 0) must still
    emit test-band rows — q-hat falls back to the +inf sentinel and
    every test doc gets the full label set (the honest distribution-free
    degenerate), not zero output rows."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from melt_spark.functions.classify import conformal_nb
    from melt_spark.functions.cleaning import hash_bucket

    base = []
    for i in range(400):
        lab = "a" if i % 2 == 0 else "b"
        word = "apple" if lab == "a" else "banana"
        base.append(Row(doc_id=i, source=lab,
                        text=" ".join([word] * 6)))
    docs = spark.createDataFrame(base)
    bkt = hash_bucket(
        F.concat(F.lit("cp:"), F.col("doc_id").cast("string")))
    # drop every calibration-band doc; keep test + train bands
    docs = docs.filter(~((bkt < 20)
                         & (F.col("source") == F.col("source"))))
    docs = spark.createDataFrame(docs.collect())  # pin the fixture
    n_test = docs.filter((hash_bucket(F.concat(
        F.lit("cp:"), F.col("doc_id").cast("string"))) >= 20)
        & (hash_bucket(F.concat(
            F.lit("cp:"), F.col("doc_id").cast("string"))) < 40)).count()
    assert n_test > 0, "fixture must keep a test band"
    out = conformal_nb(docs).collect()
    assert out, "empty calibration must not collapse to zero rows"
    assert all(r.n_cal == 0 for r in out)
    assert all(r.q_hat_nano == (1 << 63) - 1 for r in out)
    # every test doc carries the FULL label set (2 labels here)
    assert {r.set_size for r in out} == {2}
    assert sum(r.n_docs for r in out) == n_test
    assert sum(r.n_covered for r in out) == n_test

