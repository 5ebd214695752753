"""Corpus-cleaning operators: PII scrub, repetition, decontamination,
stratified sampling, shard assignment (functions/cleaning.py)."""

import pyspark.sql.functions as F
import pytest

from melt_spark.functions.cleaning import (assign_shards, contamination,
                                           hash_bucket, pii_count,
                                           repetition_features, scrub_pii,
                                           stratified_sample)

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_redacts_all_categories(spark):
    df = _docs(spark, [(1, "mail a.b@x-corp.io host 10.0.3.7 "
                           "tel +1-555-123-4567 done")])
    out = df.select(scrub_pii("text").alias("t")).head()[0]
    assert out == "mail <EMAIL> host <IPV4> tel <PHONE> done"


def test_pii_counts(spark):
    df = _docs(spark, [(1, "a@b.co c@d.org 1.2.3.4 no phone")])
    row = df.select(pii_count("text", "email").alias("e"),
                    pii_count("text", "ipv4").alias("i"),
                    pii_count("text", "phone").alias("p")).head()
    assert (row.e, row.i, row.p) == (2, 1, 0)


def test_repetition_features_known_values(spark):
    # tokens: a a a b → distinct 2/4; bigrams: [a a, a a, a b] → distinct 2/3
    df = _docs(spark, [(1, "a a a b")])
    r = repetition_features(df).head()
    assert r.dup_token_frac == pytest.approx(0.5)
    assert r.dup_bigram_frac == pytest.approx(1 - 2 / 3)
    assert r.top_bigram_frac == pytest.approx(2 / 3)


def test_repetition_no_repeats(spark):
    r = repetition_features(_docs(spark, [(1, "w x y z")])).head()
    assert r.dup_token_frac == 0.0
    assert r.dup_bigram_frac == 0.0
    assert r.top_bigram_frac == pytest.approx(1 / 3)


def test_contamination_flags_overlapping_doc(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _docs(spark, [
        # shares 3 distinct 3-grams with bench → contaminated
        (1, "alpha beta gamma delta epsilon zeta"),
        # shares only 1 → clean at min_hits=3
        (2, "alpha beta gamma nine ten eleven"),
        (3, "totally different words here now"),
    ])
    hits = {r.doc_id: r.n_hits
            for r in contamination(docs, bench, n=3, min_hits=3).collect()}
    assert hits == {1: 3}


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 0, "src1": 100, "src2": 50, "src3": 50}
    a = {r.doc_id for r in stratified_sample(df, rates).collect()}
    b = {r.doc_id for r in stratified_sample(df, rates).collect()}
    assert a == b  # no RNG — identical on re-run
    assert not any(i % 4 == 0 for i in a)       # rate 0 → nothing
    assert all(i in a for i in range(400) if i % 4 == 1)  # rate 100 → all
    n2 = sum(1 for i in a if i % 4 == 2)
    assert 20 <= n2 <= 80  # ~50% of 100, md5-uniform


def test_assign_shards_contiguous_positions(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = assign_shards(df, n_shards=4).collect()
    assert {r.shard for r in out} <= set(range(4))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_hash_bucket_range(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    vals = [r.b for r in df.select(hash_bucket("doc_id").alias("b")).collect()]
    assert all(0 <= v < 100 for v in vals)
    assert len(set(vals)) > 50  # spreads


def test_repetition_short_docs_no_crash(spark):
    df = _docs(spark, [(1, "single"), (2, ""), (3, "two tokens")])
    rows = {r.doc_id: r for r in repetition_features(df).collect()}
    assert rows[1].dup_bigram_frac == 0.0
    assert rows[2].dup_token_frac == 0.0
    assert rows[3].top_bigram_frac == 1.0


def test_contamination_short_docs_no_crash(spark):
    from melt_spark.functions.cleaning import ngram_set

    df = _docs(spark, [(1, "a b"), (2, ""), (3, "x y z w")])
    grams = ngram_set(df, n=3).collect()
    # only doc 3 is long enough to emit 3-grams
    assert {r.doc_id for r in grams} == {3}
    bench = _docs(spark, [(9, "x y z")])
    hits = contamination(df, bench, n=3, min_hits=1).collect()
    assert [(r.doc_id, r.n_hits) for r in hits] == [(3, 1)]


def test_incremental_dedup_idempotent_second_pass(spark, sf_dir):
    """After appending the first pass's 'new' fingerprints to the store,
    re-ingesting the same batch must mark EVERY doc store_dup — the
    resumability contract of the ingestion pipeline."""
    from pyspark.sql import functions as F

    from melt_spark.functions.dedup import incremental_exact_dedup
    from melt_spark.functions.text import fingerprint
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    store = (docs.filter(F.col("doc_id") % 3 != 0)
             .select(fingerprint("text").alias("fp"),
                     F.col("doc_id").alias("owner_id")))
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    first = incremental_exact_dedup(batch, store)
    verdicts = {r.verdict for r in first.collect()}
    assert "new" in verdicts  # non-degenerate fixture
    delta = (first.filter(F.col("verdict") == "new")
             .select("fp", F.col("doc_id").alias("owner_id")))
    second = incremental_exact_dedup(batch, store.unionByName(delta))
    assert second.filter(F.col("verdict") != "store_dup").count() == 0
    # every batch doc got exactly one verdict row in both passes
    assert first.count() == second.count() == batch.count()


def test_mixture_weights_invariants(spark, sf_dir):
    """Weights sum to 1; alpha=0.5 up-weights small sources vs
    proportional sampling and down-weights large ones; expected tokens
    sum to ~the corpus total."""
    from melt_spark.plans.pipeline_suite import q_mixture_weights

    rows = q_mixture_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    total = sum(r.n_tokens for r in rows)
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    assert smallest.weight > smallest.n_tokens / total
    assert largest.weight < largest.n_tokens / total
    est = sum(r.expected_tokens for r in rows)
    assert abs(est - total) <= len(rows)  # floor() slack only


def test_luhn_card_counts_contract(spark):
    """Luhn mod-10 over 13-19-digit runs: the public test PANs validate,
    off-by-one numbers don't, and the length gate treats a 20-digit run
    as ONE too-long candidate (split semantics, not a prefix match)."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import luhn_card_counts

    df = spark.createDataFrame([
        Row(doc_id=0, text="visa 4111111111111111 ok"),
        Row(doc_id=1, text="near 4111111111111112 no"),
        Row(doc_id=2, text="amex 378282246310005 and mc 5500005555555559"),
        Row(doc_id=3, text="short 12345 long 99999999999999999999"),
        Row(doc_id=4, text="no digits at all"),
    ])
    nc, nv = luhn_card_counts("text")
    got = {r.doc_id: (r.nc, r.nv) for r in
           df.select("doc_id", nc.alias("nc"), nv.alias("nv")).collect()}
    assert got == {0: (1, 1), 1: (1, 0), 2: (2, 2), 3: (0, 0), 4: (0, 0)}


def test_cluster_split_atomic_and_leak_counterfactual(spark):
    """Every near-dup cluster lands in ONE split; the naive-leak row
    counts clusters the per-doc hash split scatters. Hand graph: docs
    0-9, near-dup pairs chain {0,1,2} and {5,6}; the cluster split must
    put each chain wholly in one split regardless of where the members'
    own doc hashes point."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import cluster_split, hash_bucket

    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=10 + i) for i in range(10)])
    pairs = spark.createDataFrame(
        [Row(doc_a=0, doc_b=1), Row(doc_a=1, doc_b=2),
         Row(doc_a=5, doc_b=6)])
    out = cluster_split(docs, pairs).collect()
    rows = {r.split: r for r in out}
    leak = rows.pop("__naive_leak")
    assert sum(r.n_docs for r in rows.values()) == 10
    assert sum(r.n_clusters for r in rows.values()) == 7  # 10-3 merged
    assert sum(r.sum_chars for r in rows.values()) == sum(10 + i
                                                          for i in range(10))
    # counterfactual: recompute the naive split by hand and compare
    import hashlib

    def bucket(x):
        return int(hashlib.md5(f"split:{x}".encode())
                   .hexdigest()[:6], 16) % 100

    def split_of(b):
        return "test" if b < 5 else ("val" if b < 10 else "train")

    clusters = [[0, 1, 2], [5, 6]] + [[i] for i in (3, 4, 7, 8, 9)]
    leaky = [c for c in clusters
             if len({split_of(bucket(d)) for d in c}) > 1]
    assert leak.n_clusters == len(leaky)
    assert leak.n_docs == sum(len(c) for c in leaky)
    assert leak.sum_chars == -1
    # atomicity: each cluster's docs share the CLUSTER-id split
    for c in clusters:
        s = {split_of(bucket(min(c)))}
        assert len(s) == 1


def test_iban_mod97_validation(spark):
    """ISO 7064 mod-97: the ISO example IBAN validates, a one-digit
    corruption fails, shape gates (lowercase, short, no CC DD prefix)
    exclude candidacy entirely."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import iban_counts

    rows = [
        Row(doc_id=0, text="pay GB82WEST12345698765432 now"),   # valid
        Row(doc_id=1, text="pay GB82WEST12345698765433 now"),   # corrupt
        Row(doc_id=2, text="pay gb82west12345698765432 now"),   # lowercase
        Row(doc_id=3, text="pay DE4401 now"),                   # too short
        Row(doc_id=4, text="pay WESTGB8212345698765432 now"),   # bad shape
        Row(doc_id=5, text="DE89370400440532013000 ok"),        # valid DE
    ]
    nc, nv = iban_counts("text")
    out = {r.doc_id: (r.nc, r.nv)
           for r in spark.createDataFrame(rows)
           .select("doc_id", nc.alias("nc"), nv.alias("nv")).collect()}
    assert out[0] == (1, 1)
    assert out[1] == (1, 0)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)
    assert out[5] == (1, 1)


def test_decontam_span_hand_computed(spark):
    """Span accounting against a hand-built leak: a doc sharing a
    12-token prefix with the benchmark reports max_span 12 (5 shared
    8-gram starts); two DISJOINT shared 8-grams report span 8 with
    n_shared 2; a doc with no 8-token overlap reports nothing."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import decontam_span

    w = [f"w{i}" for i in range(30)]
    train = spark.createDataFrame([
        Row(doc_id=0, text=" ".join(w[:20])),        # 12-token prefix leak
        Row(doc_id=1, text=" ".join(
            w[:8] + ["x1", "x2", "x3"] + w[12:20])),  # two disjoint hits
        Row(doc_id=2, text=" ".join(reversed(w[:20]))),           # clean
    ])
    bench = spark.createDataFrame([
        Row(doc_id=100, text=" ".join(w[:12])),
        Row(doc_id=101, text=" ".join(w[12:20])),
    ])
    out = {r.doc_id: (r.n_shared, r.max_span_tokens)
           for r in decontam_span(train, bench, n=8).collect()}
    # starts 1..5 consecutive (prefix leak, 8+5-1=12) plus the isolated
    # w12..w19 hit at start 13 from the second bench doc
    assert out[0] == (6, 12)
    assert out[1] == (2, 8)       # w[:8] at start, w[12:20] at end
    assert 2 not in out


def test_gopher_gate_rule_order_and_thresholds(spark):
    """Each rule trips on its own crafted doc in the published order;
    a compliant doc passes."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import gopher_gate

    good = " ".join((["the", "be", "to", "of"] + ["word"] * 8) * 5)
    rows = [
        Row(doc_id=0, text=good),                                 # pass
        Row(doc_id=1, text="too short"),                          # rule 1
        Row(doc_id=2, text=" ".join(["ab"] * 60)),                # rule 2
        Row(doc_id=3, text=" ".join(
            (["there", "being", "words"] * 20) + ["#"] * 12)),    # rule 3
        Row(doc_id=4, text=" ".join(
            ["that", "have"] * 10 + ["12345"] * 40)),             # rule 4
        Row(doc_id=5, text=" ".join(["alpha", "words"] * 30)),    # rule 5
    ]
    out = {r.doc_id: (r.verdict, r.reason)
           for r in gopher_gate(spark.createDataFrame(rows),
                                min_words=8).collect()}
    assert out[0] == ("pass", "ok")
    assert out[1] == ("fail", "word_count")
    assert out[2] == ("fail", "mean_word_length")
    assert out[3] == ("fail", "symbol_ratio")
    assert out[4] == ("fail", "alpha_frac")
    assert out[5] == ("fail", "stopwords")


def test_corpus_gate_drop_reasons(spark):
    """The composite keep/drop gate (r11): structural Gopher failures,
    the stopword floor at its published value, and a Luhn-valid planted
    PAN each drop with their own first-failing reason; a compliant doc
    keeps. clean_corpus consumes exactly this expression."""
    from pyspark.sql import Row

    from melt_spark.functions.cleaning import corpus_gate

    good = " ".join((["the", "be", "to", "of"] + ["word"] * 8) * 5)
    rows = [
        Row(doc_id=0, text=good),                              # kept
        Row(doc_id=1, text="too short"),                       # word_count
        Row(doc_id=2, text=good + " 5500005555555559"),        # card_pii
        Row(doc_id=3, text=" ".join(["alpha", "words"] * 30)),  # stopwords
        Row(doc_id=4, text=good + " 5500005555555551"),        # bad Luhn ok
    ]
    out = {r.doc_id: (r.gate_reason, r.kept)
           for r in corpus_gate(spark.createDataFrame(rows),
                                min_words=8).collect()}
    assert out[0] == ("ok", 1)
    assert out[1] == ("word_count", 0)
    assert out[2] == ("card_pii", 0)
    assert out[3] == ("stopwords", 0)
    assert out[4] == ("ok", 1)
    # the floor-0 calibration clean_corpus runs: stopword rule off,
    # everything else intact
    out0 = {r.doc_id: r.gate_reason
            for r in corpus_gate(spark.createDataFrame(rows),
                                 min_words=8,
                                 min_stop_hits=0).collect()}
    assert out0[3] == "ok" and out0[1] == "word_count" \
        and out0[2] == "card_pii"


def test_gopher_gate_null_text_fails_loudly(spark):
    """A NULL text row must FAIL with reason 'null_text' — without the
    explicit leading branch every rule comparison is NULL and the
    when-chain falls through to 'ok' (r11 ADVICE fix)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from melt_spark.functions.cleaning import gopher_gate

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    df = spark.createDataFrame([(0, None), (1, "the be to of "
                                            + "word " * 20)], schema)
    out = {r.doc_id: (r.verdict, r.reason)
           for r in gopher_gate(df, min_words=8).collect()}
    assert out[0] == ("fail", "null_text")
    assert out[1] == ("pass", "ok")
