"""Bigram LM scoring (functions/lm.py) and exact-phrase retrieval
(functions/retrieval.py phrase_match): semantic checks beyond the hash."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.functions.lm import lm_score
from melt_spark.functions.retrieval import phrase_match
from melt_spark.sources.parquet import read_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_predictable_text_scores_lower_nll(spark):
    """A document made of the corpus's dominant repeated bigram must be
    less surprising (lower avg NLL / ppl) than one of rare transitions."""
    texts = (["the cat sat on the mat"] * 8
             + ["the cat sat on the mat " * 3]
             + ["zebra quark welds oboe nymph"])
    out = {r.doc_id: r for r in lm_score(_docs(spark, texts)).collect()}
    predictable, surprising = out[8], out[9]
    assert predictable.avg_nll < surprising.avg_nll
    assert predictable.ppl < surprising.ppl


def test_short_doc_sentinel(spark):
    out = {r.doc_id: r for r in
           lm_score(_docs(spark, ["solo", "two words"])).collect()}
    assert out[0].n_bigrams == 0 and out[0].avg_nll == -1.0 \
        and out[0].ppl == -1.0
    assert out[1].n_bigrams == 1 and out[1].avg_nll > 0


def test_empty_model_error_sentinel(spark):
    """Scoring under an EMPTY frozen model (store had no >=2-token doc)
    must emit the DISTINCT -2.0 sentinel, not collide with the -1.0
    'no bigrams' one (r11 ADVICE fix)."""
    from melt_spark.functions.lm import bigram_model, lm_score_store

    empty_model = bigram_model(_docs(spark, ["solo"]))
    batch = _docs(spark, ["two words here", "solo"])
    out = {r.doc_id: r for r in
           lm_score_store(batch, empty_model).collect()}
    assert out[0].n_bigrams == 2 and out[0].avg_nll == -2.0
    assert out[1].n_bigrams == 0 and out[1].avg_nll == -1.0


def test_every_fixture_doc_scored_once(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = lm_score(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # self-perplexity on a finite corpus is strictly positive
    assert out.filter((F.col("n_bigrams") > 0)
                      & (F.col("avg_nll") <= 0)).count() == 0


def test_phrase_match_against_python_reference(spark, sf_dir):
    """Spark result == a plain-Python scan of the same corpus."""
    phrase = ("table", "scan")
    docs = read_table(spark, sf_dir, "documents")
    got = {r.doc_id: (r.n_matches, r.first_pos)
           for r in phrase_match(docs, phrase).collect()}
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        starts = [i + 1 for i in range(len(toks) - len(phrase) + 1)
                  if tuple(toks[i:i + len(phrase)]) == phrase]
        if starts:
            want[r.doc_id] = (len(starts), starts[0])
    assert got == want and want  # non-trivial on the fixture


def test_phrase_shorter_than_doc_guard(spark):
    """Docs shorter than the phrase: no row, no sequence() descent."""
    docs = _docs(spark, ["a", "a b", "a b c", "x a b c y"])
    got = {r.doc_id: r.n_matches
           for r in phrase_match(docs, ("a", "b", "c")).collect()}
    assert got == {2: 1, 3: 1}


def test_phrase_empty_raises(spark):
    with pytest.raises(ValueError):
        phrase_match(_docs(spark, ["x"]), ())


def test_ccnet_buckets_exact_terciles(spark):
    """Per group: head/middle/tail are exact thirds of the ranked valid
    docs (rn*3 vs n integer cut); bigram-less docs bucket 'skip'."""
    from pyspark.sql import Row

    from melt_spark.functions.lm import ccnet_buckets

    rows = []
    for i in range(9):                       # 9 valid docs in group 'a'
        rows.append(Row(doc_id=i, source="a",
                        text=" ".join(["w%d" % (j % (i + 2))
                                       for j in range(6)])))
    rows.append(Row(doc_id=99, source="a", text="solo"))   # 1 token
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r.bucket for r in ccnet_buckets(df).collect()}
    assert out[99] == "skip"
    from collections import Counter
    c = Counter(v for k, v in out.items() if k != 99)
    assert c == {"head": 3, "middle": 3, "tail": 3}


def test_ccnet_hatch_matches_window_ranks(spark, sf_dir):
    """r10 scale hatch (VERDICT r9 #1): the global_order_scan tercile cut
    must be BIT-IDENTICAL to the naive per-group rank window it replaced
    — same discipline as mann_whitney's fine-buckets-≡-exact pin. Runs on
    the real fixture (multi-source) so group boundaries inside and across
    range partitions are both exercised."""
    from pyspark.sql.window import Window

    from melt_spark.functions.lm import ccnet_buckets, lm_score

    docs = read_table(spark, sf_dir, "documents")
    got = {(r.doc_id): (r.source, r.bucket)
           for r in ccnet_buckets(docs).collect()}

    scored = lm_score(docs)
    j = scored.join(docs.select("doc_id", F.col("source").alias("grp")),
                    "doc_id")
    valid = j.filter(F.col("n_bigrams") > 0)
    w = Window.partitionBy("grp").orderBy("avg_nll", "doc_id")
    wc = Window.partitionBy("grp")
    naive = (valid.withColumn("rn", F.row_number().over(w))
             .withColumn("n", F.count(F.lit(1)).over(wc)))
    bucket = (F.when(F.col("rn") * 3 <= F.col("n"), F.lit("head"))
              .when(F.col("rn") * 3 <= 2 * F.col("n"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    want = {r.doc_id: (r.grp, r.b)
            for r in naive.select("doc_id", "grp",
                                  bucket.alias("b")).collect()}
    want.update({r.doc_id: (r.grp, "skip")
                 for r in j.filter(F.col("n_bigrams") == 0)
                 .select("doc_id", "grp").collect()})
    assert got == want and len(got) == docs.count()


def test_ccnet_hatch_all_one_source(spark):
    """Worst case for the old window: EVERY doc in one group. The hatch
    must still cut exact terciles (range shuffle splits the group; the
    per-group rank reconstruction is offset arithmetic)."""
    from collections import Counter

    from melt_spark.functions.lm import ccnet_buckets

    rows = [Row(doc_id=i, source="onehot",
                text=" ".join("w%d" % (j % (i % 17 + 2))
                              for j in range(8)))
            for i in range(300)]
    out = ccnet_buckets(spark.createDataFrame(rows)).collect()
    c = Counter(r.bucket for r in out)
    assert c == {"head": 100, "middle": 100, "tail": 100}


def test_kn_score_matches_hand_model(spark):
    """Interpolated KN on a hand corpus: stats and the per-doc mean NLL
    recomputed in Python (same D = 0.75, same fold order)."""
    import math

    from melt_spark.functions.lm import kn_score

    texts = ["a b a b", "a b c"]
    df = _docs(spark, texts)
    # corpus bigrams: d0: (a b)x2... wait per doc: d0: ab, ba, ab; d1: ab, bc
    from collections import Counter
    big = []
    for t in texts:
        ts = t.split()
        big += [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
    c2 = Counter(big)
    c1 = Counter(w1 for w1, _ in big)
    n1f = Counter(w1 for (w1, _w2) in c2)
    n1b = Counter(w2 for (_w1, w2) in c2)
    T = len(c2)

    def p(w1, w2):
        return ((c2[(w1, w2)] - 0.75) / c1[w1]
                + 0.75 * n1f[w1] / c1[w1] * (n1b[w2] / T))

    want = {}
    for i, t in enumerate(texts):
        ts = t.split()
        nlls = [-math.log(p(ts[j], ts[j + 1])) for j in range(len(ts) - 1)]
        s = 0.0
        for x in nlls:
            s += x
        want[i] = round(s / len(nlls), 9)
    got = {r.doc_id: r.avg_nll_kn for r in kn_score(df).collect()}
    assert got == want


def test_kn_score_short_doc_sentinel(spark):
    from melt_spark.functions.lm import kn_score

    out = {r.doc_id: (r.avg_nll_kn, r.ppl_kn)
           for r in kn_score(_docs(spark, ["solo", "a b", "a c"])).collect()}
    assert out[0] == (-1.0, -1.0)
    assert out[1][0] > 0 and out[2][0] > 0


def test_ccnet_assign_frozen_boundaries(spark):
    """Batch-vs-store: a store doc's twin (same text) must land in the
    SAME bucket the store gave it (score equal under the frozen model,
    boundary comparison inclusive); a doc made of entirely novel tokens
    scores the unseen-context backoff ln(V) on every bigram and lands
    tail-ward; bigram-less docs skip."""
    from melt_spark.functions.lm import ccnet_assign, ccnet_buckets

    store_rows = []
    for i in range(12):
        store_rows.append(
            Row(doc_id=i, source="s",
                text=" ".join("w%d" % (j % (i % 6 + 2))
                              for j in range(8))))
    store = spark.createDataFrame(store_rows)
    store_buckets = {r.doc_id: r.bucket
                     for r in ccnet_buckets(store).collect()}

    # twins of store docs 0..11, plus a fully-novel doc and a 1-token doc
    batch_rows = [
        Row(doc_id=100 + i, source="s",
            text=" ".join("w%d" % (j % (i % 6 + 2)) for j in range(8)))
        for i in range(12)]
    batch_rows.append(Row(doc_id=200, source="s",
                          text="zq1 zq2 zq3 zq4"))
    batch_rows.append(Row(doc_id=201, source="s", text="solo"))
    batch = spark.createDataFrame(batch_rows)

    got = {r.doc_id: r.bucket
           for r in ccnet_assign(batch, store).collect()}
    for i in range(12):
        assert got[100 + i] == store_buckets[i], (i, got[100 + i])
    assert got[200] == "tail"
    assert got[201] == "skip"


def test_ccnet_store_persist_resume(spark, tmp_path):
    """The frozen-store READ path (r11): ccnet_apply over model+bounds
    RE-READ from parquet must match the in-plan ccnet_assign exactly,
    and re-persisting (overwrite — the daily resume shape) must be
    idempotent."""
    from melt_spark.functions.lm import (ccnet_apply, ccnet_assign,
                                         ccnet_store_model)

    store = _docs(spark, ["a b a c a b", "b c b a b c", "c a c b c a",
                          "a a b b c c", "b a c a b a"]) \
        .withColumn("source", F.lit("s"))
    batch = _docs(spark, ["a b novel1 c", "novel2 novel3", "solo"]) \
        .withColumn("doc_id", F.col("doc_id") + 500) \
        .withColumn("source", F.lit("s"))
    want = sorted(map(tuple, ccnet_assign(batch, store).collect()))

    model, bounds = ccnet_store_model(store)
    for _round in range(2):   # overwrite twice: the resume shape
        model.write.mode("overwrite").parquet(str(tmp_path / "model"))
        bounds.write.mode("overwrite").parquet(str(tmp_path / "bounds"))
    got = sorted(map(tuple, ccnet_apply(
        batch,
        spark.read.parquet(str(tmp_path / "model")),
        spark.read.parquet(str(tmp_path / "bounds"))).collect()))
    assert got == want
