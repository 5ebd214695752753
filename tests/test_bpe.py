"""BPE training (functions/bpe.py): greedy-merge semantics and the
segmentation invariant."""

from pyspark.sql import Row

from melt_spark.functions.bpe import bpe_train
from melt_spark.sources.parquet import read_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_learns_the_dominant_pair_first(spark):
    """'abab' x 10 + 'cd' x 1: round 1 must merge (a,b) — count 20 beats
    everything; round 2 merges the resulting (ab, ab)."""
    merges, words = bpe_train(
        _docs(spark, ["abab abab abab abab abab",
                      "abab abab abab abab abab cd"]), rounds=2)
    m = {r.round: (r.s1, r.s2, r.n) for r in merges.collect()}
    assert m[1] == ("a", "b", 20)
    assert m[2] == ("ab", "ab", 10)
    seg = {r.word: r.seg for r in words.collect()}
    assert seg["abab"] == "abab"
    assert seg["cd"] == "c|d"


def test_greedy_run_handling(spark):
    """'aaa' with merge (a,a): greedy left-to-right gives [aa, a] — the
    fold must not merge the freshly-merged 'aa' with the trailing 'a'."""
    merges, words = bpe_train(_docs(spark, ["aaa aaa"]), rounds=1)
    [m] = merges.collect()
    assert (m.s1, m.s2) == ("a", "a")
    [w] = words.collect()
    assert w.seg == "aa|a" and w.n_syms == 2


def test_segmentation_reconstructs_word(spark, sf_dir):
    """Removing the '|' separators from every segmentation must give the
    original word back, and n_syms matches the segment count."""
    docs = read_table(spark, sf_dir, "documents")
    _, words = bpe_train(docs, rounds=3)
    rows = words.collect()
    assert rows
    for r in rows:
        assert r.seg.replace("|", "") == r.word
        assert r.n_syms == r.seg.count("|") + 1
        assert r.n_syms <= len(r.word)
