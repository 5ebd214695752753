"""Property-based checks (hypothesis) of the engine's core invariants:

1. latest_state == a naive single-threaded fold (the reference's
   merge-seq-entry semantics, melt.clj:307-323) for ANY changelog.
2. sync is self-healing: applying sync_plan(diff) always yields a clean
   diff (the reference's integration suite checks one scenario; the
   property holds for all states).

Kept to few, small examples — each example is a Spark job.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from melt_spark.operators.diff import diff, diff_matches
from melt_spark.operators.latest_state import latest_state
from melt_spark.operators.sync import sync_plan

KEYS = ["k1", "k2", "k3"]
VALUES = [None, "a", "b", "c"]

records = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)),
    min_size=0, max_size=12)

state_maps = st.dictionaries(st.sampled_from(KEYS),
                             st.sampled_from(["a", "b", "c"]),
                             max_size=3)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from melt_spark.session import get_spark
        _spark = get_spark("melt-spark-tests", master="local[4]",
                           extra_conf={"spark.sql.shuffle.partitions": "4"})
    return _spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(records)
def test_latest_state_equals_naive_fold(recs):
    spark = _get_spark()
    rows = [("t", k, i, v) for i, (k, v) in enumerate(recs)]
    naive: dict[str, str] = {}
    for _t, k, _o, v in rows:          # offset order == list order
        if v is None:
            naive.pop(k, None)
        else:
            naive[k] = v

    if not rows:
        return
    df = spark.createDataFrame(
        rows, "topic string, key string, offset long, value string")
    got = {r["key"]: r["value"] for r in latest_state(df).collect()}
    assert got == naive


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(records, st.integers(min_value=0, max_value=12))
def test_incremental_refresh_equals_full_compaction(recs, split):
    """T5 invariant: compact(prefix) + fold(suffix) == compact(all), for
    ANY changelog and ANY split point."""
    from melt_spark.operators.latest_state import incremental_refresh

    spark = _get_spark()
    rows = [("t", k, i, v) for i, (k, v) in enumerate(recs)]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "topic string, key string, offset long, value string")
    full = {r["key"]: (r["offset"], r["value"])
            for r in latest_state(df).collect()}
    prior = latest_state(df.filter(f"offset < {split}"),
                         drop_tombstones=False)
    delta = df.filter(f"offset >= {split}")
    inc = {r["key"]: (r["offset"], r["value"])
           for r in incremental_refresh(prior, delta).collect()}
    assert inc == full


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(state_maps, state_maps)
def test_sync_always_heals(src_state, top_state):
    spark = _get_spark()

    def msgs(state):
        rows = [("t", k, v) for k, v in sorted(state.items())]
        return spark.createDataFrame(
            rows, "topic string, key string, value string")

    src, top = msgs(src_state), msgs(top_state)
    repair = {(r["key"]): r["value"]
              for r in sync_plan(diff(src, top)).collect()}

    healed = dict(top_state)
    for k, v in repair.items():
        if v is None:
            healed.pop(k, None)
        else:
            healed[k] = v
    assert healed == src_state
    # and the healed topic now diffs clean
    assert diff_matches(diff(src, msgs(healed)))


# span dedup: the surviving spans across the whole output corpus are exactly
# the DISTINCT spans of the input corpus, each appearing exactly once
span_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9)
      .map(" ".join),
    min_size=1, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(span_docs)
def test_span_dedup_output_spans_are_distinct_input_spans(texts):
    from melt_spark.functions.dedup import span_dedup

    spark = _get_spark()
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = span_dedup(df, k=2).collect()

    def spans(t, k=2):
        toks = t.split(" ")
        return [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]

    in_spans = [s for t in texts for s in spans(t)]
    out_spans = [s for r in out if r["text_dedup"]
                 for s in spans(r["text_dedup"])]
    assert sorted(out_spans) == sorted(set(in_spans))
    for r in out:
        assert r["n_kept"] + r["n_removed"] == r["n_spans"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(span_docs)
def test_span_dedup_digest_and_text_paths_agree(texts):
    """The digest-shuffle scale path (window on md5(span), losers-only
    reassembly) must produce row-identical output to the raw-text window
    path on any corpus — same survivors, same reassembled text, same
    counts."""
    from melt_spark.functions.dedup import span_dedup

    spark = _get_spark()
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    by_digest = {r["doc_id"]: (r["text_dedup"], r["n_spans"], r["n_kept"],
                               r["n_removed"])
                 for r in span_dedup(df, k=2, via="digest").collect()}
    by_text = {r["doc_id"]: (r["text_dedup"], r["n_spans"], r["n_kept"],
                             r["n_removed"])
               for r in span_dedup(df, k=2, via="text").collect()}
    assert by_digest == by_text


# -- winnowing guarantee (Schleimer-Wilkerson-Aiken SIGMOD 2003 thm):
# any shared token run of length >= w + k - 1 forces a shared selected
# fingerprint. Random docs + a planted shared run; also cross-checks the
# whole selection against a plain-Python winnower.

def _py_winnow(text: str, k: int = 4, w: int = 5):
    import hashlib
    toks = text.split(" ")
    grams = [(i + 1,
              int(hashlib.md5(" ".join(toks[i:i + k]).encode())
                  .hexdigest()[:12], 16))
             for i in range(len(toks) - k + 1)]
    if not grams:
        return set()
    if len(grams) < w:
        windows = [grams]
    else:
        windows = [grams[j:j + w] for j in range(len(grams) - w + 1)]
    picks = set()
    for win in windows:
        best = win[0]
        for g in win[1:]:
            if g[1] <= best[1]:
                best = g
        picks.add(best)
    return picks


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(0, 6), min_size=0, max_size=18),
       st.lists(st.integers(0, 6), min_size=0, max_size=18),
       st.integers(0, 5))
def test_winnow_matches_python_and_guarantee(pre, post, run_seed):
    from pyspark.sql import Row

    from melt_spark.functions.text import winnow_fingerprints

    spark = _get_spark()
    shared = [f"s{run_seed}x{i}" for i in range(8)]   # w + k - 1 tokens
    t1 = " ".join([f"p{x}" for x in pre] + shared)
    t2 = " ".join(shared + [f"q{x}" for x in post])
    df = spark.createDataFrame([Row(doc_id=1, text=t1),
                                Row(doc_id=2, text=t2)])
    got = {}
    for r in winnow_fingerprints(df, k=4, w=5).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    assert got.get(1, set()) == _py_winnow(t1)
    assert got.get(2, set()) == _py_winnow(t2)
    fp1 = {fp for _, fp in got.get(1, set())}
    fp2 = {fp for _, fp in got.get(2, set())}
    assert fp1 & fp2, "shared 8-token run must share a fingerprint"
