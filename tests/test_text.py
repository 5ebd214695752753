

def test_pretoken_fertility_hand_counts(spark):
    """Exact counts on a hand corpus: fertility ratios recomputed in
    Python with the same e6 half-up quantization."""
    import math
    import re

    from pyspark.sql import Row

    from melt_spark.functions.text import (GPT2_PRETOKEN_REGEX,
                                           pretoken_fertility)

    texts = {"a": ["don't stop now", "x9y 42 ok!"],
             "b": ["hello hello"]}
    rows, i = [], 0
    for src, ts in texts.items():
        for t in ts:
            rows.append(Row(doc_id=i, source=src, text=t)); i += 1
    out = {r.source: r for r in
           pretoken_fertility(spark.createDataFrame(rows)).collect()}
    for src, ts in texts.items():
        npt = sum(len(re.findall(GPT2_PRETOKEN_REGEX, t)) for t in ts)
        nw = sum(len(t.split(" ")) for t in ts)
        nc = sum(len(t) for t in ts)
        r = out[src]
        assert (r.n_docs, r.n_pretokens, r.n_words, r.n_chars) == \
            (len(ts), npt, nw, nc)
        assert r.ppw_e6 == math.floor(npt / nw * 1e6 + 0.5)
        assert r.cpp_e6 == math.floor(nc / npt * 1e6 + 0.5)
