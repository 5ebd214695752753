

def test_int8_rerank_recall_and_contract(spark):
    """int8 scan + rerank: k rows per query with ranks 1..k, in_exact is
    0/1, and on well-separated vectors the 4x overscan recovers the
    exact top-k completely (recall 1.0 — SQ8 error is far below the
    neighbor gaps here)."""
    import math

    from pyspark.sql import Row

    from melt_spark.functions.similarity import int8_rerank_topk

    rows = [Row(vec_id=i,
                embedding=[math.cos(0.37 * i + 0.1 * j) for j in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows)
    out = int8_rerank_topk(
        df, df.filter(df.vec_id < 2).limit(2), k=5, overscan=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.in_exact in (0, 1)
    assert set(by_q) == {0, 1}
    for v in by_q.values():
        assert sorted(r.rank for r in v) == [1, 2, 3, 4, 5]
        assert all(r.in_exact == 1 for r in v)   # full recall here


def test_embedding_drift_detects_planted_shift(spark):
    """Identical halves drift ~0 (cos_e9 = 1e9, l2 ~ 0); a planted
    constant offset on the candidate half moves the readouts; the
    counts certify the parity split."""
    from pyspark.sql import Row

    from melt_spark.functions.similarity import embedding_drift

    base = [[0.1 * ((i + j) % 7) - 0.3 for j in range(4)]
            for i in range(8)]
    same = [Row(vec_id=i, label="a", embedding=base[(i // 2) % 8])
            for i in range(16)]
    out = {r.label: r for r in
           embedding_drift(spark.createDataFrame(same), dim=4).collect()}
    r = out["a"]
    assert (r.n_ref, r.n_cand) == (8, 8)
    assert r.centroid_cos_e9 == 10**9
    assert r.l2_shift_e9 == 0

    shifted = [Row(vec_id=i, label="b",
                   embedding=[x + (0.5 if i % 2 else 0.0)
                              for x in base[(i // 2) % 8]])
               for i in range(16)]
    r2 = embedding_drift(spark.createDataFrame(shifted),
                         dim=4).collect()[0]
    assert r2.centroid_cos_e9 < 10**9
    # planted offset of 0.5 on every dim of the candidate centroid:
    # l2 = sqrt(4 * 0.5^2) = 1.0
    assert abs(r2.l2_shift_e9 - 10**9) <= 1
