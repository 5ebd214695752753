

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
