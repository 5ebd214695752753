"""Chunking + sequence packing (functions/packing.py)."""

import pyspark.sql.functions as F
import pytest

from melt_spark.functions.packing import chunk_docs, pack_sequences

pytestmark = pytest.mark.usefixtures("spark")


def test_chunk_docs_windows(spark):
    text = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_docs(df, size=4, stride=3).collect(),
                  key=lambda r: r.chunk_id)
    # chunks: [1..4], [4..7], [7..10]
    assert [r.chunk_id for r in rows] == [1, 2, 3]
    assert [r.n_tokens for r in rows] == [4, 4, 4]
    assert len({r.chunk_fp for r in rows}) == 3


def test_chunk_docs_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunk_docs(df, size=4, stride=3).collect()
    assert len(rows) == 1
    assert rows[0].n_tokens == 2


def test_pack_sequences_greedy(spark):
    # one group; token counts 4,5,3,12,2 with budget 10:
    # doc0+doc16 fill 9 → doc32 overflows → pack1; oversized doc48 alone;
    # doc64 opens the next pack after the oversized one
    docs = [(i * 16, " ".join(["w"] * n))
            for i, n in enumerate([4, 5, 3, 12, 2])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(pack_sequences(df, budget=10, n_groups=16).collect(),
                  key=lambda r: r.doc_id)
    assert [r.grp for r in rows] == [0] * 5
    assert [r.pack_id for r in rows] == [0, 0, 1, 2, 3]
    assert [r.pack_pos for r in rows] == [1, 2, 1, 1, 1]
    assert [r.n_tokens for r in rows] == [4, 5, 3, 12, 2]


def test_pack_sequences_groups_independent(spark):
    docs = [(i, " ".join(["w"] * 5)) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pack_sequences(df, budget=10, n_groups=2).collect()
    # 4 docs per group, 2 per pack
    for r in rows:
        assert r.pack_id in (0, 1)
        assert r.pack_pos in (1, 2)
