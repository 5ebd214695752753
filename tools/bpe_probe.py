"""BPE merge-round cost probe (r4 verdict item 5): run 32 merge rounds
with eager per-round checkpointing on BOTH the sf0.1 corpus and the 16×
replicated corpus, timing every round. The claim under test: after
round 1 builds the word-frequency table, per-round cost is bound by the
VOCABULARY (the words table), not the corpus — so the per-round curve
should be ~flat across rounds and ~equal between 1× and 16× corpora
(their vocabularies nearly coincide; the 16× replica salting only adds
suffixed token variants).

Usage: python tools/bpe_probe.py [rounds] [sf_dir] [big_dir]
Writes docs/BPE_ROUNDS.json (rendered into docs/SCALING.md by
tools/scale_probe.py) and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def timed_rounds(spark, sf_dir: str, rounds: int) -> dict:
    """Per-round seconds for `rounds` BPE merges, each round forced with
    an eager localCheckpoint (which production training needs anyway at
    these round counts — the checkpoint IS the forcing point, so the
    timings measure real per-round work, not lazy plan stacking)."""
    from melt_spark.functions.bpe import _merge_fold, _pair_counts, word_freqs
    from melt_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    words = word_freqs(docs, "text").localCheckpoint(eager=True)
    setup = round(time.perf_counter() - t0, 3)
    vocab = words.count()

    sentinel = spark.createDataFrame([("", "", -1)],
                                     "s1 string, s2 string, n long")
    per_round = []
    for _r in range(1, rounds + 1):
        t0 = time.perf_counter()
        best = (_pair_counts(words).unionByName(sentinel)
                .orderBy(F.desc("n"), F.asc("s1"), F.asc("s2")).limit(1))
        bst = F.broadcast(best.select(F.col("s1").alias("_a"),
                                      F.col("s2").alias("_b")))
        words = (words.crossJoin(bst)
                 .select("word", "freq",
                         _merge_fold(F.col("syms"), F.col("_a"),
                                     F.col("_b")).alias("syms"))
                 .localCheckpoint(eager=True))
        per_round.append(round(time.perf_counter() - t0, 3))
    return {"setup_sec": setup, "vocab_words": vocab,
            "per_round_sec": per_round,
            "round_mean_sec": round(sum(per_round) / len(per_round), 3),
            "rounds_1_4_mean": round(sum(per_round[:4]) / 4, 3),
            "rounds_29_32_mean": round(sum(per_round[-4:]) / 4, 3)}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    big_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_probe_16x"

    from melt_spark.session import get_spark
    spark = get_spark("bpe-probe")

    out = {"rounds": rounds, "base": timed_rounds(spark, sf_dir, rounds)}
    if Path(big_dir, "documents.parquet").exists():
        out["big16x"] = timed_rounds(spark, big_dir, rounds)
    (ROOT / "docs" / "BPE_ROUNDS.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
