"""int8 overscan recall curve (r10 verdict next-round #6): measured
recall@10 (avg in_exact over the returned top-10) of the SQ8-style
scan+rerank at overscan 2 / 4 / 8, on the replicated corpus the 64x
scaling probes use — the tuning table a user consults before widening
the quantizer. Timings for the same three points live in
docs/SCALING_64x.json (int8_over2 / ann_int8_rerank / int8_over8); this
records the QUALITY axis beside them.

Usage: python tools/int8_recall_probe.py [corpus_dir]
       (default /tmp/scale_probe_64x; falls back to /root/testdata/sf0.1)
Appends {"int8_recall": {...}} into docs/SCALING_64x.json and prints one
JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_64x"
    if not Path(corpus_dir, "embeddings.parquet").exists():
        corpus_dir = "/root/testdata/sf0.1"

    from melt_spark.functions.similarity import int8_rerank_topk
    from melt_spark.session import get_spark
    from melt_spark.sources.parquet import read_table

    spark = get_spark("int8-recall-probe")
    emb = read_table(spark, corpus_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).limit(5)

    out: dict[str, dict] = {}
    for overscan in (2, 4, 8):
        t0 = time.time()
        r = (int8_rerank_topk(emb, queries, k=10, overscan=overscan)
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg("in_exact").alias("recall")).head())
        out[str(overscan)] = {"recall": round(float(r["recall"]), 4),
                              "n_results": int(r["n"]),
                              "sec": round(time.time() - t0, 2)}

    state_path = (Path(__file__).resolve().parent.parent / "docs"
                  / "SCALING_64x.json")
    state = json.loads(state_path.read_text())
    state["int8_recall"] = {"corpus": corpus_dir, "by_overscan": out}
    state_path.write_text(json.dumps(state, indent=1))
    print(json.dumps({"int8_recall": out, "corpus": corpus_dir}))


if __name__ == "__main__":
    main()
