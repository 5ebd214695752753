"""Fixed-vocabulary re-probe of nb_classify (round-5 verdict item #5).

The 64x probe recorded nb_classify at 78x (the only super-linear row) and
attributed it to the replication scheme, not the operator: scale_probe's
replicate() salts every 3rd token with a per-replica suffix so replicas
are not near-dups, which is right for dedup probes but grows the token
VOCABULARY ~64x — and the NB model table is labels x vocab, so the model
build, the broadcast-side of scoring, and the smoothing denominator all
grow with replication in a way real corpus growth (vocab ~ Heaps' law,
sublinear) never would.

This probe isolates the attribution: replicate documents N x VERBATIM
(shifted doc_ids, untouched text — vocabulary exactly constant, model
table exactly constant-size) and time the same q_nb_classify constituent.
If the operator itself is linear, the fixed-vocab ratio should land at or
under ~N on fixed cores; if it stays ~78x the attribution was wrong and
the operator needs a real fix.

Verbatim replication is safe HERE because NB never forms document pairs —
the duplicate-multiplicity quadratic that forbids verbatim replicas for
dedup probes (see replicate()'s docstring) does not apply to a
train+score aggregation.

Usage: python tools/probe_nb_fixed_vocab.py [N] [sf_dir]
Writes docs/NB_FIXED_VOCAB.json and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def replicate_verbatim(spark, sf_dir: str, out_dir: str, n: int) -> None:
    """documents replicated n x with shifted doc_ids and UNSALTED text."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    reps = spark.range(n).select(F.col("id").alias("rep"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).head()[0] + 1
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
             "text", "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))


def vocab_size(spark, sf_dir: str) -> int:
    """Distinct whitespace tokens — the NB model's row count per label."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .agg(F.count_distinct("tok")).head()[0])


def time_nb(spark, sf_dir: str, runs: int) -> float:
    from melt_spark.plans.pipeline_suite import q_nb_classify

    best = None
    for _ in range(runs):
        t0 = time.time()
        (q_nb_classify(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    return round(best, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    big_dir = f"/tmp/nb_fixed_vocab_{n}x"

    from melt_spark.session import get_spark

    spark = get_spark("nb-fixed-vocab-probe")
    if not Path(big_dir, "documents.parquet").exists():
        replicate_verbatim(spark, sf_dir, big_dir, n)

    base_sec = time_nb(spark, sf_dir, runs=2)
    big_sec = time_nb(spark, big_dir, runs=1)

    result = {
        "n": n,
        "base_sec": base_sec,
        "fixed_vocab_sec": big_sec,
        "fixed_vocab_ratio": round(big_sec / base_sec, 2),
        "vocab_base": vocab_size(spark, sf_dir),
        "vocab_fixed": vocab_size(spark, big_dir),
        "salted_recorded": {"base_sec": 5.46, "big_sec": 427.88,
                            "ratio": 78.37,
                            "source": "docs/SCALING_64x.md (r5)"},
    }
    docs = Path(__file__).resolve().parent.parent / "docs"
    (docs / "NB_FIXED_VOCAB.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
