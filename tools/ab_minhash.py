"""Same-session A/B of the MinHash signature min type: STRING (hex-chunk
lexicographic min, plans as SortAggregate) vs BIGINT (conv(chunk,16,10)
cast bigint, plans as HashAggregate). Both orders are identical (fixed-
width lowercase hex compares as its numeric value), so outputs match —
this probe measures cost only.

Runs alternate B/A/B/A... in ONE SparkSession so box drift cancels.
Measures (a) the isolated signature pass and (b) the full
q_dedup_minhash_lsh entry, both noop-forced, at the given SF.

Usage: python tools/ab_minhash.py [--sf DIR] [--runs N] [--mult M]
  --mult M: union the docs frame M times with id offsets (scale-up probe).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

import melt_spark.functions.dedup as D  # noqa: E402
from melt_spark.plans import pipeline_suite as P  # noqa: E402
from melt_spark.session import get_spark  # noqa: E402


def _col_string(seed: int):
    group, chunk = seed // 4, seed % 4
    digest = F.md5(F.concat(F.lit(f"{group}|"), F.col("shingle")))
    return F.min(F.substring(digest, chunk * 8 + 1, 8))


def _col_bigint(seed: int):
    group, chunk = seed // 4, seed % 4
    digest = F.md5(F.concat(F.lit(f"{group}|"), F.col("shingle")))
    return F.min(F.conv(F.substring(digest, chunk * 8 + 1, 8),
                        16, 10).cast("bigint"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    mult = 1
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--mult" in args:
        mult = int(args[args.index("--mult") + 1])

    from melt_spark.plans.pipeline_suite import read_table

    spark = get_spark("ab-minhash")
    docs = read_table(spark, sf_dir, "documents")
    if mult > 1:
        parts = [docs.withColumn("doc_id",
                                 F.concat(F.lit(f"m{i}_"), F.col("doc_id")))
                 for i in range(mult)]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        docs = base.localCheckpoint()

    def sig_pass(variant):
        old = D._minhash_col
        D._minhash_col = variant
        try:
            sig = D.minhash_signatures(docs)
        finally:
            D._minhash_col = old
        return sig

    def entry(variant):
        old = D._minhash_col
        D._minhash_col = variant
        try:
            df = P.q_dedup_minhash_lsh(spark, sf_dir)
        finally:
            D._minhash_col = old
        return df

    # Warm both variants once (JIT, file listing).
    for tag, v in (("warmS", _col_string), ("warmB", _col_bigint)):
        spark.sparkContext.setJobDescription(tag)
        _noop(sig_pass(v))

    res = {"sig": {"string": [], "bigint": []},
           "entry": {"string": [], "bigint": []}}
    order = [("bigint", _col_bigint), ("string", _col_string)]
    for r in range(runs):
        for name, v in order:
            spark.sparkContext.setJobDescription(f"sig:{name}:{r}")
            t0 = time.perf_counter()
            _noop(sig_pass(v))
            res["sig"][name].append(round(time.perf_counter() - t0, 3))
        order.reverse()
    if mult == 1:
        for r in range(runs):
            for name, v in order:
                spark.sparkContext.setJobDescription(f"entry:{name}:{r}")
                t0 = time.perf_counter()
                _noop(entry(v))
                res["entry"][name].append(round(time.perf_counter() - t0, 3))
            order.reverse()

    summary = {k: {n: (min(t) if t else None) for n, t in d.items()}
               for k, d in res.items()}
    print(json.dumps({"mult": mult, "sf": sf_dir,
                      "min": summary, "all": res}))


if __name__ == "__main__":
    main()
