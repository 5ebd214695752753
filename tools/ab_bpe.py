"""Same-session A/B of the BPE merge loop: UNROLLED (the shipped shape —
each round's argmax is a limit-1 subplan broadcast into a crossJoin, so
every broadcast job re-derives the words lineage from the corpus scan
upward, O(rounds²) recompute) vs CHECKPOINTED-ARGMAX (word_freqs
localCheckpointed once, each round's 1-row argmax collected to the
driver, the fold applied with literal symbols, the merge table rebuilt
as a literal frame — each round touches only the vocabulary-sized
checkpoint, the corpus is scanned once for word_freqs and once for the
per-doc apply stage).

Output equivalence: the argmax ordering (n DESC, s1, s2) and the greedy
fold are unchanged; collecting the 1-row argmax instead of broadcasting
it cannot change what it selects. --check diffs the full q_bpe_train
output multisets bit-for-bit.

Also counts SPARK JOBS per variant (setJobGroup + statusTracker) — the
VERDICT #3 'jobs-per-round reduced' evidence.

Usage: python tools/ab_bpe.py [--sf DIR] [--runs N] [--check]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from melt_spark.functions.bpe import (_merge_fold, _pair_counts,  # noqa: E402
                                      word_freqs)
from melt_spark.session import get_spark  # noqa: E402
from melt_spark.sources.parquet import read_table  # noqa: E402

BPE_ROUNDS = 3


def bpe_train_unrolled(docs, rounds=BPE_ROUNDS, text_col="text"):
    """The pre-r12 shipped trainer (unrolled plan, broadcast argmax) —
    kept verbatim here as the A/B baseline after functions/bpe.py moved
    to the checkpointed-argmax shape."""
    spark = docs.sparkSession
    words = word_freqs(docs, text_col)
    sentinel = spark.createDataFrame([("", "", -1)], "s1 string,"
                                     " s2 string, n long")
    merges = None
    for r in range(1, rounds + 1):
        best = (_pair_counts(words).unionByName(sentinel)
                .orderBy(F.desc("n"), F.asc("s1"), F.asc("s2")).limit(1)
                .select(F.lit(r).alias("round"), "s1", "s2", "n"))
        merges = best if merges is None else merges.unionByName(best)
        bst = F.broadcast(best.select(F.col("s1").alias("_a"),
                                      F.col("s2").alias("_b")))
        words = (words.crossJoin(bst)
                 .select("word", "freq",
                         _merge_fold(F.col("syms"), F.col("_a"),
                                     F.col("_b")).alias("syms")))
    final = words.select("word", "freq", F.size("syms").alias("n_syms"),
                         F.array_join("syms", "|").alias("seg"))
    return merges.filter(F.col("n") > 0), final


def q_bpe_train_unrolled(spark, sf_dir):
    """q_bpe_train body over the pre-r12 unrolled trainer."""
    docs = read_table(spark, sf_dir, "documents")
    merges, words = bpe_train_unrolled(docs, rounds=BPE_ROUNDS)
    m = merges.select(F.lit("bpe_merge").alias("kind"),
                      F.col("round").cast("bigint").alias("doc_id"),
                      F.col("n"),
                      F.concat_ws("+", "s1", "s2").alias("fp"),
                      F.lit(-1).cast("bigint").alias("m"))
    w = words.select(F.lit("bpe_word").alias("kind"),
                     F.lit(-1).cast("bigint").alias("doc_id"),
                     F.col("freq").alias("n"),
                     F.concat_ws(">", "word", "seg").alias("fp"),
                     F.col("n_syms").cast("bigint").alias("m"))
    toks = docs.select("doc_id", F.explode(F.split("text", " "))
                       .alias("word"))
    seg_sizes = words.select("word", "n_syms")
    per_doc = (toks.join(F.broadcast(seg_sizes), "word")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("n_syms").alias("n_bpe_syms")))
    d = per_doc.select(F.lit("bpe_doc").alias("kind"), "doc_id",
                       F.col("n_bpe_syms").cast("bigint").alias("n"),
                       F.lit("").alias("fp"),
                       F.col("n_words").cast("bigint").alias("m"))
    return m.unionByName(w).unionByName(d)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    check = "--check" in args

    from melt_spark.plans.pipeline_suite import q_bpe_train

    spark = get_spark("ab-bpe")
    sc = spark.sparkContext

    if check:
        sys.path.insert(0, str(ROOT / "tools"))
        from check_oracle import norm
        a = sorted(tuple(norm(v) for v in r)
                   for r in q_bpe_train_unrolled(spark, sf_dir).collect())
        b = sorted(tuple(norm(v) for v in r)
                   for r in q_bpe_train(spark, sf_dir).collect())
        same = a == b
        print(json.dumps({"sf": sf_dir, "rows_a": len(a), "rows_b": len(b),
                          "identical": same}))
        if not same:
            sa, sb = set(a), set(b)
            for r in sorted(sa - sb)[:5]:
                print("ONLY UNROLLED:", r)
            for r in sorted(sb - sa)[:5]:
                print("ONLY CKPT    :", r)
            sys.exit(1)
        return

    variants = {"unrolled": q_bpe_train_unrolled, "ckpt": q_bpe_train}
    # warm both at sf0.001
    for name, fn in variants.items():
        sc.setJobDescription(f"warm:{name}")
        _noop(fn(spark, "/root/testdata/sf0.001"))

    times = {k: [] for k in variants}
    jobs = {k: [] for k in variants}
    for r in range(runs):
        for name in ("ckpt", "unrolled"):
            fn = variants[name]
            group = f"{name}-{r}"
            sc.setJobGroup(group, f"ab_bpe {group}")
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            times[name].append(dt)
            jobs[name].append(n_jobs)
            print(json.dumps({name: dt, "jobs": n_jobs}), flush=True)
    print("RESULT " + json.dumps(
        {k: {"min": min(v), "runs": v, "jobs": jobs[k]}
         for k, v in times.items()}))


if __name__ == "__main__":
    main()
