"""Scaling probe: replicate the fixture tables N× and measure how the
headline operators' runtime grows. The point is 100 TB extrapolation
evidence: a well-partitioned op should scale near-linearly in rows (ratio
≈ N on a fixed-core box is the worst acceptable; sub-N means the fixed
overheads still dominate); anything super-linear indicates a quadratic
candidate-pair blowup or a collapsed partition.

Usage: python tools/scale_probe.py [N] [sf_dir]   (default 16 /root/testdata/sf0.1)
Writes docs/SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def replicate(spark, sf_dir: str, out_dir: str, n: int) -> None:
    """documents/lineitem/orders/events replicated n× with shifted keys.
    Every 3rd token of each replica gets a replica suffix: token COUNT and
    most stopword occurrences survive (quality distribution ≈ unchanged),
    but any 3 consecutive tokens contain a modified one, so every 3-gram
    shingle differs across replicas — replicas are NOT near-dups; the
    result is n independent same-shape corpora. Verbatim replication would
    instead give every doc n-1 identical twins, and dedup's output pair
    count is inherently quadratic in duplicate multiplicity (a real
    mirrored-corpus stress, but not a linear-scaling probe; cluster-reduce
    with dedup_clusters when multiplicity is high)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    reps = spark.range(n).select(F.col("id").alias("rep"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).head()[0] + 1
    salted = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda t, i: F.when(
                        (i + 1) % 3 == 0,
                        F.concat(t, F.lit("~r"),
                                 F.col("rep").cast("string"))).otherwise(t)),
        " ")
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
             salted.alias("text"), "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    # ONE shift for both lineitem and orders keys: it must exceed BOTH
    # max(l_orderkey) and max(o_orderkey), else replica ranges collide
    # (an order with no lineitems makes max(o_orderkey) the larger one)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders_max = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                  .agg(F.max("o_orderkey")).head()[0])
    max_ok = max(li.agg(F.max("l_orderkey")).head()[0], orders_max) + 1
    (li.crossJoin(reps)
     .select((F.col("l_orderkey") + F.col("rep") * max_ok).alias("l_orderkey"),
             *[c for c in li.columns if c != "l_orderkey"])
     .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (orders.crossJoin(reps)
     .select((F.col("o_orderkey") + F.col("rep") * max_ok).alias("o_orderkey"),
             *[c for c in orders.columns if c != "o_orderkey"])
     .write.mode("overwrite").parquet(f"{out}/orders.parquet"))

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    max_ev = ev.agg(F.max("event_id")).head()[0] + 1
    (ev.crossJoin(reps)
     .select((F.col("event_id") + F.col("rep") * max_ev).alias("event_id"),
             *[c for c in ev.columns if c != "event_id"])
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))

    # remaining tables: symlink-free copy-through reads from sf_dir
    for t in ("region", "nation", "customer", "supplier", "part",
              "embeddings"):
        (spark.read.parquet(f"{sf_dir}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))


PROBES = ["text_quality", "dedup_minhash_lsh", "clean_corpus",
          "tpch_q1", "latest_state",
          # r3 additions: sub-document span dedup + BM25 retrieval ride
          # their merged entries (dedup_exact, ann_cosine_topk)
          "dedup_exact", "ann_cosine_topk"]


def time_queries(spark, sf_dir: str, names, runs: int = 1) -> dict[str, float]:
    from melt_spark.plans.suite import spark_queries

    qs = spark_queries()
    out = {}
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
        spark.catalog.clearCache()
    return out


def main() -> None:
    """Incremental: each invocation times any not-yet-recorded probes into
    docs/SCALING.json (so long runs resume across invocations), then
    renders docs/SCALING.md from whatever is recorded. Pass probe names as
    extra args to restrict one invocation to those queries."""
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:] or PROBES
    big_dir = f"/tmp/scale_probe_{n}x"
    docs = Path(__file__).resolve().parent.parent / "docs"
    state_path = docs / "SCALING.json"
    state = (json.loads(state_path.read_text())
             if state_path.exists() else {"n": n, "base": {}, "big": {}})
    if state.get("n") != n:
        # stale state from a different replication factor would render a
        # SCALING.md with fabricated ratios — start over
        state = {"n": n, "base": {}, "big": {}}

    from melt_spark.session import get_spark

    spark = get_spark("scale-probe")
    if not Path(big_dir, "documents.parquet").exists():
        replicate(spark, sf_dir, big_dir, n)

    for name in only:
        if name not in state["base"]:
            state["base"].update(
                time_queries(spark, sf_dir, [name], runs=2))
            state_path.write_text(json.dumps(state, indent=1))
        if name not in state["big"]:
            state["big"].update(
                time_queries(spark, big_dir, [name], runs=1))
            state_path.write_text(json.dumps(state, indent=1))

    base, big = state["base"], state["big"]
    done = [k for k in PROBES if k in base and k in big]
    ratios = {k: round(big[k] / base[k], 2) if base[k] > 0 else None
              for k in done}
    lines = [
        "# Scaling probe (generated by tools/scale_probe.py)",
        "",
        f"Rows ×{n} on documents/lineitem/orders (shifted keys, replica-",
        "salted shingles — see replicate()), same local[*] box: fixed",
        f"cores, so ideal linear scaling shows ratio ≈ {n} once overheads",
        f"amortize; sub-{n} = overhead-dominated; super-linear = quadratic",
        "candidate blowup or a collapsed partition.",
        "",
        f"| query | 1× sec | {n}× sec | ratio |",
        "|---|---|---|---|",
    ]
    for k in done:
        lines.append(f"| {k} | {base[k]} | {big[k]} | {ratios[k]} |")
    lines.append("")
    (docs / "SCALING.md").write_text("\n".join(lines))
    print(json.dumps({"n": n, "base": base, "big": big, "ratios": ratios}))


if __name__ == "__main__":
    main()
