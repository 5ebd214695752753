"""Benchmark runner — times the headline queries and prints ONE JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect). Times are wall-clock seconds per query; the headline
metric is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from melt_spark.plans.suite import spark_queries  # noqa: E402
from melt_spark.session import get_spark  # noqa: E402

# Headliners: the scan/shuffle-heavy queries that dominate real workloads.
BENCH_QUERIES = [
    "message_envelope",   # full scan -> canonical JSON projection
    "latest_state",       # changelog compaction (groupBy + max_by)
    "sync_plan",          # full-outer diff join + CASE projection
    "cdc_replay",         # filter + broadcast join + JSON projection
    "tpch_q1",            # wide aggregation
    "tpch_q3",            # 3-way join + top-k
    "tpch_q5",            # 6-table join tree
    "event_sessions",     # window functions (lag + cumulative sum)
    "text_stats",         # tokenize/lang-id/fingerprint full-corpus scan
    "dedup_minhash_lsh",  # shingle explode + minhash agg + band join
    "ann_cosine_topk",    # broadcast NL join + vector folds + window
    "tpch_q10",           # join + group + deterministic top-k
    "clean_corpus",       # quality gate + near-dup anti-join composition
]


def _force(df) -> int:
    """Execute the full plan without materializing on the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("melt-spark-bench")
    qs = spark_queries()

    # warm-up (not timed): run each query once at the smallest SF so
    # whole-stage-codegen compilation and JVM JIT are paid before timing —
    # the generated code is plan-shaped, so it's reused at the real SF
    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        if name in qs:
            try:
                _force(qs[name](spark, warm_dir))
            except Exception:
                pass
    qs["load_counts"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        best = None
        for _ in range(2):  # min of 2: drops scheduler noise, stays honest
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
