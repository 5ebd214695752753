"""Split each op's cost into PLAN-SIDE time (DataFrame construction +
analysis via schema touch + formatted explain — driver-only, the guide
§7.3 'very large plans' class the r12 lsh_bucket fix exposed) and
EXECUTION time (the noop write that follows). Ops whose plan-side time
rivals execution are expression-tree/optimizer problems, not data
problems.

Usage: python tools/probe_compile_vs_exec.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args

    from bench import BENCH_QUERIES, EXTRA_QUERIES, _force
    from melt_spark.plans.registry import constituents, entries
    from melt_spark.session import get_spark

    lookup = dict(BENCH_QUERIES) | dict(EXTRA_QUERIES)
    reg = constituents()
    ent = entries()

    def resolve(n):
        if n in lookup:
            return lookup[n]
        if n in reg:
            return reg[n][0]
        return ent[n]

    spark = get_spark("probe-compile-vs-exec")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    # warm the session once so JVM/codegen startup doesn't charge run 1
    _force(resolve(names[0])(spark, "/root/testdata/sf0.001"))

    for name in names:
        fn = resolve(name)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)          # construction (may run eager jobs)
        t1 = time.perf_counter()
        plan = df._jdf.queryExecution().explainString(mode)
        t2 = time.perf_counter()
        _force(df)                       # execution
        t3 = time.perf_counter()
        print(json.dumps({
            "name": name,
            "construct_s": round(t1 - t0, 3),
            "explain_s": round(t2 - t1, 3),
            "exec_s": round(t3 - t2, 3),
            "plan_bytes": len(plan),
        }), flush=True)


if __name__ == "__main__":
    main()
