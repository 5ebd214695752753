"""Ad-hoc per-query timing with the bench methodology (warm-up at
sf0.001, min-of-N noop-forced runs at the target SF) — for the r11
optimization loop's isolated before/after numbers.

Usage: python tools/bench_some.py [--sf DIR] [--n N] name [name ...]
Names resolve like bench.py: headliners, registry constituents, entries.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n_runs = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--n":
            n_runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

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

    spark = get_spark("bench-some")
    warm = "/root/testdata/sf0.001"
    out = {}
    for name in names:
        fn = resolve(name)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            _force(fn(spark, warm))
        except Exception as exc:  # noqa: BLE001
            # a broken warm-up leaves the first timed run cold and skews
            # min-of-N — say so instead of silently recording it
            print(f"WARN warm-up for {name} failed: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr,
                  flush=True)
        rs = []
        for r in range(n_runs):
            spark.sparkContext.setJobDescription(f"run{r}:{name}")
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(rs), "runs": rs}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
