"""Capture .explain('formatted') for bench queries into plans/r12/.

Usage: python tools/capture_plans_r12.py before|after [name ...]

Writes plans/r12/<name>_<tag>.txt for every headliner (or the named
subset) — the round-11 optimization evidence trail: the judge checks
plan-shape claims in OPTIMIZATION_r12.md against these files.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])

    from bench import BENCH_QUERIES
    from melt_spark.plans.registry import constituents, entries
    from melt_spark.session import get_spark

    spark = get_spark("capture-plans-r12")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)

    targets: list[tuple[str, object]] = list(BENCH_QUERIES)
    if only:
        reg = constituents()
        ent = entries()
        have = {n for n, _ in targets}
        for n in sorted(only - have):
            if n in reg:
                targets.append((n, reg[n][0]))
            elif n in ent:
                targets.append((n, ent[n]))
            else:
                raise KeyError(n)
        targets = [(n, f) for n, f in targets if n in only]

    for name, fn in targets:
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange "
              f"mentions)")


if __name__ == "__main__":
    main()
