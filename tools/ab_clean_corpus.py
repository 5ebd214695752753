"""Same-session A/B of clean_corpus: the r3 text-keyed plan (worktree
.ab_r3 @ commit 013a223) vs the current digest-keyed plan, with
IDENTICAL constituents (pipeline_suite.q_clean_corpus only — no
mixture_weights on either side) in ONE SparkSession, runs alternating
B/A/B/A so box drift cancels. Records wall time per run, cold-run
shuffle-write bytes and stage counts (UI REST API — the stable metrics
this VM's noisy wall clock can't fake).

Usage:  git worktree add .ab_r3 013a223
        python tools/ab_clean_corpus.py [--sf DIR] [--runs N]
        git worktree remove .ab_r3

Output: one JSON line + a markdown table fragment for docs/SCALING.md.
"""

from __future__ import annotations

import importlib
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from scale_probe import _shuffle_state  # noqa: E402


def _purge_melt():
    for m in [k for k in list(sys.modules)
              if k == "melt_spark" or k.startswith("melt_spark.")]:
        del sys.modules[m]


def _q_from(tree: Path):
    """Import q_clean_corpus from `tree`'s melt_spark, displacing any
    previously-imported copy. The path stays on sys.path afterwards so
    call-time relative imports resolve inside the same tree; _purge_melt
    plus re-insertion flips trees cleanly because the package __path__
    is rebuilt on re-import."""
    _purge_melt()
    while str(tree) in sys.path:
        sys.path.remove(str(tree))
    sys.path.insert(0, str(tree))
    mod = importlib.import_module("melt_spark.plans.pipeline_suite")
    got = Path(mod.__file__).resolve()
    assert str(got).startswith(str(tree)), f"{got} not under {tree}"
    return mod.q_clean_corpus


def _run_once(spark, q, sf_dir: str):
    """(seconds, shuffle MB, n stages) for one cold execution."""
    spark.catalog.clearCache()
    last_id, _ = _shuffle_state(spark)
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    _, per_stage = _shuffle_state(spark)
    new = {sid: b for sid, b in per_stage.items()
           if last_id is not None and sid > last_id}
    spark.catalog.clearCache()
    return (round(dt, 3), round(sum(new.values()) / 1e6, 1), len(new))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])

    r3_tree = ROOT / ".ab_r3"
    if not r3_tree.exists():
        sys.exit("run `git worktree add .ab_r3 013a223` first")

    from melt_spark.session import get_spark
    spark = get_spark("ab-clean-corpus",
                      extra_conf={"spark.ui.enabled": "true"})

    q_r4 = _q_from(ROOT)
    # JIT/page-cache warmup on the current plan (discarded)
    _run_once(spark, q_r4, sf_dir)

    res: dict[str, list] = {"r3": [], "r4": []}
    for i in range(runs):
        # alternate which side goes first each round
        order = [("r4", ROOT), ("r3", r3_tree)] if i % 2 == 0 else \
                [("r3", r3_tree), ("r4", ROOT)]
        for tag, tree in order:
            q = _q_from(tree)
            res[tag].append(_run_once(spark, q, sf_dir))
    _q_from(ROOT)  # leave the process on current code

    out = {"sf_dir": sf_dir, "runs": runs}
    for tag in ("r3", "r4"):
        times = [t for t, _, _ in res[tag]]
        out[tag] = {"times_sec": times, "best_sec": min(times),
                    "median_sec": sorted(times)[len(times) // 2],
                    "shuffle_mb": [s for _, s, _ in res[tag]],
                    "stages": [n for _, _, n in res[tag]]}
    print(json.dumps(out))

    # persist under the sf label so scale_probe renders the head-to-head
    # into docs/SCALING.md
    store_path = ROOT / "docs" / "AB_CLEAN_CORPUS.json"
    store = (json.loads(store_path.read_text())
             if store_path.exists() else {})
    store[Path(sf_dir).name] = out
    store_path.write_text(json.dumps(store, indent=1))

    r3b, r4b = out["r3"]["best_sec"], out["r4"]["best_sec"]
    print("\n| plan | best s | median s | all runs s | shuffle MB | stages |")
    print("|---|---|---|---|---|---|")
    for tag, label in (("r3", "r3 text-keyed (013a223)"),
                       ("r4", "r4/r5 digest-keyed (HEAD)")):
        o = out[tag]
        print(f"| {label} | {o['best_sec']} | {o['median_sec']} | "
              f"{o['times_sec']} | {o['shuffle_mb']} | {o['stages']} |")
    print(f"\nbest-vs-best: r4/r3 = {r4b / r3b:.2f}x")


if __name__ == "__main__":
    main()
