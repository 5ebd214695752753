"""Planted-hub skew probe for butterfly_count (r4 verdict item 2): build
a bipartite graph with one pathological hub vertex, run the wedge census
salted (bucket_size=1024 default) and effectively UNSALTED (bucket_size
>= hub degree, which collapses every vertex to one bucket = the r4 plan),
and record wall time plus the max/mean candidate-pair fanout per join
key — the direct measure of whether one task owns the hub's C(d,2)
wedges.

Usage: python tools/butterfly_hub_probe.py [hub_degree] [n_background]
Writes docs/BUTTERFLY_HUB.json (rendered into docs/SCALING.md by
tools/scale_probe.py) and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def planted_hub(spark, hub_deg: int, n_bg: int):
    """One hub left vertex adjacent to hub_deg rights, plus n_bg normal
    left vertices of degree 24 over a shared right pool (so background
    wedges and real butterflies exist)."""
    hub = spark.range(hub_deg).select(
        F.lit("hub").alias("l"), F.concat(F.lit("r"), F.col("id")).alias("r"))
    bg = (spark.range(n_bg * 24).select(
        F.concat(F.lit("u"), (F.col("id") % n_bg)).alias("l"),
        F.concat(F.lit("r"), ((F.col("id") * 37) % (hub_deg * 2)))
        .alias("r")))
    return hub.unionByName(bg)


def fanout_stats(edges, bucket_size: int):
    """(max, mean) candidate pairs per salted join key — reproduces the
    operator's keying to measure the skew the salting removes."""
    e = edges.select("l", "r").distinct()
    deg = e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
    eb = (e.join(deg, "l")
          .withColumn("nb", F.expr(f"(d + {bucket_size - 1})"
                                   f" div {bucket_size}"))
          .withColumn("b", F.pmod(F.xxhash64("r"), F.col("nb"))))
    a = eb.select("l", "r", F.col("b").alias("i"),
                  F.explode(F.sequence(F.col("b"), F.col("nb") - 1))
                  .alias("j"))
    b = eb.select(F.col("l").alias("l2"), F.col("r").alias("r2"),
                  F.explode(F.sequence(F.lit(0).cast("bigint"),
                                       F.col("b"))).alias("i2"),
                  F.col("b").alias("j2"))
    per_key = (a.join(b, (F.col("l") == F.col("l2"))
                      & (F.col("i") == F.col("i2"))
                      & (F.col("j") == F.col("j2"))
                      & ((F.col("i") < F.col("j"))
                         | (F.col("r") < F.col("r2"))))
               .groupBy("l", "i", "j").agg(F.count(F.lit(1)).alias("n")))
    row = per_key.agg(F.max("n").alias("mx"), F.avg("n").alias("mean"),
                      F.count(F.lit(1)).alias("keys")).head()
    return int(row.mx), round(float(row.mean), 1), int(row.keys)


def main() -> None:
    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from melt_spark.functions.graph import butterfly_count
    from melt_spark.session import get_spark

    spark = get_spark("butterfly-hub-probe")
    edges = planted_hub(spark, hub_deg, n_bg).localCheckpoint(eager=True)

    out: dict = {"hub_degree": hub_deg, "n_background": n_bg,
                 "n_edges": edges.count()}
    results = {}
    for tag, bs in (("salted_1024", 1024), ("unsalted", hub_deg + 1)):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            [row] = butterfly_count(edges, "l", "r",
                                    bucket_size=bs).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        mx, mean, keys = fanout_stats(edges, bs)
        results[tag] = {"sec": min(runs), "runs_sec": runs,
                        "butterflies": int(row.butterflies),
                        "wedges": int(row.wedges),
                        "max_pairs_per_key": mx,
                        "mean_pairs_per_key": mean, "join_keys": keys}
    assert (results["salted_1024"]["butterflies"]
            == results["unsalted"]["butterflies"]), "count changed!"
    out["results"] = results
    (ROOT / "docs" / "BUTTERFLY_HUB.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
