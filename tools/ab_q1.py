"""Same-session A/B of tpch_q1's aggregation arithmetic: DECIMAL (the
shipped shape — per-row double→decimal(18,2) casts, decimal(37,x)
multiplies, decimal(38,x) sum buffers) vs LONG-CENTS (per-row
floor(x*100+0.5) integer cents, bigint products/sums, one exact
decimal→double conversion on the 4 output rows).

Equivalence precondition (validated by --check): every measure column is
an exact 2-decimal value at double precision, so floor(x*100+0.5) equals
CAST(x AS DECIMAL(18,2)) for every row; the final per-group conversion
goes long → decimal(38,0) → /100 (or /1e4, /1e6) → decimal(38,6) exact →
double, which is the same correctly-rounded double the decimal-sum cast
produces. --check collects BOTH variants and diffs the normalized rows
bit-for-bit (repr on doubles — the check_oracle discipline).

Runs alternate B/A/B/A... in ONE SparkSession so box drift cancels
(the r11 ab_minhash methodology).

Usage: python tools/ab_q1.py [--sf DIR] [--runs N] [--mult M] [--check]
  --mult M: union lineitem M times (key-shifted) for a scale-up probe.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from melt_spark.plans import suite as S  # noqa: E402
from melt_spark.session import get_spark  # noqa: E402
from melt_spark.sources.parquet import read_table  # noqa: E402


def q1_cents(li):
    """Long-cents tpch_q1 aggregation over a lineitem frame."""
    cents = lambda c: F.floor(F.col(c) * 100.0 + 0.5)  # noqa: E731
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    disc_price_4 = price_c * (F.lit(100).cast("long") - disc_c)
    charge_6 = disc_price_4 * (F.lit(100).cast("long") + tax_c)
    g = (li.filter(F.col("l_shipdate")
                   <= F.lit("2000-12-01").cast("timestamp"))
         .groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum(qty_c).alias("__qc"),
              F.sum(price_c).alias("__pc"),
              F.sum(disc_price_4).alias("__dp4"),
              F.sum(charge_6).alias("__ch6"),
              F.sum(disc_c).alias("__dc"),
              F.count(F.lit(1)).alias("count_order")))

    def dbl(col, denom):
        return (F.col(col).cast("decimal(38,0)")
                / F.lit(denom).cast("decimal(7,0)")).cast("double")

    cnt = F.col("count_order")
    return g.select(
        "l_returnflag", "l_linestatus",
        dbl("__qc", 100).alias("sum_qty"),
        dbl("__pc", 100).alias("sum_base_price"),
        dbl("__dp4", 10_000).alias("sum_disc_price"),
        dbl("__ch6", 1_000_000).alias("sum_charge"),
        (dbl("__qc", 100) / cnt).alias("avg_qty"),
        (dbl("__pc", 100) / cnt).alias("avg_price"),
        (dbl("__dc", 100) / cnt).alias("avg_disc"),
        "count_order")


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
    check = "--check" in args

    spark = get_spark("ab-q1")
    li = read_table(spark, sf_dir, "lineitem")
    if mult > 1:
        parts = [li.withColumn("l_orderkey",
                               F.col("l_orderkey") + F.lit(i << 40))
                 for i in range(mult)]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        li = base

    def run_decimal():
        # the pre-r12 shipped decimal shape, inlined verbatim (suite.py
        # moved to the cents shape, so this is the preserved baseline)
        d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
        one = F.lit(1).cast("decimal(18,2)")
        disc_price = (d2("l_extendedprice") * (one - d2("l_discount"))) \
            .cast("decimal(18,4)")
        charge = disc_price * (one + d2("l_tax"))
        qty = d2("l_quantity")
        return (li.filter(F.col("l_shipdate")
                          <= F.lit("2000-12-01").cast("timestamp"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(qty).cast("double").alias("sum_qty"),
                     F.sum(d2("l_extendedprice")).cast("double")
                     .alias("sum_base_price"),
                     F.sum(disc_price).cast("double")
                     .alias("sum_disc_price"),
                     F.sum(charge).cast("double").alias("sum_charge"),
                     (F.sum(qty).cast("double") / F.count(F.lit(1)))
                     .alias("avg_qty"),
                     (F.sum(d2("l_extendedprice")).cast("double")
                      / F.count(F.lit(1))).alias("avg_price"),
                     (F.sum(d2("l_discount")).cast("double")
                      / F.count(F.lit(1))).alias("avg_disc"),
                     F.count(F.lit(1)).alias("count_order")))

    def run_cents():
        if mult == 1:
            return S.q_tpch_q1(spark, sf_dir)   # the shipped r12 shape
        return q1_cents(li)

    if check:
        sys.path.insert(0, str(ROOT / "tools"))
        from check_oracle import norm
        a = sorted(tuple(norm(v) for v in r) for r in run_decimal().collect())
        b = sorted(tuple(norm(v) for v in r) for r in run_cents().collect())
        same = a == b
        print(json.dumps({"sf": sf_dir, "mult": mult, "rows": len(a),
                          "identical": same}))
        if not same:
            for ra, rb in zip(a, b):
                if ra != rb:
                    print("DECIMAL:", ra)
                    print("CENTS  :", rb)
            sys.exit(1)
        return

    # warm both
    spark.sparkContext.setJobDescription("warm")
    _noop(run_decimal())
    _noop(run_cents())

    times = {"decimal": [], "cents": []}
    for r in range(runs):
        for name, fn in (("cents", run_cents), ("decimal", run_decimal)):
            spark.sparkContext.setJobDescription(f"{name}:{r}")
            t0 = time.perf_counter()
            _noop(fn())
            times[name].append(round(time.perf_counter() - t0, 3))
            print(json.dumps({name: times[name][-1]}), flush=True)
    print("RESULT " + json.dumps(
        {k: {"min": min(v), "runs": v} for k, v in times.items()}))


if __name__ == "__main__":
    main()
