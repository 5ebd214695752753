"""Ad-hoc oracle check for individual ANALYTICS_SUITE / PIPELINE_SUITE
constituents (pre-merge): python tools/check_one.py name [name ...]
[--sf DIR]. Reuses the driver-faithful comparison from check_oracle."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from check_oracle import TABLES, duck_rows, spark_rows  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]

    from melt_spark.plans.registry import constituents
    from melt_spark.session import get_spark

    registry = constituents()
    spark = get_spark("oracle-check-one")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rc = 0
    for name in args:
        fn, sql = registry[name]
        try:
            s_cols, s_data = spark_rows(fn(spark, sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rc = 1
            continue
        try:
            d_cols, d_data = duck_rows(con, sql)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            rc = 1
            continue
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duck={d_cols}")
            rc = 1
        elif len(s_data) != len(d_data):
            print(f"FAIL  {name}: rows spark={len(s_data)} duck={len(d_data)}")
            rc = 1
        elif Counter(s_data) != Counter(d_data):
            sc, dc = Counter(s_data), Counter(d_data)
            print(f"FAIL  {name}: values differ; spark-only="
                  f"{list((sc - dc).elements())[:3]} duck-only="
                  f"{list((dc - sc).elements())[:3]}")
            rc = 1
        else:
            print(f"PASS  {name} ({len(s_data)} rows)")
    sys.exit(rc)


if __name__ == "__main__":
    main()
