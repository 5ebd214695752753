"""CSV / JSON-lines interchange round-trips (sources/files.py)."""

import pytest
from pyspark.sql import functions as F

from melt_spark.sources.files import (read_csv, read_jsonl, write_csv,
                                      write_jsonl)
from melt_spark.sources.parquet import read_table

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"
SCHEMA = ("n_nationkey int, n_name string, n_regionkey int")


def test_csv_round_trip_with_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'has,comma', 0), (2, 'has"quote', 1), (3, "plain", 2)],
        SCHEMA)
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = read_csv(spark, out, SCHEMA)
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
        [(1, 'has,comma'), (2, 'has"quote'), (3, "plain")]


def test_jsonl_round_trip_nation(spark, tmp_path):
    nation = read_table(spark, SF, "nation")
    out = str(tmp_path / "jsonl")
    write_jsonl(nation, out)
    back = read_jsonl(spark, out, SCHEMA)
    assert back.count() == nation.count()
    a = {r.n_nationkey: r.n_name for r in back.collect()}
    b = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert a == b


def test_partitioned_export_prunes(spark, tmp_path):
    nation = read_table(spark, SF, "nation")
    out = str(tmp_path / "parts")
    write_csv(nation.select("n_nationkey", "n_name", "n_regionkey"),
              out, partition_by="n_regionkey")
    back = read_csv(spark, out, "n_nationkey int, n_name string",
                    basePath=out)
    one = back.filter(F.col("n_regionkey") == 2)
    scanned = one.select(F.input_file_name().alias("f")).distinct().collect()
    assert scanned and all("n_regionkey=2" in r.f for r in scanned)


def test_failfast_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,x\nnot_an_int,y\n")
    df = read_csv(spark, str(bad), "a int, b string")
    with pytest.raises(Exception):
        df.collect()
