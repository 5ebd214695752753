"""Canonical form semantics (SURVEY.md §1.4): sorted fields, nulls kept,
ISO-8601 UTC timestamps, column-order independence of keys."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from melt_spark.canonical import (ISO_SECONDS, canonical_json, canonical_key,
                                  iso_utc, with_canonical)


def test_sorted_field_order(spark):
    df = spark.createDataFrame([(2, 1, None)], "b long, a long, c string")
    out = df.select(canonical_json(["b", "a", "c"]).alias("j")).first()["j"]
    assert out == '{"a":1,"b":2,"c":null}'


def test_null_fields_kept(spark):
    df = spark.createDataFrame([Row(x=None, y="s")],
                               schema="x string, y string")
    out = df.select(canonical_json(["x", "y"]).alias("j")).first()["j"]
    assert out == '{"x":null,"y":"s"}'


def test_key_column_order_independent(spark):
    """Logically-equal keys must be byte-identical (melt.clj:359-362)."""
    a = spark.createDataFrame([Row(k1=1, k2="x")])
    b = spark.createDataFrame([Row(k2="x", k1=1)])
    ka = a.select(canonical_key(["k1", "k2"]).alias("k")).first()["k"]
    kb = b.select(canonical_key(["k2", "k1"]).alias("k")).first()["k"]
    assert ka == kb == '{"k1":1,"k2":"x"}'


def test_timestamp_iso_utc(spark):
    ts = datetime.datetime(2007, 8, 1, 0, 0, 0)
    df = spark.createDataFrame([Row(t=ts)])
    # golden parity format of the reference (integration_test.clj:68)
    out = df.select(iso_utc("t", ISO_SECONDS).alias("s")).first()["s"]
    assert out == "2007-08-01T00:00:00Z"
    j = df.select(canonical_json(["t"], ISO_SECONDS).alias("j")).first()["j"]
    assert j == '{"t":"2007-08-01T00:00:00Z"}'


def test_decimal_and_ntz_rendering(spark):
    """Scale-preserving decimal rendering + NTZ timestamps keep the Z
    (regression: to_json's timestampNTZFormat defaulted Z-less)."""
    df = spark.sql("""
        SELECT CAST(1.5 AS DECIMAL(10,2)) AS d,
               TIMESTAMP_NTZ '2007-08-01 00:00:00' AS t
    """)
    out = df.select(canonical_json(["d", "t"]).alias("j")).first()["j"]
    assert out == '{"d":1.50,"t":"2007-08-01T00:00:00.000Z"}'


def test_canonical_json_nested_sorts_recursively(spark):
    from melt_spark.canonical import canonical_json_nested

    df = spark.sql(
        "SELECT map('b', map('z', 1, 'a', 2), 'a', map('k', 3)) AS m")
    out = df.select(canonical_json_nested("m").alias("j")).first()["j"]
    assert out == '{"a":{"k":3},"b":{"a":2,"z":1}}'

    # logically-equal maps built in different orders render identically
    df2 = spark.sql(
        "SELECT map('a', map('k', 3), 'b', map('a', 2, 'z', 1)) AS m")
    out2 = df2.select(canonical_json_nested("m").alias("j")).first()["j"]
    assert out == out2


def test_with_canonical_equality_detects_change(spark):
    df1 = spark.createDataFrame([Row(id=1, v="a")])
    df2 = spark.createDataFrame([Row(id=1, v="b")])
    c1 = with_canonical(df1).first()["__canon"]
    c2 = with_canonical(df2).first()["__canon"]
    assert c1 != c2
    c1b = with_canonical(df1.select("v", "id")).first()["__canon"]
    assert c1 == c1b  # projection order must not matter
