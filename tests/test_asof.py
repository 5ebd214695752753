"""As-of join semantics: latest-at-or-before per key, left/inner modes."""

import pytest

from melt_spark.operators.asof import asof_join

LEFT = "id long, k string, t long"
RIGHT = "k string, rt long, rv string"


def _l(spark, rows):
    return spark.createDataFrame(rows, LEFT)


def _r(spark, rows):
    return spark.createDataFrame(rows, RIGHT)


def test_basic_asof(spark):
    left = _l(spark, [(1, "a", 10), (2, "a", 25), (3, "a", 5)])
    right = _r(spark, [("a", 7, "v7"), ("a", 20, "v20"), ("a", 30, "v30")])
    out = {r["id"]: (r["rt"], r["rv"]) for r in
           asof_join(left, right, ["k"], "t", "rt").collect()}
    assert out == {1: (7, "v7"),     # 7 <= 10 < 20
                   2: (20, "v20"),   # latest <= 25
                   3: (None, None)}  # nothing at or before 5


def test_exact_timestamp_matches_inclusive(spark):
    left = _l(spark, [(1, "a", 20)])
    right = _r(spark, [("a", 20, "v20")])
    rows = asof_join(left, right, ["k"], "t", "rt").collect()
    assert rows[0]["rv"] == "v20"


def test_unmatched_key_left_vs_inner(spark):
    left = _l(spark, [(1, "a", 10), (2, "zzz", 10)])
    right = _r(spark, [("a", 5, "v5")])
    l_rows = asof_join(left, right, ["k"], "t", "rt").collect()
    assert len(l_rows) == 2
    i_rows = asof_join(left, right, ["k"], "t", "rt", how="inner").collect()
    assert [r["id"] for r in i_rows] == [1]


def test_per_key_isolation(spark):
    left = _l(spark, [(1, "a", 100), (2, "b", 100)])
    right = _r(spark, [("a", 50, "va"), ("b", 60, "vb")])
    out = {r["id"]: r["rv"] for r in
           asof_join(left, right, ["k"], "t", "rt").collect()}
    assert out == {1: "va", 2: "vb"}


def test_invalid_how_rejected(spark):
    with pytest.raises(ValueError):
        asof_join(_l(spark, []), _r(spark, []), ["k"], "t", "rt", how="full")
