"""Schema discovery, snapshot cache, drift detection (melt.clj:55-133)."""

import pytest

from melt_spark.catalog import (discover_schema, schema_check, schema_diff,
                                table_set, trackable)
from melt_spark.catalog.discovery import untracked
from melt_spark.catalog.snapshot import _descriptors, load_schema, save_schema

META = ["table_cat", "table_schem", "table_name"]


@pytest.fixture()
def fixture_dfs(spark):
    tables = spark.createDataFrame(
        [("c", "main", "t1", "TABLE"), ("c", "main", "t2", "TABLE"),
         ("c", "sys", "objects", "TABLE"),
         ("c", "INFORMATION_SCHEMA", "tables", "TABLE"),
         ("c", "main", "v1", "VIEW")],
        META + ["table_type"])
    columns = spark.createDataFrame(
        [("c", "main", "t1", "ID"), ("c", "main", "t1", "Name"),
         ("c", "main", "t2", "x"), ("c", "sys", "objects", "id")],
        META + ["column_name"])
    keys = spark.createDataFrame(
        [("c", "main", "t1", "ID")], META + ["column_name"])
    return tables, columns, keys


def test_table_set_filters_system_and_views(spark, fixture_dfs):
    tables, _, _ = fixture_dfs
    names = {r["table_name"] for r in table_set(tables).collect()}
    assert names == {"t1", "t2"}


def test_discover_schema_lowercases_and_keys(spark, fixture_dfs):
    desc = discover_schema(*fixture_dfs)
    by_name = {r["table_name"]: r for r in desc.collect()}
    assert by_name["t1"]["columns"] == ["id", "name"]
    assert by_name["t1"]["keys"] == ["id"]
    assert by_name["t2"]["keys"] == []


def test_trackable_and_untracked(spark, fixture_dfs):
    desc = discover_schema(*fixture_dfs)
    tr = trackable(desc)
    assert {r["table_name"] for r in tr.collect()} == {"t1"}
    tracked = spark.createDataFrame([("main", "t1")],
                                    ["table_schem", "table_name"])
    assert untracked(tr, tracked).count() == 0


def test_snapshot_roundtrip_and_drift(spark, fixture_dfs, tmp_path):
    desc = discover_schema(*fixture_dfs)
    path = str(tmp_path / "schema.json")
    save_schema(desc, path)
    cached = load_schema(path)
    live = _descriptors(desc)
    assert cached == live
    assert not any(schema_diff(cached, live).values())

    mutated = dict(live)
    mutated["c.main.t2"] = {"columns": ["x", "y"], "keys": []}
    d = schema_diff(cached, mutated)
    assert "c.main.t2" in d["changed"]


def test_schema_check_abort_flag(spark, fixture_dfs, tmp_path, monkeypatch):
    desc = discover_schema(*fixture_dfs)
    path = str(tmp_path / "schema.json")
    assert schema_check(desc, path)  # first run saves snapshot

    cached = load_schema(path)
    cached["c.main.ghost"] = {"columns": ["a"], "keys": []}
    save = __import__("json").dump
    with open(path, "w") as f:
        save(cached, f)

    monkeypatch.setenv("ABORT_ON_SCHEMA_CHANGE", "TRUE")
    assert not schema_check(desc, path)   # drift + abort flag → False
    monkeypatch.setenv("ABORT_ON_SCHEMA_CHANGE", "FALSE")
    assert schema_check(desc, path)       # drift tolerated


def test_column_stats_pk_and_fk_shapes(spark, sf_dir):
    """Key columns have zero nulls and full distinctness; FK columns have
    distinct counts bounded by the referenced dimension."""
    from melt_spark.catalog.statistics import column_stats
    from melt_spark.sources.parquet import read_table

    nat = read_table(spark, sf_dir, "nation")
    stats = {r.column: r for r in
             column_stats(nat, "nation").collect()}
    pk = stats["n_nationkey"]
    assert pk.n_nulls == 0 and pk.n_distinct == pk.n_rows
    region_n = read_table(spark, sf_dir, "region").count()
    assert stats["n_regionkey"].n_distinct <= region_n
