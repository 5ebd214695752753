"""EDN artifact-format parity (reference target/schema.edn melt.clj:102-115,
pprint sample files :153-174): emitter/parser round-trip, schema cache via a
.edn path, EDN sample files."""

from melt_spark.formats.edn import dumps, loads


def test_roundtrip_scalars_and_collections():
    x = {"table": {"columns": ["a", "b"], "keys": ["a"]},
         "n": 42, "ratio": 0.25, "ok": True, "off": False, "none": None,
         "s": 'quote " back\\slash\nnewline\ttab',
         "non keyword key": 1}
    assert loads(dumps(x)) == x


def test_parses_clojure_style_text():
    text = '{:main.SalesLT.Customer {:columns ["CustomerID"], :keys ["CustomerID"]}, :tags #{1 2}}'
    assert loads(text) == {
        "main.SalesLT.Customer": {"columns": ["CustomerID"],
                                  "keys": ["CustomerID"]},
        "tags": {1, 2}}


def test_rejects_trailing_and_unterminated():
    import pytest
    with pytest.raises(ValueError):
        loads("{:a 1} extra")
    with pytest.raises(ValueError):
        loads("{:a 1")
    with pytest.raises(ValueError):
        loads("{:a}")


def test_schema_cache_edn_roundtrip(spark, sf_dir, tmp_path):
    from melt_spark.catalog.discovery import discover_schema
    from melt_spark.catalog.snapshot import load_schema, save_schema

    tables = spark.createDataFrame(
        [("c", "main", "customer", "TABLE"), ("c", "main", "orders", "TABLE")],
        "table_cat string, table_schem string, table_name string,"
        " table_type string")
    cols = spark.createDataFrame(
        [("c", "main", "customer", "C_CustKey"),
         ("c", "main", "customer", "C_Name"),
         ("c", "main", "orders", "O_OrderKey")],
        "table_cat string, table_schem string, table_name string,"
        " column_name string")
    keys = spark.createDataFrame(
        [("c", "main", "customer", "C_CustKey"),
         ("c", "main", "orders", "O_OrderKey")],
        "table_cat string, table_schem string, table_name string,"
        " column_name string")
    schema_df = discover_schema(tables, cols, keys)
    p_json = str(tmp_path / "schema.json")
    p_edn = str(tmp_path / "schema.edn")
    save_schema(schema_df, p_json)
    save_schema(schema_df, p_edn)
    assert load_schema(p_edn) == load_schema(p_json)
    text = open(p_edn).read()
    assert text.lstrip().startswith("{")
    assert ":columns" in text  # keyword-keyed, reference-style


def test_sample_db_edn(spark, sf_dir, tmp_path):
    from melt_spark.operators.sample import sample_db
    from melt_spark.sources.parquet import read_table

    tables = {"region": read_table(spark, sf_dir, "region")}
    paths = sample_db(tables, str(tmp_path), n=3, fmt="edn")
    assert paths == [str(tmp_path / "region.edn")]
    doc = loads(open(paths[0]).read())
    assert doc["table"] == "region"
    assert doc["count"] == 5
    assert len(doc["sample"]) == 3


# ---------------------------------------------------------------------------
# EDN source specs -> Source descriptors (config-file parity)

def test_source_spec_namespaced_keywords():
    from melt_spark.formats.source_spec import sources_from_edn

    text = '''[{:jdbc.melt/name "Address" :jdbc.melt/schema "SalesLT"
                :jdbc.melt/keys #{:addressid} :jdbc.melt/topic "melt.alt"}
               {:name "Customer" :keys #{:custid :region}
                :sql "Select * From c Where id In (?)" :sql-params [9]}]'''
    a, c = sources_from_edn(text)
    assert (a.name, a.schema, a.keys, a.default_topic) == \
        ("Address", "SalesLT", ("addressid",), "melt.alt")
    assert (c.name, c.keys) == ("Customer", ("custid", "region"))
    assert c.sql.startswith("Select") and c.sql_params == ("9",)


def test_source_spec_round_trip_and_xform_rejection():
    import pytest as _pytest

    from melt_spark.formats.source_spec import (sources_from_edn,
                                                sources_to_edn)
    from melt_spark.model import Source

    src = Source(name="Orders", schema="sales", keys=("orderid",),
                 columns=("orderid", "total"), ts_format="yyyy")
    [back] = sources_from_edn(sources_to_edn([src]))
    assert back == src

    with _pytest.raises(ValueError, match="xform"):
        sources_from_edn('{:name "t" :xform :some-fn}')
