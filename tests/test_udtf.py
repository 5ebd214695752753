"""Python UDTF surface (functions/udtf_ops.py): envelope explode with
malformed-payload quarantine — the fifth Python execution surface."""

from melt_spark.functions.udtf_ops import explode_envelope


def test_explode_envelope_fields_tombstones_and_quarantine(spark):
    msgs = spark.createDataFrame(
        [("k1", '{"b": 2, "a": "x"}'),     # two fields, sorted order
         ("k2", None),                      # tombstone
         ("k3", "{not json"),               # malformed -> quarantined
         ("k4", '"scalar"')],               # non-object JSON
        "key string, value string")
    rows = [(r["key"], r["field"], r["field_value"], r["malformed"])
            for r in explode_envelope(msgs).collect()]
    assert ("k1", "a", "x", False) in rows
    assert ("k1", "b", "2", False) in rows
    assert ("k2", "__tombstone", None, False) in rows
    assert ("k3", "__error", "{not json", True) in rows
    assert ("k4", "__scalar", '"scalar"', False) in rows
    assert len(rows) == 5
    # per-message field order is deterministic (sorted)
    k1 = [f for k, f, _v, _m in rows if k == "k1"]
    assert k1 == ["a", "b"]


def test_explode_envelope_concurrent_and_quoted_column(spark):
    """Two in-flight explode_envelope frames must not clobber each other
    (per-call unique view), and a value column whose name needs backticks
    must survive the SQL round-trip."""
    a = spark.createDataFrame([("a1", '{"x": 1}')], "key string, value string")
    b = spark.createDataFrame(
        [("b1", '{"y": 2}')],
        ["key", "payload value"])  # space in the column name -> needs quoting
    ea = explode_envelope(a)                       # not yet collected...
    eb = explode_envelope(b, value_col="payload value")
    rows_a = {(r["key"], r["field"]) for r in ea.collect()}  # ...still valid
    rows_b = {(r["key"], r["field"]) for r in eb.collect()}
    assert rows_a == {("a1", "x")}
    assert rows_b == {("b1", "y")}
