"""Python UDTF surface (Spark 4): table functions that turn ONE input row
into N typed rows — the fifth Python execution surface next to scalar
pandas_udf / mapInPandas / applyInPandas / applyInPandasWithState (all
exercised elsewhere; see NOTES round-1).

Use sparingly: a UDTF is row-at-a-time Python — the slow path. It earns its
place only where the row fan-out is decided by opaque per-row logic that
Catalyst can't express (here: tolerant JSON envelope parsing with malformed-
input quarantine — from_json would null-out the whole row, losing WHICH part
failed). Hot-path equivalents stay in explode()/from_json.

Reference seam: the consumer folds raw Kafka records into typed change maps
(src/jdbc/melt.clj:239-299, value read-str at :380-390); this is that
unpack step as a table function.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="field string, value string, malformed boolean")
class ExplodeEnvelope:
    """One (key, value) JSON message → one row per top-level field, with a
    quarantine row (field='__error', malformed=true) for unparseable
    payloads instead of silently nulling the record. NULL value = tombstone
    → a single (field='__tombstone') marker row."""

    def eval(self, value):  # noqa: D102 — contract in class docstring
        if value is None:
            yield ("__tombstone", None, False)
            return
        try:
            obj = json.loads(value)
        except (ValueError, TypeError):
            yield ("__error", value, True)
            return
        if not isinstance(obj, dict):
            yield ("__scalar", json.dumps(obj), False)
            return
        for k in sorted(obj):  # sorted: deterministic row order per message
            v = obj[k]
            yield (k, v if isinstance(v, str) else json.dumps(v), False)


def explode_envelope(messages: DataFrame,
                     value_col: str = "value") -> DataFrame:
    """Apply the envelope UDTF laterally to each message row, keeping the
    message key alongside the exploded fields.

    The temp view gets a per-call unique name (concurrent/nested calls in
    one session must not clobber each other), and the value column is
    backtick-quoted so names needing quoting survive the SQL round-trip."""
    spark = messages.sparkSession
    spark.udtf.register("explode_envelope_udtf", ExplodeEnvelope)
    view = f"__envelope_msgs_{uuid.uuid4().hex}"
    messages.createOrReplaceTempView(view)
    col = "`" + value_col.replace("`", "``") + "`"
    out = spark.sql(
        f"SELECT m.key, t.field, t.value AS field_value, t.malformed "
        f"FROM {view} m, LATERAL explode_envelope_udtf(m.{col}) t")
    # the view only seeds the lateral-join plan; drop the name eagerly so
    # repeated calls don't accumulate catalog entries
    spark.catalog.dropTempView(view)
    return out
