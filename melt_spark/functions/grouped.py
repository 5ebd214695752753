"""Grouped Arrow-batched Python (applyInPandas) — the fourth and last
Python execution surface (pandas_udf scalar: canonical_json_nested;
mapInPandas: multimodal decode; applyInPandasWithState: streaming dedup).

Use when per-group logic genuinely needs a dataframe library (model scoring
per entity, sklearn-style normalization); anything expressible in SQL should
stay JVM-side — which is exactly why the demo feature set below is also
SQL-expressible: the DuckDB oracle checks the pandas path end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


USER_FEATURES_SCHEMA = ("user_id long, n_events long, n_purchases long,"
                        " total_value double, max_single double")


def _features(pdf: pd.DataFrame) -> pd.DataFrame:
    from decimal import Decimal

    purchases = pdf[pdf["event_type"] == "purchase"]
    # exact decimal accumulation: pandas float sum is pairwise (order-
    # dependent low bits); Decimal over the 2-dp values is exact and equals
    # SQL's SUM(CAST(value AS DECIMAL(18,2))) bit-for-bit after the one
    # final to-double conversion
    total = float(sum((Decimal(repr(v)) for v in pdf["value"]), Decimal(0)))
    return pd.DataFrame({
        "user_id": [int(pdf["user_id"].iloc[0])],
        "n_events": [len(pdf)],
        "n_purchases": [len(purchases)],
        "total_value": [total],
        "max_single": [float(pdf["value"].max())],
    })


def user_features(events: DataFrame) -> DataFrame:
    """Per-user behavioral feature row via grouped applyInPandas. Each group
    arrives as ONE pandas DataFrame (mind group cardinality at scale: a
    group must fit an executor's memory — here groups are per-user event
    sets; salt or pre-aggregate if a key is pathological)."""
    ordered = events.select("user_id", "event_id", "event_type", "value") \
        .repartition("user_id")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _features(pdf.sort_values("event_id"))

    return ordered.groupBy("user_id").applyInPandas(run, USER_FEATURES_SCHEMA)
