"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship diff/sync pipeline (the reference's core
invariant: topic = latest state per key; diff detects drift — SURVEY.md §3.2)
on sf0.001. queries()/oracle_sql() expose the full operator suite from
melt_spark.plans.suite, checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from melt_spark.plans.suite import spark_queries, oracle_queries  # noqa: E402
from melt_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    from melt_spark.plans.suite import q_sync_plan

    return q_sync_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = spark_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    return oracle_queries()
