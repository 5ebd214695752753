"""JDBC source/sink — the reference's DB boundary, Spark-native.

Reference reads with clojure.java.jdbc over jTDS (src/jdbc/melt.clj:135-151)
— a single-connection, single-threaded scan. Spark's JDBC source gives
partitioned parallel reads instead: we partition on the (numeric) first PK
column so a 1000-executor cluster scans a 100 TB table as N concurrent
range-sliced queries, with filter pushdown handled by Catalyst.

No live database exists in the test environment; everything here is
import-safe and exercised through the parquet-backed fixtures, with the
query-construction logic unit-tested directly (it is pure).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from ..model import Source


def table_query(source: "Source") -> str:
    """The scan SQL: custom ::sql wins, else full-table select
    (reference query-source, melt.clj:135-151). Bracket-quoted like the
    reference's SQL Server dialect."""
    if source.sql:
        return source.sql
    return f"Select * From [{source.schema}].[{source.name}]"


def read_source(spark: SparkSession, url: str, source: "Source",
                partition_column: Optional[str] = None,
                num_partitions: int = 64,
                lower_bound: Optional[int] = None,
                upper_bound: Optional[int] = None,
                properties: Optional[dict] = None) -> DataFrame:
    """Partitioned JDBC read of one source (S4-S6).

    partition_column defaults to the first PK column — at scale, ALWAYS pass
    real bounds (cheap min/max pushdown query) or the read collapses to one
    task."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query" if source.sql else "dbtable",
                      source.sql or f"{source.schema}.{source.name}"))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)

    pcol = partition_column or (source.keys[0] if source.keyed else None)
    if pcol and lower_bound is not None and upper_bound is not None:
        reader = (reader.option("partitionColumn", pcol)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def scan_bounds_query(source: "Source", column: str) -> str:
    """Pushed-down min/max for partition bounds."""
    return (f"Select min([{column}]) lo, max([{column}]) hi "
            f"From [{source.schema}].[{source.name}]")


def information_schema_queries() -> dict[str, str]:
    """The three catalog scans (S1-S3) as portable INFORMATION_SCHEMA SQL —
    read each via read_source(sql=...) and feed melt_spark.catalog."""
    return {
        "tables": (
            "SELECT table_catalog AS table_cat, table_schema AS table_schem,"
            " table_name, 'TABLE' AS table_type FROM information_schema.tables"
            " WHERE table_type = 'BASE TABLE'"
        ),
        "columns": (
            "SELECT table_catalog AS table_cat, table_schema AS table_schem,"
            " table_name, column_name FROM information_schema.columns"
        ),
        "key_columns": (
            "SELECT kcu.table_catalog AS table_cat, kcu.table_schema AS"
            " table_schem, kcu.table_name, kcu.column_name"
            " FROM information_schema.key_column_usage kcu"
            " JOIN information_schema.table_constraints tc"
            "   ON tc.constraint_name = kcu.constraint_name"
            "  AND tc.table_schema = kcu.table_schema"
            " WHERE tc.constraint_type = 'PRIMARY KEY'"
        ),
    }
