"""Schema discovery over INFORMATION_SCHEMA-shaped DataFrames.

Reference: enumerates user tables via JDBC DatabaseMetaData filtered of
system schemas (src/jdbc/melt.clj:19,55-56,79-84), collects lowercased
column names per table (:63,65-70,86-100) and PK column sets (:72-77,99)
into a sorted set of table descriptors.

Spark restatement (SURVEY.md §2.1/S1-S3): the three metadata relations
(tables, columns, key_columns) are DataFrames — read from a real database via
INFORMATION_SCHEMA over JDBC, or from fixture parquet — and discovery is a
groupBy + two joins. Discovery itself is thereby oracle-checkable SQL.
Output descriptors are small (one row per table), so driver-side collection
for caching/drift is fine at any data scale — catalog size doesn't grow with
table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYSTEM_SCHEMAS = ("sys", "INFORMATION_SCHEMA")  # melt.clj:19


def table_set(tables: DataFrame) -> DataFrame:
    """User tables: type TABLE, non-system schema (melt.clj:55-56,79-84).
    Columns: table_cat, table_schem, table_name."""
    return (tables
            .filter(F.col("table_type") == "TABLE")
            .filter(~F.col("table_schem").isin(*SYSTEM_SCHEMAS))
            .select("table_cat", "table_schem", "table_name"))


def discover_schema(tables: DataFrame, columns: DataFrame,
                    key_columns: DataFrame) -> DataFrame:
    """Assemble table descriptors: identity + sorted lowercased column list +
    sorted PK list, ordered by cat.schema.name (melt.clj:89-100).

    columns/key_columns carry (table_cat, table_schem, table_name,
    column_name). Tables with no PK get keys = [] (PK-less, still loadable —
    reference spec only requires keys for keyed sources, melt.clj:26).
    Column lists are emitted sorted so descriptors are deterministic
    (the reference uses sets; sorted arrays are the order-stable analogue).
    """
    ident = ["table_cat", "table_schem", "table_name"]
    user_tables = table_set(tables)

    cols = (columns
            .withColumn("column_name", F.lower("column_name"))  # melt.clj:63
            .join(user_tables, ident, "left_semi")              # P4 membership
            .groupBy(*ident)
            .agg(F.sort_array(F.collect_set("column_name")).alias("columns")))

    keys = (key_columns
            .withColumn("column_name", F.lower("column_name"))
            .join(user_tables, ident, "left_semi")
            .groupBy(*ident)
            .agg(F.sort_array(F.collect_set("column_name")).alias("keys")))

    return (user_tables
            .join(cols, ident, "left")
            .join(keys, ident, "left")
            .withColumn("keys", F.coalesce("keys", F.array().cast("array<string>")))
            .orderBy(F.concat_ws(".", *ident)))


def trackable(schema_df: DataFrame) -> DataFrame:
    """CDC-eligible tables: those WITH a primary key (trackable?,
    sql_server.clj:32-33) — SURVEY.md §2.2/P9."""
    return schema_df.filter(F.size("keys") > 0)


def untracked(trackable_df: DataFrame, tracked: DataFrame) -> DataFrame:
    """Trackable minus currently-tracked (sql_server.clj:48-51) — E2 set
    difference as an anti-join on (schema, name)."""
    return trackable_df.join(
        tracked, ["table_schem", "table_name"], "left_anti"
    )
