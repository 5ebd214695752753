"""SQL Server change-tracking administration (reference §2.11 / D1-D4).

Reference (src/jdbc/melt/sql_server.clj:9-61): ALTER DATABASE / ALTER TABLE
statements enabling change tracking, a catalog query listing tracked tables,
and track-all / untrack-all loops with a dry-run mode that prints the SQL.

Spark has no DDL passthrough of its own; these are pure SQL-string builders
plus an `execute` hook the caller wires to a live JDBC connection (py4j
java.sql.Statement or any DB-API cursor). Everything here is unit-testable
without a database.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence


def enable_db_change_tracking_sql(database: str, retention_days: int = 2,
                                  auto_cleanup: bool = True) -> str:
    """D1 (sql_server.clj:9-14)."""
    cleanup = "ON" if auto_cleanup else "OFF"
    return (f"Alter Database [{database}] Set CHANGE_TRACKING = ON "
            f"(CHANGE_RETENTION = {retention_days} DAYS, "
            f"AUTO_CLEANUP = {cleanup})")


def enable_table_tracking_sql(schema: str, table: str) -> str:
    """D2 enable (sql_server.clj:19-24)."""
    return (f"Alter Table [{schema}].[{table}] Enable CHANGE_TRACKING "
            f"With (TRACK_COLUMNS_UPDATED = OFF)")


def disable_table_tracking_sql(schema: str, table: str) -> str:
    """D2 disable (sql_server.clj:26-30)."""
    return f"Alter Table [{schema}].[{table}] Disable CHANGE_TRACKING"


TRACKED_TABLES_SQL = (
    "Select s.name schema_name, t.name table_name "
    "From sys.change_tracking_tables ct "
    "Join sys.tables t On t.object_id = ct.object_id "
    "Join sys.schemas s On s.schema_id = t.schema_id"
)  # D3 (sql_server.clj:35-46)

CURRENT_VERSION_SQL = "Select CHANGE_TRACKING_CURRENT_VERSION() cv"
MIN_VALID_VERSION_SQL = (
    "Select CHANGE_TRACKING_MIN_VALID_VERSION(Object_Id('{schema}.{table}')) mv"
)  # S13 (sql_server.clj:100-109)


def track_all(tables: Iterable[tuple[str, str]],
              execute: Callable[[str], None] | None = None) -> list[str]:
    """D4 (sql_server.clj:53-61): enable tracking on every (schema, table).
    With execute=None this is the dry run — returns the SQL it would run."""
    stmts = [enable_table_tracking_sql(s, t) for s, t in tables]
    if execute is not None:
        for s in stmts:
            execute(s)
    return stmts


def untrack_all(tables: Iterable[tuple[str, str]],
                execute: Callable[[str], None] | None = None) -> list[str]:
    stmts = [disable_table_tracking_sql(s, t) for s, t in tables]
    if execute is not None:
        for s in stmts:
            execute(s)
    return stmts


def change_sql(schema: str, table: str, pk_cols: Sequence[str],
               value_cols: Sequence[str], from_version: int) -> str:
    """S12/J1: the CHANGETABLE left-join query (change-entity-sql,
    sql_server.clj:76-98) — run via spark.read.jdbc(query=...) so the
    version predicate and the join are pushed to the database."""
    ct_cols = ", ".join(
        ["ct.sys_change_operation", "ct.sys_change_version",
         "ct.sys_change_creation_version"]
        + [f"ct.[{c}]" for c in pk_cols])
    t_cols = ", ".join(f"t.[{c}]" for c in value_cols if c not in pk_cols)
    on = " And ".join(f"ct.[{c}] = t.[{c}]" for c in pk_cols)
    return (f"Select {ct_cols}, {t_cols} "
            f"From CHANGETABLE(CHANGES [{schema}].[{table}], {from_version}) ct "
            f"Left Outer Join [{schema}].[{table}] t On {on} "
            f"Order By ct.sys_change_version")
