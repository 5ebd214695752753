from .discovery import (
    SYSTEM_SCHEMAS,
    table_set,
    discover_schema,
    trackable,
)
from .snapshot import save_schema, load_schema, schema_diff, schema_check

__all__ = [
    "SYSTEM_SCHEMAS",
    "table_set",
    "discover_schema",
    "trackable",
    "save_schema",
    "load_schema",
    "schema_diff",
    "schema_check",
]
