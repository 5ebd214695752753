from .parquet import TABLES, read_table, load_tables
from .changelog import events_changelog, cdc_changes_from_events

__all__ = [
    "TABLES",
    "read_table",
    "load_tables",
    "events_changelog",
    "cdc_changes_from_events",
]
