"""melt_spark — a PySpark-native engine with the query and data-processing
capabilities of reifying/melt (DB→Kafka migration/sync), rebuilt Spark-first.

The reference (/root/reference, Clojure) materializes tables and Kafka topics
as in-memory maps and diffs them (src/jdbc/melt.clj). This package re-expresses
every capability as DataFrame plans so Catalyst/Tungsten pick the physical
strategy and nothing needs to fit in one process's memory:

- data model + canonical JSON form  -> melt_spark.model / melt_spark.canonical
- message construction (topic/key/value) -> melt_spark.operators.messages
- latest-state-per-key (topic compaction) -> melt_spark.operators.latest_state
- diff / sync / verify             -> melt_spark.operators.diff, .sync, .verify
- CDC (change-tracking replay)     -> melt_spark.operators.cdc
- schema discovery / drift         -> melt_spark.catalog
- JDBC / Kafka / parquet sources   -> melt_spark.sources
- streaming (continuous latest-state, CDC tail) -> melt_spark.streaming
- beyond-reference LLM-pipeline ops (dedup, similarity, text, multimodal)
                                   -> melt_spark.functions
"""

__version__ = "0.1.0"

from .model import Source
from .canonical import canonical_json, canonical_key, with_canonical
from .operators import (diff, deleted_keys, latest_state, message_df,
                        replay_changes, change_stats, sync_plan)
from .operators.asof import asof_join
from .operators.verify import verify, verify_sync
from .operators.load import load_sources
from .session import get_spark, tune_session

__all__ = [
    "Source",
    "canonical_json", "canonical_key", "with_canonical",
    "message_df", "latest_state", "diff", "deleted_keys", "sync_plan",
    "replay_changes", "change_stats", "asof_join",
    "verify", "verify_sync", "load_sources",
    "get_spark", "tune_session",
]
