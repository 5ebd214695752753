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
