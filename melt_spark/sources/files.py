"""CSV / JSON-lines file sources and sinks — the interchange formats a
sync tool meets at its edges (exports from legacy systems in, feeds to
downstream consumers out). Parquet stays the performance format
(sources/parquet.py); these are the compatibility surface.

Scale notes:
- Always pass an explicit schema on read. Schema inference is a full
  extra pass over the data (2× the 100 TB scan) and type-guesses
  differently run-to-run on dirty data; both are disqualifying.
- CSV is splittable only without multiline quoting; JSON-lines is always
  splittable line-wise. Both scan slower than parquet and push no
  filters down — land interchange data into parquet once, then query.
- Writers partition by a column when asked (directory-level pruning for
  whoever reads the export next) and never coalesce to one file — a
  single-file export serializes the whole job through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CSV_OPTS = {
    "header": "true",
    "escape": '"',          # RFC-4180 style doubled quotes
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "mode": "FAILFAST",     # surface bad rows at read time, not 3 joins later
}

JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "mode": "FAILFAST",
}


def read_csv(spark: SparkSession, path: str, schema: str,
             **options: str) -> DataFrame:
    """CSV with an explicit DDL schema (mandatory — see module note)."""
    opts = {**CSV_OPTS, **options}
    return spark.read.schema(schema).options(**opts).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str,
               **options: str) -> DataFrame:
    """JSON-lines with an explicit DDL schema (mandatory)."""
    opts = {**JSON_OPTS, **options}
    return spark.read.schema(schema).options(**opts).json(path)


def write_csv(df: DataFrame, path: str, partition_by: str | None = None,
              **options: str) -> None:
    opts = {**CSV_OPTS, **options}
    opts.pop("mode", None)
    w = df.write.mode("overwrite").options(**opts)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.csv(path)


def write_jsonl(df: DataFrame, path: str, partition_by: str | None = None,
                **options: str) -> None:
    opts = {**JSON_OPTS, **options}
    opts.pop("mode", None)
    w = df.write.mode("overwrite").options(**opts)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)
