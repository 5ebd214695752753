"""Shared plan-shape helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_input(df: DataFrame, key_col: str) -> DataFrame:
    """Ensure a CPU-heavy per-row stage isn't pinned to a handful of input
    splits: a single parquet file scans as ONE task, serializing explodes,
    folds and hash loops on a 32-core box. If the frame comes from fewer
    files than cores, repartition by `key_col` once — on a real multi-file
    100 TB table (files >> cores) this is a no-op, so the guard costs
    nothing at scale. An EMPTY inputFiles() listing means non-file
    provenance (in-memory, post-shuffle): trust the existing partitioning
    rather than pay an unconditional shuffle. (Same pattern as
    dedup.shingles, where it was first needed.)"""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < cores:
        return df.repartition(cores, F.col(key_col))
    return df
