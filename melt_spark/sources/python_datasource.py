"""Custom connector via Spark 4's Python DataSource API.

This is HOW a source Spark lacks gets packaged (the reference's SQL Server
change-tracking feed, a proprietary changelog service, …): implement
DataSource/DataSourceReader, register once, then `spark.read.format(name)`
— partition planning, option plumbing and schema contract included, no JVM
code. The reader here is a deterministic synthetic change feed (versions →
arithmetic rows) so the whole connector path is oracle-checkable; a real
CT connector swaps the arithmetic for a CHANGETABLE fetch per partition
(version ranges = input partitions → parallel reads).
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

SCHEMA = ("c_custkey bigint, sys_change_operation string,"
          " sys_change_version bigint")


def _change_row(v: int) -> tuple:
    if v % 5 == 0:
        op = "I"
    elif v % 7 == 0:
        op = "D"
    else:
        op = "U"
    return (v % 150 + 1, op, v)


class MeltChangesDataSource(DataSource):
    """format("melt_changes"): synthetic CHANGETABLE-shaped feed.

    Options: from_version (exclusive lower bound, default 0), count (rows,
    default 100), partitions (parallel readers, default 4).
    Row rule (pure arithmetic — restated in the DuckDB oracle):
      versions v in (from_version, from_version + count]
      op: 'I' if v % 5 == 0 else 'D' if v % 7 == 0 else 'U'
      pk: v % 150 + 1
    """

    @classmethod
    def name(cls) -> str:
        return "melt_changes"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "MeltChangesReader":
        return MeltChangesReader(self.options)

    def simpleStreamReader(self, schema) -> "MeltChangesStreamReader":
        return MeltChangesStreamReader(self.options)


class MeltChangesReader(DataSourceReader):
    def __init__(self, options):
        self.start = int(options.get("from_version", 0))
        self.count = int(options.get("count", 100))
        self.num_parts = int(options.get("partitions", 4))

    def partitions(self):
        # version-range striping: each partition reads a disjoint slice —
        # the same shape a real connector uses for parallel range reads
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        i = partition.value
        for v in range(self.start + 1 + i, self.start + self.count + 1,
                       self.num_parts):
            yield _change_row(v)


class MeltChangesStreamReader(SimpleDataSourceStreamReader):
    """The CDC tail as a FIRST-CLASS streaming source: readStream micro-
    batches windowed by change version — exactly the reference's
    send-changes loop (sql_server.clj:134-153) with Spark's own offset
    tracking/checkpointing replacing the hand-rolled version chaining.
    SURVEY.md §4 called this out as the one source Spark doesn't provide;
    this is its packaging.

    Offsets are {"version": v}; each batch covers (v, v + batch_size],
    capped at max_version (the feed's current end — a real CT connector
    queries CHANGE_TRACKING_CURRENT_VERSION() here).
    """

    def __init__(self, options):
        self.start = int(options.get("from_version", 0))
        self.batch = int(options.get("batch_size", 100))
        self.max_version = int(options.get("max_version", 300))

    def initialOffset(self) -> dict:
        return {"version": self.start}

    def read(self, start: dict):
        lo = start["version"]
        hi = min(lo + self.batch, self.max_version)
        rows = [_change_row(v) for v in range(lo + 1, hi + 1)]
        return iter(rows), {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic regeneration for replay after failure — a real
        # connector re-runs the CHANGETABLE query for this version window
        return iter(_change_row(v)
                    for v in range(start["version"] + 1, end["version"] + 1))


def register(spark) -> None:
    spark.dataSource.register(MeltChangesDataSource)
