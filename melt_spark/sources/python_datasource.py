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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = ("c_custkey bigint, sys_change_operation string,"
          " sys_change_version bigint")


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
            if v % 5 == 0:
                op = "I"
            elif v % 7 == 0:
                op = "D"
            else:
                op = "U"
            yield (v % 150 + 1, op, v)


def register(spark) -> None:
    spark.dataSource.register(MeltChangesDataSource)
