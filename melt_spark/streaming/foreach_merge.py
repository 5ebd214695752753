"""foreachBatch MERGE sink — the production path for continuous
latest-state.

Complete-mode memory sinks (continuous.py demos) re-emit ALL state every
batch — fine for tests, wrong at 100 TB. The scalable shape is foreachBatch:
each micro-batch merges its delta into a keyed table. On a real cluster the
table is Delta/Iceberg/Hudi and the merge is `MERGE INTO` (ACID, no
swap dance); this environment has plain parquet only, so KeyedStateSink
implements the same contract with versioned snapshot directories and an
atomic pointer file — enough to make the merge semantics testable.

Merge per batch = union(current, delta) → latest_state → write new version.
Incremental cost is O(|state| + |delta|) per batch; with the state bucketed
on key (sources/bucketing.py) the union-compact is shuffle-light.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.latest_state import latest_state


class KeyedStateSink:
    """Latest-state-per-key table maintained by foreachBatch merges."""

    def __init__(self, spark: SparkSession, path: str,
                 key_cols: Sequence[str] = ("topic", "key"),
                 order_col: str = "offset",
                 tombstone_col: str = "value"):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.order_col = order_col
        self.tombstone_col = tombstone_col
        Path(path).mkdir(parents=True, exist_ok=True)

    # -- snapshot pointer ---------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _current_version(self) -> int | None:
        if os.path.exists(self._pointer):
            with open(self._pointer) as f:
                return json.load(f)["version"]
        return None

    def _publish(self, version: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._pointer)  # atomic pointer swap

    def state(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    # -- the foreachBatch handler -------------------------------------------
    def merge_batch(self, delta: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch of changelog rows. Keep tombstones IN the
        stored state (a later reinsert must still lose to nothing, and a
        tombstone must survive until compaction horizon) and filter them at
        read time if desired."""
        current = self.state()
        cols = [*self.key_cols, self.order_col,
                *[c for c in delta.columns
                  if c not in self.key_cols and c != self.order_col]]
        merged = delta.select(*cols)
        if current is not None:
            merged = current.select(*cols).unionByName(merged)
        compacted = latest_state(merged, self.key_cols, self.order_col,
                                 tombstone_col=self.tombstone_col,
                                 drop_tombstones=False)
        new_version = (self._current_version() or 0) + 1
        out = os.path.join(self.path, f"v{new_version}")
        compacted.write.mode("overwrite").parquet(out)
        old = self._current_version()
        self._publish(new_version)
        if old is not None:  # retain only the published snapshot
            shutil.rmtree(os.path.join(self.path, f"v{old}"),
                          ignore_errors=True)

    def attach(self, changelog_stream: DataFrame, checkpoint: str):
        """Wire the sink to a stream; returns the StreamingQuery."""
        return (changelog_stream.writeStream
                .foreachBatch(self.merge_batch)
                .option("checkpointLocation", checkpoint)
                .outputMode("update")
                .start())

    def compacted_view(self) -> DataFrame | None:
        """Read-side view with tombstones dropped (the topic-state the
        diff/verify operators consume)."""
        st = self.state()
        if st is None:
            return None
        return st.filter(st[self.tombstone_col].isNotNull())
