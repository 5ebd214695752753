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


def delta_available(spark: SparkSession) -> bool:
    """True iff delta-spark is importable AND the session was built with the
    Delta SQL extension (both are required for MERGE INTO to work)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        ext = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        ext = ""
    return "DeltaSparkSessionExtension" in ext


class KeyedStateSink:
    """Latest-state-per-key table maintained by foreachBatch merges.

    backend='auto' uses a real Delta `MERGE INTO` when delta-spark is
    available in the session (the production path — ACID upsert, no snapshot
    swap) and falls back to the versioned-parquet-snapshot + atomic-pointer
    stand-in otherwise (this sandbox has no delta-spark). Both backends
    implement the same contract: tombstones stay IN the stored state, a
    stale delta row never overwrites a newer one (order_col guards the
    update), reads come from `state()` / `compacted_view()`.
    """

    def __init__(self, spark: SparkSession, path: str,
                 key_cols: Sequence[str] = ("topic", "key"),
                 order_col: str = "offset",
                 tombstone_col: str = "value",
                 backend: str = "auto"):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.order_col = order_col
        self.tombstone_col = tombstone_col
        if backend == "auto":
            backend = "delta" if delta_available(spark) else "parquet"
        if backend == "delta" and not delta_available(spark):
            raise RuntimeError(
                "backend='delta' requires delta-spark and a session built "
                "with the Delta SQL extension")
        if backend not in ("delta", "parquet"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
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
        if self.backend == "delta":
            from delta.tables import DeltaTable

            tbl = os.path.join(self.path, "state")
            if not DeltaTable.isDeltaTable(self.spark, tbl):
                return None
            return self.spark.read.format("delta").load(tbl)
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
        if self.backend == "delta":
            self._merge_batch_delta(delta)
            return
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

    def _merge_batch_delta(self, delta: DataFrame) -> None:
        """Real `MERGE INTO` (ACID upsert, no snapshot swap): compact the
        batch to one row per key first, then merge with an order guard so a
        late/stale row never clobbers newer state."""
        from delta.tables import DeltaTable

        cols = [*self.key_cols, self.order_col,
                *[c for c in delta.columns
                  if c not in self.key_cols and c != self.order_col]]
        batch_state = latest_state(delta.select(*cols), self.key_cols,
                                   self.order_col,
                                   tombstone_col=self.tombstone_col,
                                   drop_tombstones=False)
        tbl = os.path.join(self.path, "state")
        if not DeltaTable.isDeltaTable(self.spark, tbl):
            batch_state.write.format("delta").mode("overwrite").save(tbl)
            return
        target = DeltaTable.forPath(self.spark, tbl)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in self.key_cols)
        (target.alias("t")
         .merge(batch_state.alias("s"), cond)
         .whenMatchedUpdateAll(
             condition=f"s.{self.order_col} > t.{self.order_col}")
         .whenNotMatchedInsertAll()
         .execute())

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
