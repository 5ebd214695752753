"""CDC tail — version-checkpointed micro-batching (reference T6/T7).

Reference: send-changes replays CHANGETABLE rows past a version and returns
the new max version; callers chain versions across calls
(sql_server.clj:134-153, integration_test.clj:203-226). sync-kafka captures
current-version BEFORE the full backfill then tails from it — the
overlap-not-gap handoff (sql_server.clj:155-162).

Spark restatement: Spark has no SQL-Server-change-tracking source, so the
micro-batch loop lives in the driver (exactly where Structured Streaming's
own microbatch engine runs): each tick reads only rows past the checkpointed
version (a pushed-down predicate), replays them through the same message
pipeline as batch sync, sends, and persists the new version. The version
file is the checkpointLocation analogue.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, TYPE_CHECKING

from pyspark.sql import DataFrame

from ..operators.cdc import change_stats, replay_changes

if TYPE_CHECKING:
    from ..model import Source


@dataclass
class CdcTail:
    """Version-checkpointed incremental replay for one source.

    fetch_changes: () -> DataFrame of CHANGETABLE-shaped rows (in production
    a JDBC `query=` read of the change table; in tests a fixture DataFrame).
    send: messages DataFrame -> None (Kafka sink / test collector).
    """

    source: "Source"
    fetch_changes: Callable[[], DataFrame]
    send: Callable[[DataFrame], None]
    checkpoint_path: str = "target/cdc_version.json"

    # -- checkpoint ---------------------------------------------------------
    def load_version(self) -> int:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f).get(self.source.full_name, 0)
        return 0

    def save_version(self, version: int) -> None:
        Path(self.checkpoint_path).parent.mkdir(parents=True, exist_ok=True)
        state = {}
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                state = json.load(f)
        state[self.source.full_name] = version
        with open(self.checkpoint_path, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)

    # -- one micro-batch ----------------------------------------------------
    def tick(self) -> dict:
        """Replay changes past the checkpoint; returns {'version',
        'sent_count'} (version unchanged when nothing new arrived)."""
        from_version = self.load_version()
        msgs = replay_changes(self.fetch_changes(), self.source,
                              from_version=from_version)
        stats = change_stats(msgs)
        if stats["sent_count"] > 0:
            self.send(msgs)
            self.save_version(int(stats["version"]))
            return stats
        return {"version": from_version, "sent_count": 0}

    # -- backfill handoff ---------------------------------------------------
    def full_sync_then_tail(self, current_version: int,
                            backfill: Callable[[], None]) -> dict:
        """T7: record the change version FIRST, run the full backfill, then
        start tailing from the recorded version. Changes landing during the
        backfill replay again afterwards — at-least-once, never a gap."""
        backfill()
        self.save_version(current_version)
        return self.tick()


class CdcTailSet:
    """Tail MANY tables with one shared version-vector checkpoint file —
    the multi-table orchestration the reference leaves to its caller
    (track-all enables tracking per table, sql_server.clj:53-61; version
    chaining is per-table, integration_test.clj:203-226).

    Each tick replays every table's delta independently (tables progress at
    their own version pace); the checkpoint file maps full_name → version,
    so a crash resumes every table exactly where it left off."""

    def __init__(self, tails: list[CdcTail]):
        names = [t.source.full_name for t in tails]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate sources in tail set: {names}")
        self.tails = tails

    def tick_all(self) -> dict[str, dict]:
        """One micro-batch across every table; returns per-table stats."""
        return {t.source.full_name: t.tick() for t in self.tails}

    def total_sent(self, stats: dict[str, dict]) -> int:
        return sum(s["sent_count"] for s in stats.values())
