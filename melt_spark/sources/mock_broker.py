"""File-backed mock message broker as a Spark 4 Python DataSource.

The sandbox has no Kafka broker or spark-sql-kafka jar, so the reference's
core I/O boundary (consumer melt.clj:239-299, producer melt.clj:431-443)
could previously only be *restated* (sources/kafka.py), never executed.
This module makes those paths run for real: a partitioned, append-only,
offset-addressed commit log on the filesystem, exposed through the same four
surfaces Spark's Kafka connector has —

  * batch read with atomically-resolved starting/ending offsets (S8/T1),
  * incremental refresh from saved offset watermarks (T5),
  * a producer sink with key-hash partitioning and tombstones (S14/S15),
  * a streaming tail (readStream) and a streaming sink (writeStream, T3),

all via ``spark.read/readStream/write/writeStream.format("melt_broker")``.

Design (mirrors a real broker's log, scaled down):
  <root>/<topic>/.meta.json            {"partitions": N}
  <root>/<topic>/p<k>/seg-<uuid>.jsonl one producer-task's records
  <root>/<topic>/p<k>/manifest.json    {"segments": [{file, base, count}],
                                        "end": next_offset,
                                        "batches": [stream batch ids]}

Segments are written by executor tasks (invisible until committed); the
driver-side ``commit`` assigns base offsets and atomically replaces the
manifest (os.replace), so readers always see a consistent prefix of the log
— the same visibility contract as Kafka's high watermark. Offsets are dense
per partition; a key is hashed (crc32, stand-in for Kafka's murmur2) to a
fixed partition, so per-key order within a producer task is preserved —
Kafka's per-producer guarantee.

On a real cluster the root must be shared storage; this is a test double
for CI and local development, not a Kafka replacement. The production path
remains sources/kafka.py — every function here mirrors its signature so the
two are swappable.
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamWriter, DataSourceWriter,
                                    InputPartition,
                                    SimpleDataSourceStreamReader,
                                    WriterCommitMessage)

ENVELOPE_SCHEMA = ("topic string, partition int, offset bigint,"
                   " timestamp bigint, key string, value string")

WRITE_COLS = ("topic", "key", "value")


# ---------------------------------------------------------------------------
# log primitives (driver + executor side; pure filesystem, no Spark)

def _meta_path(root: str, topic: str) -> str:
    return os.path.join(root, topic, ".meta.json")


def _part_dir(root: str, topic: str, part: int) -> str:
    return os.path.join(root, topic, f"p{part}")


def _manifest_path(root: str, topic: str, part: int) -> str:
    return os.path.join(_part_dir(root, topic, part), "manifest.json")


def create_topic(root: str, topic: str, partitions: int = 4) -> None:
    """Idempotent topic creation."""
    if os.path.exists(_meta_path(root, topic)):
        return
    for p in range(partitions):
        os.makedirs(_part_dir(root, topic, p), exist_ok=True)
        _save_json(_manifest_path(root, topic, p),
                   {"segments": [], "end": 0, "batches": []})
    _save_json(_meta_path(root, topic), {"partitions": partitions})


def topic_partitions(root: str, topic: str) -> int:
    with open(_meta_path(root, topic)) as f:
        return int(json.load(f)["partitions"])


def _save_json(path: str, obj: dict) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic publish


def _load_manifest(root: str, topic: str, part: int) -> dict:
    with open(_manifest_path(root, topic, part)) as f:
        return json.load(f)


def key_partition(key: str | None, num_partitions: int) -> int:
    """Deterministic key->partition (crc32 stand-in for Kafka murmur2);
    NULL keys land on partition 0 (Kafka round-robins; determinism wins
    here so replay tests are stable)."""
    if key is None:
        return 0
    return zlib.crc32(key.encode("utf-8")) % num_partitions


def end_offsets(root: str, topic: str) -> dict[int, int]:
    """Next offset to be written, per partition (== Kafka end offset)."""
    return {p: _load_manifest(root, topic, p)["end"]
            for p in range(topic_partitions(root, topic))}


def _scan_segments(root: str, topic: str, part: int, start: int,
                   end: int) -> Iterator[tuple]:
    """Yield envelope tuples for offsets in [start, end)."""
    man = _load_manifest(root, topic, part)
    for seg in man["segments"]:
        base, count = seg["base"], seg["count"]
        if base + count <= start or base >= end:
            continue
        path = os.path.join(_part_dir(root, topic, part), seg["file"])
        with open(path) as f:
            for i, line in enumerate(f):
                off = base + i
                if off < start or off >= end:
                    continue
                rec = json.loads(line)
                yield (topic, part, off, rec["ts"], rec["k"], rec["v"])


# ---------------------------------------------------------------------------
# offset-range resolution (driver side — the atomic snapshot that lets the
# batch source drop the reference's "read twice" workaround, melt.clj:342-351)

def _resolve_range(root: str, topic: str, part: int, starting, ending,
                   ) -> tuple[int, int]:
    man_end = _load_manifest(root, topic, part)["end"]

    def side(spec, default_earliest: bool) -> int:
        if spec == "earliest":
            return 0
        if spec == "latest":
            return man_end
        per_part = spec.get(topic, {})
        if str(part) in per_part:
            v = int(per_part[str(part)])
            return man_end if v == -1 else (0 if v == -2 else v)
        return 0 if default_earliest else man_end

    return side(starting, True), side(ending, False)


def _parse_offsets_spec(spec: str):
    if spec in ("earliest", "latest"):
        return spec
    return json.loads(spec)  # Kafka JSON form {"topic": {"0": off}}


# ---------------------------------------------------------------------------
# the DataSource

@dataclass
class _ScanPart(InputPartition):
    topic: str
    part: int
    start: int
    end: int


class MeltBrokerDataSource(DataSource):
    """format("melt_broker") — options:
    path (broker root), subscribe (comma-separated topics; readers),
    startingOffsets / endingOffsets ('earliest'|'latest'|Kafka JSON form;
    batch reader), partitions (writer topic auto-create, default 4)."""

    @classmethod
    def name(cls) -> str:
        return "melt_broker"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> "MeltBrokerReader":
        return MeltBrokerReader(self.options)

    def simpleStreamReader(self, schema) -> "MeltBrokerStreamReader":
        return MeltBrokerStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "MeltBrokerWriter":
        if overwrite:
            raise ValueError("melt_broker is append-only (a commit log); "
                             "overwrite/truncate is not supported")
        return MeltBrokerWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "MeltBrokerStreamWriter":
        return MeltBrokerStreamWriter(self.options)


class MeltBrokerReader(DataSourceReader):
    """Bounded snapshot read (S8/T1). Offset ranges are resolved ONCE at
    planning time from the manifests — concurrent producers don't move the
    goalposts mid-read."""

    def __init__(self, options):
        self.root = options["path"]
        self.topics = [t for t in options.get("subscribe", "").split(",") if t]
        starting = _parse_offsets_spec(options.get("startingoffsets",
                                                   "earliest"))
        ending = _parse_offsets_spec(options.get("endingoffsets", "latest"))
        self.ranges: list[_ScanPart] = []
        for topic in self.topics:
            for p in range(topic_partitions(self.root, topic)):
                s, e = _resolve_range(self.root, topic, p, starting, ending)
                if e > s:
                    self.ranges.append(_ScanPart(topic, p, s, e))

    def partitions(self):
        # one Spark input partition per broker partition slice — the same
        # parallelism contract as the Kafka connector
        return self.ranges or [_ScanPart("", -1, 0, 0)]

    def read(self, partition: _ScanPart):
        if partition.part < 0:
            return iter(())
        return _scan_segments(self.root, partition.topic, partition.part,
                              partition.start, partition.end)


class MeltBrokerStreamReader(SimpleDataSourceStreamReader):
    """Continuous tail (S9/T3): micro-batches of everything appended since
    the last checkpointed offset map. Offsets are
    {"<topic>": {"<part>": next_offset}} — Spark checkpoints them, replacing
    the reference's hand-rolled :offsets map (melt.clj:511-523)."""

    def __init__(self, options):
        self.root = options["path"]
        self.topics = [t for t in options.get("subscribe", "").split(",") if t]
        starting = options.get("startingoffsets", "earliest")
        self._initial = {}
        for topic in self.topics:
            if starting == "latest":
                ends = end_offsets(self.root, topic)
                self._initial[topic] = {str(p): e for p, e in ends.items()}
            else:
                self._initial[topic] = {
                    str(p): 0
                    for p in range(topic_partitions(self.root, topic))}

    def initialOffset(self) -> dict:
        return self._initial

    def read(self, start: dict):
        rows: list[tuple] = []
        new = {t: dict(pm) for t, pm in start.items()}
        for topic in self.topics:
            ends = end_offsets(self.root, topic)
            for p, e in ends.items():
                s = int(start.get(topic, {}).get(str(p), 0))
                if e > s:
                    rows.extend(_scan_segments(self.root, topic, p, s, e))
                new.setdefault(topic, {})[str(p)] = max(e, s)
        return iter(rows), new

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay after failure: the log is persistent, so the window is
        # simply re-scanned — deterministic by construction
        for topic in self.topics:
            for p_str, e in end.get(topic, {}).items():
                s = int(start.get(topic, {}).get(p_str, 0))
                yield from _scan_segments(self.root, topic, int(p_str),
                                          s, int(e))


@dataclass
class _SegmentMsg(WriterCommitMessage):
    segments: list  # [(topic, part, filename, count), ...]


def _write_segments(root: str, default_partitions: int,
                    iterator: Iterator) -> _SegmentMsg:
    """Executor side: bucket rows by (topic, key-hash partition), append one
    segment file per bucket. Files are invisible until the driver commits
    them into the manifest."""
    buckets: dict[tuple[str, int], list[dict]] = {}
    nparts: dict[str, int] = {}
    for row in iterator:
        topic = row["topic"]
        if topic not in nparts:
            try:
                nparts[topic] = topic_partitions(root, topic)
            except FileNotFoundError:
                # auto-create (driver may race; create_topic is idempotent
                # and meta publish is atomic)
                create_topic(root, topic, default_partitions)
                nparts[topic] = topic_partitions(root, topic)
        part = key_partition(row["key"], nparts[topic])
        ts = row["timestamp"] if "timestamp" in row.__fields__ else None
        buckets.setdefault((topic, part), []).append(
            {"k": row["key"], "v": row["value"], "ts": ts})
    segments = []
    for (topic, part), recs in sorted(buckets.items()):
        fname = f"seg-{uuid.uuid4().hex}.jsonl"
        path = os.path.join(_part_dir(root, topic, part), fname)
        with open(path, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        segments.append((topic, part, fname, len(recs)))
    return _SegmentMsg(segments=segments)


def _commit_segments(root: str, messages, batch_id: int | None) -> None:
    """Driver side: assign base offsets in task order and atomically publish
    the new manifests. With a batch_id (stream sink), replayed batches are
    skipped — idempotent exactly-once append per micro-batch."""
    per_part: dict[tuple[str, int], list] = {}
    for msg in messages:
        if msg is None:
            continue
        for topic, part, fname, count in msg.segments:
            per_part.setdefault((topic, part), []).append((fname, count))
    touched = sorted({t for (t, _p) in per_part})
    skip: set[str] = set()
    if batch_id is not None:
        # batch-id ledger lives on each topic's partition 0 manifest; a
        # replayed micro-batch (stream restart) appends nothing twice
        for topic in touched:
            if batch_id in _load_manifest(root, topic, 0).get("batches", []):
                skip.add(topic)
    for (topic, part), segs in sorted(per_part.items()):
        if topic in skip:
            continue
        man = _load_manifest(root, topic, part)
        base = man["end"]
        for fname, count in segs:
            man["segments"].append(
                {"file": fname, "base": base, "count": count})
            base += count
        man["end"] = base
        if batch_id is not None and part == 0:
            man.setdefault("batches", []).append(batch_id)
        _save_json(_manifest_path(root, topic, part), man)
    if batch_id is not None:
        for topic in touched:
            if topic in skip or (topic, 0) in per_part:
                continue
            man = _load_manifest(root, topic, 0)
            man.setdefault("batches", []).append(batch_id)
            _save_json(_manifest_path(root, topic, 0), man)


def _abort_segments(root: str, messages) -> None:
    for msg in messages:
        if msg is None:
            continue
        for topic, part, fname, _count in msg.segments:
            try:
                os.remove(os.path.join(_part_dir(root, topic, part), fname))
            except OSError:
                pass


class MeltBrokerWriter(DataSourceWriter):
    """Producer sink (S14): at-least-once per save() call, per-key ordering
    within a task (Kafka's per-producer contract). NULL value = tombstone
    (S15) — stored, not dropped; compaction interprets it."""

    def __init__(self, options):
        self.root = options["path"]
        self.default_partitions = int(options.get("partitions", 4))

    def write(self, iterator):
        return _write_segments(self.root, self.default_partitions, iterator)

    def commit(self, messages):
        _commit_segments(self.root, messages, None)

    def abort(self, messages):
        _abort_segments(self.root, messages)


class MeltBrokerStreamWriter(DataSourceStreamWriter):
    """writeStream sink (T3): per-micro-batch commit with batch-id dedup, so
    a restarted query that replays its last batch appends nothing twice."""

    def __init__(self, options):
        self.root = options["path"]
        self.default_partitions = int(options.get("partitions", 4))

    def write(self, iterator):
        return _write_segments(self.root, self.default_partitions, iterator)

    def commit(self, messages, batchId):
        _commit_segments(self.root, messages, batchId)

    def abort(self, messages, batchId):
        _abort_segments(self.root, messages)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(MeltBrokerDataSource)


# ---------------------------------------------------------------------------
# kafka.py-mirroring convenience API (swap module, keep call sites)

def read_topics(spark: SparkSession, broker_path: str, topics: Sequence[str],
                starting_offsets: str = "earliest",
                ending_offsets: str = "latest") -> DataFrame:
    """Bounded snapshot (mirrors kafka.read_topics; S8/T1)."""
    return (spark.read.format("melt_broker")
            .option("path", broker_path)
            .option("subscribe", ",".join(topics))
            .option("startingOffsets", starting_offsets)
            .option("endingOffsets", ending_offsets)
            .load())


def write_messages(messages: DataFrame, broker_path: str,
                   partitions: int = 4) -> None:
    """Producer sink (mirrors kafka.write_messages; S14/S15)."""
    (messages.select(*WRITE_COLS)
     .write.format("melt_broker")
     .option("path", broker_path)
     .option("partitions", partitions)
     .mode("append")
     .save())


def count_topic(spark: SparkSession, broker_path: str, topic: str) -> int:
    """S10: message count currently in a topic."""
    return read_topics(spark, broker_path, [topic]).count()


def tail_topics(spark: SparkSession, broker_path: str,
                topics: Sequence[str],
                starting_offsets: str = "earliest") -> DataFrame:
    """Continuous tail (S9): a streaming DataFrame of the record envelope."""
    return (spark.readStream.format("melt_broker")
            .option("path", broker_path)
            .option("subscribe", ",".join(topics))
            .option("startingOffsets", starting_offsets)
            .load())
