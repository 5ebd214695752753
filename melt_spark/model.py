"""Source descriptors — the melt "table descriptor" re-expressed for Spark.

Reference: a source is a map with ::name/::cat/::schema identity, ::columns
(set of lowercased names), ::keys (PK column set), optional ::sql /
::sql-params custom query, and a per-source ::xform transducer applied to
every message (reference src/jdbc/melt.clj:26-31,58-61,89-100,141-151).

Here a Source is a plain dataclass; transforms are DataFrame→DataFrame
callables (the ::xform equivalent — SURVEY.md §2.10) applied identically in
the load path and the diff/verify path (the reference had to apply the xform
in both paths or the diff would lie, melt.clj:396-401 vs :456-465 — we enforce
that by routing both paths through Source.messages()).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame


@dataclass
class Source:
    """Descriptor for one replicated table/query.

    keys=() models a PK-less table: no key is projected and a transform must
    supply one (the reference's value-as-key pattern,
    integration/jdbc/melt/integration_test.clj:158-184).
    """

    name: str
    schema: str = "main"
    catalog: Optional[str] = None
    columns: tuple[str, ...] = ()          # lowercased; () = discover at read
    keys: tuple[str, ...] = ()             # PK column names (lowercased)
    sql: Optional[str] = None              # custom query replaces table scan
    sql_params: tuple = ()
    topic: Optional[str] = None            # default derived topic if None
    transforms: tuple[Callable[[DataFrame], DataFrame], ...] = field(
        default_factory=tuple
    )
    # CDC hook: custom change-tracking SQL (reference sql_server.clj:140)
    change_tracking_sql: Optional[str] = None
    # Pipeline-level timestamp wire format for EVERY encode path of this
    # source (key + value + CDC). None = engine default (ISO_MILLIS).
    # Set canonical.ISO_SECONDS for byte-parity with topics produced by the
    # reference tool (golden "2007-08-01T00:00:00Z", integration_test.clj:68)
    # — one setting here covers load, diff, verify, and CDC because all of
    # them route through Source.messages()/replay_changes().
    ts_format: Optional[str] = None

    @property
    def full_name(self) -> str:
        parts = [p for p in (self.catalog, self.schema, self.name) if p]
        return ".".join(parts)

    @property
    def default_topic(self) -> str:
        # reference topic naming convention "melt.<schema>.<name>"
        # (integration_test.clj:44-45)
        return self.topic or f"melt.{self.schema}.{self.name}"

    @property
    def keyed(self) -> bool:
        return len(self.keys) > 0

    def apply_transforms(self, df: DataFrame) -> DataFrame:
        for t in self.transforms:
            df = t(df)
        return df

    def messages(self, df: DataFrame) -> DataFrame:
        """Rows → message envelope (topic, key, value, …) with this source's
        transforms applied — the single shared pipeline used by load AND
        diff/verify."""
        from .operators.messages import message_df

        return self.apply_transforms(message_df(df, self))
