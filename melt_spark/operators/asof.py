"""As-of (temporal) join — latest right-side row at or before each left
timestamp, per key.

The reference has no as-of join (SURVEY.md §2.12); training-data pipelines
need it constantly ("the feature value as of the event time" — no leakage
from the future). Spark lacks a native ASOF JOIN, so this composes existing
operators (SURVEY.md build directive: composition before UDFs):

    left-join on key AND right.ts <= left.ts  →  max_by per left row

One shuffle on the key; per-key fan-out is bounded by rows-per-key on the
right (if a key has huge right-side history, pre-prune the right side to a
time horizon first). This beats the window-over-union trick when the right
side is far smaller than the left (the common dimension-history case), and
Catalyst broadcasts the right side when it fits.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: Sequence[str], left_ts: str, right_ts: str,
              right_cols: Sequence[str] | None = None,
              how: str = "left") -> DataFrame:
    """For every left row, attach the right row with the greatest right_ts
    <= left_ts sharing the key. how='left' keeps left rows with no
    qualifying match (right columns NULL); how='inner' drops them.

    left rows must be unique over their full column tuple (the group-back
    key). Output: all left columns + right_cols (prefixed names preserved).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    on = list(on)
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in on]
    if right_ts not in right_cols:
        right_cols.append(right_ts)

    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    cond = reduce(lambda a, b: a & b,
                  [left[k].eqNullSafe(r[f"__r_{k}"]) for k in on])
    cond = cond & (r[f"__r_{right_ts}"] <= left[left_ts])
    joined = left.join(r, cond, "left")

    left_cols = left.columns
    packed = F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols])
    # max_by skips NULL-ordered rows: an unmatched left row (all-null right
    # side) yields NULL right columns, preserving left semantics
    agg = (joined.groupBy(*left_cols)
           .agg(F.max_by(packed, F.col(f"__r_{right_ts}")).alias("__r")))
    out = agg.select(
        *left_cols,
        *[F.col(f"__r.{c}").alias(c) for c in right_cols])
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out
