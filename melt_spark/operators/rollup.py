"""Time-bucket cascade rollup — hypertable-style continuous aggregates.

The reference has no time-series rollup (SURVEY.md §2.12); at 100 TB the
naive approach — scan the raw table once per resolution — reads the corpus
N times. Timescale-style hypertables instead maintain each coarser
resolution FROM the next finer one (a "continuous aggregate cascade"):
daily is 24 hourly rows per key, monthly is ~30 daily rows — after the
first (hourly) pass every further resolution aggregates input that is
orders of magnitude smaller than the raw data.

Only cascade-able aggregates are allowed (sum/count/min/max — count
re-aggregates as sum). avg = sum/count at read time; percentiles need
sketches and are out of scope here.

All bucket arithmetic is epoch-aligned integer flooring in pure Catalyst —
no UDF, and each rollup level is one map-side-combining groupBy whose
shuffle carries only (keys × buckets) rows.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
# how each aggregate folds into the next-coarser level
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def time_bucket(col: Column | str, width_seconds: int) -> Column:
    """Floor a timestamp to a fixed-width, epoch-aligned bucket (the
    TimescaleDB ``time_bucket`` / DuckDB ``time_bucket`` shape). Session
    timezone must be pinned (melt_spark pins UTC) so bucket edges are
    engine-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / width_seconds).cast("long")
        * width_seconds)


def cascade_rollup(df: DataFrame, ts_col: str, keys: Sequence[str],
                   aggs: Mapping[str, tuple[str, str]],
                   widths: Sequence[int],
                   bucket_col: str = "bucket_ts") -> dict[int, DataFrame]:
    """Roll ``df`` up to every resolution in ``widths`` (seconds,
    ascending; each must divide the next so finer buckets nest exactly in
    coarser ones). ``aggs`` maps output column -> (input column, kind)
    with kind in sum|count|min|max.

    Returns {width: DataFrame(keys…, bucket_col, aggs…)}. Level 0
    aggregates the raw frame; every later level aggregates the PREVIOUS
    level's output — the raw table is scanned exactly once.
    """
    widths = list(widths)
    if not widths:
        raise ValueError("need at least one bucket width")
    if any(w <= 0 for w in widths):
        raise ValueError(f"widths must be positive: {widths}")
    if any(b % a for a, b in zip(widths, widths[1:])):
        raise ValueError(
            f"each width must divide the next (nesting buckets): {widths}")
    for name, (_c, kind) in aggs.items():
        if kind not in _FIRST:
            raise ValueError(f"{name}: unsupported aggregate {kind!r} "
                             f"(cascade-able: {sorted(_FIRST)})")

    out: dict[int, DataFrame] = {}
    cur = (df.groupBy(*keys, time_bucket(ts_col, widths[0]).alias(bucket_col))
           .agg(*[_FIRST[kind](c).alias(name)
                  for name, (c, kind) in aggs.items()]))
    out[widths[0]] = cur
    for w in widths[1:]:
        cur = (cur.groupBy(*keys,
                           time_bucket(bucket_col, w).alias(bucket_col))
               .agg(*[_MERGE[kind](name).alias(name)
                      for name, (_c, kind) in aggs.items()]))
        out[w] = cur
    return out
