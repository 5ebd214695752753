"""Range (interval) join — match points to the intervals containing them,
bucketized so it runs as an equi-join at any scale.

The reference has no range join (SURVEY.md §2.12); training pipelines need
it for "which campaign / session / validity window covers this event".
Spark has no native RANGE JOIN either: a raw
``points.join(intervals, (p >= lo) & (p <= hi))`` plans as a broadcast
nested-loop (fine only when intervals fit in one broadcast) or, with a key
equality, a sort-merge join whose inequality residual still scans every
interval per key.

Scale path — the standard binning trick (used by Databricks' range-join
optimization and Flink's interval join):

  1. pick a bucket width ``w`` (≈ the typical interval length);
  2. every interval explodes to the bucket ids it overlaps
     (``sequence(floor(lo/w), floor(hi/w))`` — pure Catalyst, no UDF);
  3. every point maps to ONE bucket id (``floor(p/w)``);
  4. equi-join on (keys…, bucket), then apply the exact
     ``lo <= p <= hi`` residual.

Each (point, interval) pair meets in exactly one bucket — the point's own —
so no dedup pass is needed. Cost: the exploded interval side grows by
``len/w`` rows per interval; pick ``w`` so that factor is small (single
digits). The join itself is a plain shuffled/broadcast hash equi-join that
AQE can re-plan, instead of an O(points × intervals-per-key) scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               on: Sequence[str] = (), bucket_width: float | int = 1,
               how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (and equal ``on`` keys, if given).

    point/start/end must be mutually comparable numerics (cast timestamps
    to epoch seconds first). Output: all point columns + all non-key
    interval columns; column names must not collide. ``how='left'`` keeps
    unmatched points with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    on = list(on)
    ival_cols = [c for c in intervals.columns if c not in on]
    clash = set(ival_cols) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns collide with point columns: "
                         f"{sorted(clash)} — alias them first")

    w = F.lit(bucket_width)
    # Degenerate intervals (end < start) match nothing; drop them BEFORE the
    # explode — Spark's sequence(a, b) DESCENDS for b < a and would fabricate
    # buckets instead of erroring.
    iv = (intervals
          .filter(F.col(end_col) >= F.col(start_col))
          .withColumn(_BUCKET, F.explode(F.sequence(
              F.floor(F.col(start_col) / w).cast("long"),
              F.floor(F.col(end_col) / w).cast("long")))))
    pt = points.withColumn(_BUCKET, F.floor(F.col(point_col) / w).cast("long"))

    matched = (pt.join(iv, on + [_BUCKET])
               .filter((F.col(start_col) <= F.col(point_col))
                       & (F.col(point_col) <= F.col(end_col)))
               .drop(_BUCKET))
    if how == "inner":
        return matched
    # left: unmatched points ride along with NULL interval columns. A point
    # can share a bucket with an interval yet miss the exact range test, so
    # the anti-join must run against the matched point identities, not the
    # bucket pairing. Cache `matched` when calling with how='left' on a hot
    # path — it is consumed twice.
    pt_cols = points.columns
    unmatched = points.join(
        matched.select(*pt_cols).distinct(), pt_cols, "left_anti")
    for c in ival_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(iv.dtypes)[c]))
    return matched.unionByName(unmatched)
