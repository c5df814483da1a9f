"""Shared two-phase bucket+carry scaffolding.

The distributed substitution for a global running sum (drift_ks's
ECDF, rank_mannwhitney's pooled ranks, quantile_weighted's running
weight): quantize the value domain into BOUNDED buckets, aggregate
per bucket, and compute each bucket's strictly-lower-bucket carry
plus grand totals over the bucket frame — a constant-size stage at
any corpus scale. In-bucket running sums then rebuild the exact
global prefix as ``carry + in-bucket``.

The two subtle invariants this module owns (the round-10 code review
flagged the three hand-rolled copies as a sync hazard):

- the carry frame is STRICTLY preceding (``rowsBetween(unbounded,
  -1)``) with a COALESCE-0 for the first bucket — an inclusive frame
  double-counts the bucket itself;
- the grand totals ride an unbounded window over the SAME bounded
  frame, so no second scan of the base data is needed.

The bucket function must be monotone in the value (floor division by
a positive constant) or the carry is not a prefix of the value order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_carry_totals(
    buckets: DataFrame,
    bucket_col: str,
    carry_cols: list[str],
    total_cols: list[str],
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-bucket strictly-lower carries and grand totals.

    ``buckets`` is the already-aggregated per-bucket frame (one row
    per (partition, bucket)); returns it narrowed to the key columns
    plus ``carry_<c>`` for each of ``carry_cols`` and ``tot_<c>`` for
    each of ``total_cols``. Callers broadcast the result (the frame
    is domain-bounded) and join it back to the per-value frame.
    """
    wb = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(*partition_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = buckets
    for c in carry_cols:
        out = out.withColumn(
            f"carry_{c}", F.coalesce(F.sum(c).over(wb), F.lit(0))
        )
    for c in total_cols:
        out = out.withColumn(f"tot_{c}", F.sum(c).over(wall))
    keep = [*partition_cols, bucket_col]
    keep += [f"carry_{c}" for c in carry_cols]
    keep += [f"tot_{c}" for c in total_cols]
    return out.select(*keep)
