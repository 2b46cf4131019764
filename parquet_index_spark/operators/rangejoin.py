"""Interval (range) join — bucketed equi-join formulation.

Spark's native plan for ``points JOIN intervals ON ts BETWEEN lo AND hi``
with no equality key is a BroadcastNestedLoopJoin — O(points × intervals)
work and a broadcast of a whole side, which dies first at 100 TB. The
standard scale-out formulation (used by every streaming/temporal engine;
cf. the stream-stream interval join in parquet_index_spark.streaming)
buckets time into fixed-width cells:

- each interval is exploded to the cells it covers
  (``sequence(floor(lo/w), floor(hi/w))``, JVM-side generator),
- each point maps to exactly ONE cell (``floor(ts/w)``),
- the join becomes a shuffle equi-join on (keys…, cell) with the exact
  range test as a residual condition.

A point's single cell means no post-join dedup is needed: a (point,
interval) pair can only meet in the point's own cell. Cost is
``len(interval)/w + 1`` replicated rows per interval — pick ``w`` near the
typical interval length so replication stays O(1) and the join stays a
plain SortMergeJoin/ShuffledHashJoin that AQE can split on skewed cells.

All arithmetic is exact integer math (``pmod``/``div``), never double
division — int64 epoch-nanos exceed double's 53-bit mantissa, so
``floor(col / w)`` would bucket wrongly near cell edges.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def _floordiv(col: str, width: int) -> F.Column:
    """Exact floor(col / width) for integer columns (ANSI-safe, no doubles).

    ``pmod`` makes the numerator divisible by ``width`` with a non-negative
    remainder, so truncating ``div`` equals mathematical floor for negative
    values too.
    """
    return F.expr(f"((`{col}`) - pmod(`{col}`, {width})) div {width}")


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start: str, end: str, keys: Optional[List[str]] = None,
                  bucket_width: int = 60 * 1_000_000_000,
                  how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (and equal ``keys``, if given), without a
    nested-loop plan.

    points / intervals must not share column names apart from ``keys``
    (alias beforehand). Time columns are integers (e.g. epoch-nanos — the
    events table's native representation here); ``bucket_width`` is in the
    same unit. how: 'inner' drops unmatched points, 'left' keeps them with
    NULL interval columns.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports how='inner'|'left', got {how!r}")
    keys = list(keys or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns {sorted(overlap)}: alias one side")

    # alias both sides: points and intervals often derive from the SAME
    # source (e.g. two filters of one events table) and unqualified refs
    # would be ambiguous in the self-join
    cells = intervals.withColumn(
        "__cell", F.explode(F.sequence(_floordiv(start, bucket_width),
                                       _floordiv(end, bucket_width)))
    ).alias("__iv")
    pts = points.withColumn("__cell", _floordiv(point_ts, bucket_width)) \
        .alias("__pt")

    cond = F.col("__pt.__cell") == F.col("__iv.__cell")
    for k in keys:
        cond = cond & (F.col(f"__pt.{k}") == F.col(f"__iv.{k}"))
    cond = cond & F.col(f"__pt.{point_ts}").between(
        F.col(f"__iv.{start}"), F.col(f"__iv.{end}"))

    out_cols = ([F.col(f"__pt.{c}") for c in points.columns] +
                [F.col(f"__iv.{c}") for c in intervals.columns
                 if c not in keys])
    return pts.join(cells, cond, how).select(*out_cols)


def overlap_join(left: DataFrame, right: DataFrame,
                 l_start: str, l_end: str, r_start: str, r_end: str,
                 keys: Optional[List[str]] = None,
                 bucket_width: int = 60 * 1_000_000_000) -> DataFrame:
    """Inner join of two interval sets on overlap:
    ``l_start <= r_end AND r_start <= l_end`` (plus equal ``keys``), again
    without a nested-loop plan.

    Both sides explode to their covered cells, but a pair of overlapping
    intervals shares SEVERAL cells — emitting them all would duplicate the
    pair. The dedup is closed-form, not a distinct: the pair is accepted
    only in the cell containing ``greatest(l_start, r_start)``. If the
    intervals overlap, both cover that instant, so both produced that cell
    — exactly one cell passes, no post-join dedup shuffle. Inner-only:
    an unmatched interval appears once per covered cell, so a left variant
    would need the dedup a point side gets for free in interval_join.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    keys = list(keys or [])
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns {sorted(overlap)}: alias one side")

    def cells(df, start, end, side):
        return df.withColumn(
            "__cell", F.explode(F.sequence(_floordiv(start, bucket_width),
                                           _floordiv(end, bucket_width)))
        ).alias(side)

    lc = cells(left, l_start, l_end, "__l")
    rc = cells(right, r_start, r_end, "__r")

    cond = F.col("__l.__cell") == F.col("__r.__cell")
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    ls, le = F.col(f"__l.{l_start}"), F.col(f"__l.{l_end}")
    rs, re_ = F.col(f"__r.{r_start}"), F.col(f"__r.{r_end}")
    cond = cond & (ls <= re_) & (rs <= le)
    # accept the pair only in the first shared cell; spelled as integer
    # bounds (cell*w <= anchor < (cell+1)*w) because `/` would go through
    # a double and int64 epoch-nanos exceed its 53-bit mantissa
    anchor = F.greatest(ls, rs)
    cell = F.col("__l.__cell")
    cond = cond & (cell * F.lit(bucket_width) <= anchor) & \
        (anchor < (cell + F.lit(1)) * F.lit(bucket_width))

    out_cols = ([F.col(f"__l.{c}") for c in left.columns] +
                [F.col(f"__r.{c}") for c in right.columns if c not in keys])
    return lc.join(rc, cond, "inner").select(*out_cols)
