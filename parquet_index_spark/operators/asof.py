"""As-of (time-travel) join — a custom operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (SURVEY guidance:
prefer composition over Pandas UDFs when semantics allow): tag both sides,
union them, and carry the most recent right-side row forward with a
last-non-null window over (key, time). This is the scalable formulation —
one shuffle on (key), no per-key Python, no merge_asof driver loops — and
it degrades gracefully under skew (AQE skew-join handling applies to the
single shuffle).

Semantics match DuckDB's ``ASOF JOIN`` (backward direction): each left row
picks the right row with the greatest time <= left time for the same key.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: Optional[List[str]] = None,
              suffix: str = "_right", allow_exact_matches: bool = True,
              how: str = "left") -> DataFrame:
    """Backward as-of join of ``left`` to ``right`` on time column ``on``
    within key column ``by``.

    right_cols: right-side columns to carry (default: all except on/by).
    allow_exact_matches: if False, require right.time < left.time strictly.
    how: 'left' keeps unmatched left rows (right cols null), 'inner' drops.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]

    carried = [f"{c}{suffix}" for c in right_cols]
    l_tag = left.withColumn("__is_left", F.lit(1))
    for c, cc in zip(right_cols, carried):
        l_tag = l_tag.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__is_left"),
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)])
    # align schemas: left keeps its own payload; right contributes nulls
    for c in left.columns:
        if c not in (on, by):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    # order so that at equal timestamps the right row precedes the left row
    # iff exact matches are allowed
    tie = F.col("__is_left").asc() if allow_exact_matches \
        else F.col("__is_left").desc()
    w = (Window.partitionBy(by).orderBy(F.col(on).asc(), tie)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        *[c for c in unioned.columns if c not in carried],
        *[F.last(cc, ignorenulls=True).over(w).alias(cc) for cc in carried])
    out = filled.filter(F.col("__is_left") == 1).drop("__is_left")
    if how == "inner":
        cond = None
        for cc in carried:
            c = F.col(cc).isNotNull()
            cond = c if cond is None else (cond | c)
        if cond is not None:
            out = out.filter(cond)
    return out
