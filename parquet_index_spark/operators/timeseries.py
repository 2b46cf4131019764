"""Time-series anomaly operators: rolling statistics and z-score outlier
flagging over an event stream.

Scale design notes (100 TB target):

- Rolling stats are one window over (key, time) — a single shuffle on the
  series key, then a sorted sliding frame per partition. No self-joins, no
  per-row Python.
- Determinism across engines and partitionings: the rolling sums are exact
  DECIMAL sums (order-independent), and the variance/z-score derivation is
  a fixed sequence of IEEE double ops over those exact sums, so any engine
  computes bit-identical flags — the DuckDB oracle in workload.py runs the
  same formula.
- Skewed keys (one user with millions of events) are the operator's only
  hazard at scale; the window is per-key sequential by nature. Mitigation
  at 100 TB is time-bucketing the key (e.g. (user, day)), which callers
  can do by passing a composite ``key``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def rolling_stats(df: DataFrame, value_col: str = "value",
                  key: str = "user_id",
                  order: Sequence[str] = ("ts", "event_id"),
                  lookback: int = 10) -> DataFrame:
    """Append exact rolling statistics over the ``lookback`` rows strictly
    before each row (the row itself excluded, so the baseline is past-only
    — no leakage): ``roll_n``, ``roll_sum``, ``roll_ssq``.

    Sums are DECIMAL(28,6) — exact and order-independent — so every
    engine and partitioning yields identical values.
    """
    w = (Window.partitionBy(key)
         .orderBy(*[F.col(c) for c in order])
         .rowsBetween(-lookback, -1))
    v = F.col(value_col).cast("decimal(18,6)")
    return (df.withColumn("roll_n", F.count(value_col).over(w))
            .withColumn("roll_sum", F.sum(v).over(w).cast("decimal(28,6)"))
            .withColumn("roll_ssq",
                        F.sum((v * v).cast("decimal(28,6)")).over(w)
                        .cast("decimal(28,6)")))


def zscore_anomalies(df: DataFrame, value_col: str = "value",
                     key: str = "user_id",
                     order: Sequence[str] = ("ts", "event_id"),
                     lookback: int = 10, min_baseline: int = 5,
                     threshold: float = 3.0) -> DataFrame:
    """Flag rows whose value deviates more than ``threshold`` sample
    standard deviations from the mean of their own trailing window.

    The comparison is squared on both sides — ``(v - mean)^2 * (n-1) >
    threshold^2 * (ssq - sum^2/n)`` — so no sqrt enters the predicate and
    the flag is a deterministic function of the exact decimal sums.
    Rows with fewer than ``min_baseline`` prior events are never flagged
    (cold-start guard). Adds a boolean ``is_anomaly`` column.
    """
    out = rolling_stats(df, value_col, key, order, lookback)
    n = F.col("roll_n").cast("double")
    s = F.col("roll_sum").cast("double")
    ssq = F.col("roll_ssq").cast("double")
    v = F.col(value_col).cast("decimal(18,6)").cast("double")
    mean = s / n
    var_num = ssq - s * s / n          # (n-1) * sample variance
    dev2 = (v - mean) * (v - mean) * (n - F.lit(1.0))
    flag = (F.col("roll_n") >= F.lit(min_baseline)) & \
        (dev2 > F.lit(float(threshold) ** 2) * var_num)
    return out.withColumn("is_anomaly", flag)
