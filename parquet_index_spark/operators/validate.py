"""Declarative data-quality validation over DataFrames.

Deequ / Great-Expectations-style constraint checking as a first-class
engine operator: a rule list compiles into the *minimum* number of Spark
jobs —

- every row-local rule (not_null, in_range, in_set, matches, unique)
  becomes one conditional aggregate expression; ALL of them evaluate in
  a SINGLE map-side-combinable aggregation pass over the table (one
  scan, whatever the rule count — at 100 TB the scan dominates, so rule
  cost must be O(columns touched), never O(rules) scans);
- uniqueness rides the same pass as ``count(col) - count(DISTINCT col)``
  (Spark plans the mixed distinct/non-distinct aggregate with a single
  expand, still one scan);
- each referential rule (foreign_key) is one left join against the
  referenced key set, aggregated in the same job that joins it —
  broadcast when the key side is small, shuffle otherwise (Catalyst/AQE
  decides from sizes, the operator does not hand-pick).

The report is a tiny DataFrame — one row per rule:
``(rule, col_name, violations, total_rows, passed)`` — safe to collect,
join, or gate a pipeline stage on at any input scale.

No reference analog (the reference is an indexing layer); this is part
of the beyond-reference training-data surface (SURVEY §2 extension
table) where curation pipelines need schema contracts enforced before
expensive downstream stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``kind`` drives compilation; rules
    with a ``ref`` (foreign_key) plan a join, everything else folds into
    the shared single-pass aggregate."""
    kind: str
    column: str
    lo: Any = None
    hi: Any = None
    values: Tuple = ()
    pattern: Optional[str] = None
    ref: Optional[DataFrame] = field(default=None, compare=False)
    ref_column: Optional[str] = None

    def _violations(self) -> Column:
        """Aggregate expression counting violating rows (row-local only).

        NULL handling contract: comparisons ignore NULLs (a NULL value
        violates only ``not_null``) so each rule reports one orthogonal
        defect and a null-heavy column doesn't double-count."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return F.count(F.when(c.isNull(), 1))
        if self.kind == "unique":
            # duplicate rows among non-null values; one expand, same scan
            return F.count(self.column) - F.countDistinct(self.column)
        if self.kind == "unique_approx":
            # HLL estimate: no distinct expand/shuffle at 100 TB; the
            # report is an ESTIMATE (can be slightly negative noise,
            # clamped) — use `unique` when the gate must be exact
            return F.greatest(
                F.lit(0).cast("long"),
                F.count(self.column)
                - F.approx_count_distinct(self.column, rsd=0.01))
        if self.kind == "in_range":
            cond = F.lit(False)
            if self.lo is not None:
                cond = cond | (c < F.lit(self.lo))
            if self.hi is not None:
                cond = cond | (c > F.lit(self.hi))
            return F.count(F.when(c.isNotNull() & cond, 1))
        if self.kind == "in_set":
            return F.count(
                F.when(c.isNotNull() & ~c.isin(list(self.values)), 1))
        if self.kind == "matches":
            return F.count(
                F.when(c.isNotNull() & ~c.rlike(self.pattern), 1))
        raise ValueError(f"unknown row-local rule kind {self.kind!r}")


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str, approximate: bool = False) -> Rule:
    """Exact by default (count - countDistinct, one expand in the shared
    pass). ``approximate=True`` swaps in an HLL estimate (rsd 1%) — at
    100 TB the exact distinct is the single most expensive rule, and a
    duplicate-rate GATE usually tolerates estimation; keep exact for
    primary-key contracts."""
    return Rule("unique_approx" if approximate else "unique", column)


def in_range(column: str, lo=None, hi=None) -> Rule:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return Rule("in_range", column, lo=lo, hi=hi)


def in_set(column: str, values: Sequence) -> Rule:
    return Rule("in_set", column, values=tuple(values))


def matches(column: str, pattern: str) -> Rule:
    return Rule("matches", column, pattern=pattern)


def foreign_key(column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule("foreign_key", column, ref=ref, ref_column=ref_column)


_REPORT_COLS = ["rule", "col_name", "violations", "total_rows", "passed"]


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Compile ``rules`` against ``df`` -> report DataFrame, one row per
    rule: (rule, col_name, violations, total_rows, passed), ordered by
    (rule, col_name) for deterministic downstream comparison."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    missing = [r.column for r in rules if r.column not in df.columns]
    if missing:
        raise ValueError(f"rules reference absent columns: {missing}")

    row_local = [r for r in rules if r.kind != "foreign_key"]
    fks = [r for r in rules if r.kind == "foreign_key"]

    parts = []
    if row_local:
        aggs = [F.count("*").alias("total_rows")]
        for i, r in enumerate(row_local):
            aggs.append(r._violations().alias(f"__v{i}"))
        one = df.agg(*aggs)
        # unpivot the single aggregate row into per-rule report rows —
        # stays in the plan (no driver round-trip). Pure Column API:
        # names ride as literals, never interpolated into SQL text, so
        # quotes/commas in column names cannot corrupt the expression
        entries = F.array(*[
            F.struct(F.lit(r.kind).alias("rule"),
                     F.lit(r.column).alias("col_name"),
                     F.col(f"__v{i}").cast("long").alias("violations"))
            for i, r in enumerate(row_local)])
        parts.append(one.select(F.inline(entries), "total_rows"))

    for r in fks:
        keys = (r.ref.select(F.col(r.ref_column).alias("__ref_key"))
                .distinct())
        joined = df.select(F.col(r.column)).join(
            keys.withColumn("__hit", F.lit(1)),
            F.col(r.column) == F.col("__ref_key"), "left")
        # one aggregation in the join's own job: total_rows comes for
        # free, no 1-row cross join needed
        parts.append(joined.agg(
            F.count(F.when(F.col(r.column).isNotNull()
                           & F.col("__hit").isNull(), 1)).alias("violations"),
            F.count("*").alias("total_rows"))
            .select(F.lit("foreign_key").alias("rule"),
                    F.lit(r.column).alias("col_name"),
                    "violations", "total_rows"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out
            .withColumn("violations", F.col("violations").cast("long"))
            .withColumn("passed", F.col("violations") == 0)
            .select(*_REPORT_COLS)
            .orderBy("rule", "col_name"))
