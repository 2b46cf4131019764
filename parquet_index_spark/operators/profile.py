"""Single-pass column profiling: the data-quality sweep every ingest
pipeline runs before training (null rates, cardinality, value ranges).

Reference scope: the reference's statistics collector gathers per-block
min/max/null counts at index-build time (StatisticsUtils.scala analog,
see collector.py); this operator is the *query-side* complement — a
user-facing profile of any DataFrame, not just indexed tables.

Design for 100 TB:
- ONE scan, one global aggregate. All per-column statistics are computed
  in a single ``df.agg(...)`` so the table is read once; the result is a
  single row that is then exploded to long form driver-side-free.
- Exact ``countDistinct`` over k columns makes Catalyst plan an Expand
  (k projections per input row through the partial aggregate). That is
  the standard exact plan, but at extreme scale prefer
  ``exact_distinct=False`` — ``approx_count_distinct`` (HyperLogLog++)
  keeps the scan single-projection with ~2% error.
- min/max are rendered to strings with dtype-aware rules so the output
  schema is uniform (one long-form table for any column mix) and
  engine-portable: integers/strings verbatim, floating point through a
  fixed-scale DECIMAL (exact, no scientific notation), timestamps
  truncated to DATE.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col: Column, dtype: T.DataType, scale: int) -> Column:
    """Render a min/max value as a portable string for ``dtype``."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast(T.DecimalType(28, scale)).cast("string")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return col.cast("date").cast("string")
    return col.cast("string")


def profile_columns(df: DataFrame, columns: Optional[List[str]] = None,
                    exact_distinct: bool = True,
                    float_scale: int = 2,
                    scales: Optional[Dict[str, int]] = None) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan.

    Returns long form ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value)``, one row per column, ordered by col_name.
    ``scales`` overrides the DECIMAL render scale per float column.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    scales = scales or {}
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        sc = scales.get(c, float_scale)
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct(c).alias(f"{c}__nd"),
            _render(F.min(c), fields[c], sc).alias(f"{c}__min"),
            _render(F.max(c), fields[c], sc).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)

    entries = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 (F.col("__rows") - F.col(f"{c}__nn")).alias("n_nulls"),
                 F.col(f"{c}__nd").alias("n_distinct"),
                 F.col(f"{c}__min").alias("min_value"),
                 F.col(f"{c}__max").alias("max_value"))
        for c in cols])
    return (wide.select(F.col("__rows").alias("n_rows"),
                        F.explode(entries).alias("e"))
            .select("e.col_name", "n_rows", "e.n_nulls", "e.n_distinct",
                    "e.min_value", "e.max_value")
            .orderBy("col_name"))


def ks_drift(df_a: DataFrame, df_b: DataFrame, group: str,
             value_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance per group — the
    numeric-distribution drift monitor that pairs with
    ``text.vocab_drift`` (categorical TV distance): how far does a
    metric's distribution (doc length, quality score, token count) move
    between two corpus snapshots?

    Entirely INTEGER arithmetic until the last division, so the result
    is engine-portable bit-for-bit: with cumulative counts ``ca, cb``
    and totals ``na, nb``, ``|ca/na - cb/nb| = |ca*nb - cb*na| / (na*nb)``
    and the numerator is exact in int64. Returns one row per group:
    ``(group, n_a, n_b, ks_num, ks)`` where ``ks = ks_num/(na*nb)``.
    NULL metric values are dropped; groups present in only one snapshot
    report ks = 1.0 with a NULL ``ks_num`` (the statistic's numerator is
    undefined when a side has no samples — emitting 0 there would
    contradict the ks=1 verdict for anyone reconstructing the exact
    ratio).

    Scale shape: one union scan -> partial-agg count per (group, value)
    — the heavy reduction, map-side combinable — then cumulative-sum
    windows over DISTINCT VALUES per group (cardinality of the metric,
    not of the corpus: thousands of doc-length values, not billions of
    docs). For a continuous metric, quantize first (``F.round`` /
    bucketize) so the distinct-value set stays bounded; the KS of the
    quantized distribution is what gets compared round over round.
    """
    a = df_a.select(F.col(group).alias("g"),
                    F.col(value_col).alias("v")).where(F.col(value_col).isNotNull()) \
        .withColumn("side_a", F.lit(1)).withColumn("side_b", F.lit(0))
    b = df_b.select(F.col(group).alias("g"),
                    F.col(value_col).alias("v")).where(F.col(value_col).isNotNull()) \
        .withColumn("side_a", F.lit(0)).withColumn("side_b", F.lit(1))
    per_val = (a.unionByName(b)
               .groupBy("g", "v")
               .agg(F.sum("side_a").alias("ca"), F.sum("side_b").alias("cb")))
    wcum = Window.partitionBy("g").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("g")
    cum = (per_val
           .withColumn("cca", F.sum("ca").over(wcum))
           .withColumn("ccb", F.sum("cb").over(wcum))
           .withColumn("na", F.sum("ca").over(wall))
           .withColumn("nb", F.sum("cb").over(wall)))
    # DECIMAL(38,0) cross products: long*long overflows past ~3e9 rows
    # per side, and the whole point is exactness (vocab_drift's rule)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diff = F.abs(dec("cca") * dec("nb") - dec("ccb") * dec("na"))
    return (cum.groupBy("g")
            .agg(F.max(diff).alias("ks_num"),
                 F.max("na").alias("n_a"), F.max("nb").alias("n_b"))
            .select(F.col("g").alias(group), "n_a", "n_b",
                    # numerator computed exactly in DECIMAL(38,0), then
                    # emitted as DOUBLE (engine-portable rendering; the
                    # int->double conversion is deterministic). NULL for
                    # one-sided groups (see docstring).
                    F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                           F.col("ks_num").cast("double")).alias("ks_num"),
                    F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                           F.col("ks_num").cast("double")
                           / (dec("n_a") * dec("n_b")).cast("double"))
                    .otherwise(F.lit(1.0)).alias("ks"))
            .orderBy(group))
