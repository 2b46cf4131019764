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

from pyspark.sql import Column, DataFrame
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
