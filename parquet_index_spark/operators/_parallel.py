"""Parallelism floor for CPU-heavy per-row operators.

A parquet scan's split count follows input BYTES
(``spark.sql.files.maxPartitionBytes``), which under-parallelizes
operators whose cost is per-ROW compute: Spark's higher-order functions
(transform / zip_with lambdas) are CodegenFallback — every element is an
interpreted expression call — so a shingle or span build over a compact
single-file corpus plans 1-2 tasks no matter how many cores the session
has (measured: a 50k-doc corpus in one ~17 MB file reads as 2 splits;
span construction alone took ~8 s on 2 of 32 cores — the same per-row
work spread over the cluster is ~16x cheaper in wall clock).

:func:`widen_rows` raises such an input to the session's default
parallelism BEFORE the heavy projection. On any already-parallel input
(every real at-scale table: thousands of splits) the condition is false
and this is a no-op — the repartition only fires on narrow inputs,
where one extra exchange of the (by definition few-split) input is
repaid by engaging every core. The condition derives from the actual
partition count vs the cluster's core count at ANY scale; nothing here
is tuned to local[32]. Round-robin repartitioning is row-preserving
and locally sorted before exchange (``spark.sql.execution.
sortBeforeRepartition``, default true — deterministic under retries);
every consumer is an aggregation or join keyed by row content, so
results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_rows(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when
    its plan carries fewer partitions; no-op otherwise (see module
    docstring). Streaming frames (no static partitioning to inspect)
    pass through untouched."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — unconvertible plan: leave as-is
        return df
    if n < target:
        return df.repartition(target)
    return df
