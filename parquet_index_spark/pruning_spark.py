"""Distributed pruning: fold the predicate with a Spark job over the
metadata parquet instead of driver-side numpy.

The numpy fold (pruning.py) needs the whole stats table in driver memory —
fine up to a few million row groups, but a 100 TB table with small row
groups can push metadata past driver RAM. This path expresses the same
fold as a Spark aggregation over the stats *parquet* directly:

    stats (long format, one row per file x block x column)
      -> conditional-aggregation pivot per (path, block) over the
         referenced columns only
      -> boolean fold expression (same boundary semantics)
      -> bool_or per path -> surviving file list

Membership (dict/bloom) refinement is intentionally skipped here — bloom
probing would need a python UDF per row. Skipping it is sound (it only
ever *removes* candidates), so this path trades a little pruning power for
unbounded metadata scale. The engine auto-switches based on
``spark.sql.index.pruning.sparkThreshold`` (block count).
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import SparkSession, functions as F

from parquet_index_spark import predicates as P
from parquet_index_spark import types as ityp

SPARK_PRUNING_THRESHOLD = "spark.sql.index.pruning.sparkThreshold"
DEFAULT_THRESHOLD = 5_000_000


def _pivot_stats(stats_df, columns: List[str]):
    """Wide per-(path, block) frame for the referenced columns."""
    aggs = [F.first("rows").alias("__rows")]
    for c in columns:
        is_c = F.col("column") == c
        aggs += [
            F.max(F.when(is_c, F.col("has_stats"))).alias(f"{c}__has"),
            F.max(F.when(is_c, F.col("nulls"))).alias(f"{c}__nulls"),
            F.max(F.when(is_c, F.col("min_long"))).alias(f"{c}__min_l"),
            F.max(F.when(is_c, F.col("max_long"))).alias(f"{c}__max_l"),
            F.max(F.when(is_c, F.col("min_str"))).alias(f"{c}__min_s"),
            F.max(F.when(is_c, F.col("max_str"))).alias(f"{c}__max_s"),
        ]
    return stats_df.groupBy("path", "block").agg(*aggs)


def _leaf(col: str, kind: str, op: str, value, tz: str = None) -> F.Column:
    """Boolean Column for one comparison leaf over the pivoted stats."""
    try:
        v = ityp.literal_to_stat_value(value, kind, tz)
    except (TypeError, ValueError, KeyError):
        return F.lit(True)
    if v is None:
        return F.lit(True)
    has = F.coalesce(F.col(f"{col}__has"), F.lit(False))
    if kind == ityp.STRING:
        mn, mx = F.col(f"{col}__min_s"), F.col(f"{col}__max_s")
    else:
        mn, mx = F.col(f"{col}__min_l"), F.col(f"{col}__max_l")
    lit = F.lit(v)
    table = {
        "eq": has & (mn <= lit) & (lit <= mx),
        "ne": has & ~((mn == lit) & (mx == lit)),
        "gt": has & (mx > lit),
        "ge": has & (mx >= lit),
        "lt": has & (mn < lit),
        "le": has & (mn <= lit),
    }
    return table[op]


def compile_to_spark(pred: P.Predicate, kinds: dict,
                     tz: str = None) -> F.Column:
    """AST -> boolean Column with the pruning fold semantics (no membership
    refinement). ``kinds``: indexed/partition column -> kind; ``tz``: the
    session timezone for instant-timestamp literal localization."""
    pred = P.push_not_down(pred)
    return _compile(pred, kinds, tz)


def _compile(pred: P.Predicate, kinds: dict, tz: str = None) -> F.Column:
    if isinstance(pred, P.And):
        out = F.lit(True)
        for c in pred.children:
            out = out & _compile(c, kinds, tz)
        return out
    if isinstance(pred, P.Or):
        out = F.lit(False)
        for c in pred.children:
            out = out | _compile(c, kinds, tz)
        return out
    if isinstance(pred, P.Trivial):
        return F.lit(pred.value)
    if isinstance(pred, (P.Unsupported, P.Not)):
        return F.lit(True)

    kind = kinds.get(getattr(pred, "column", None))
    if kind is None:
        return F.lit(True)
    c = pred.column
    if isinstance(pred, P.Eq):
        return _leaf(c, kind, "eq", pred.value, tz)
    if isinstance(pred, P.Ne):
        return _leaf(c, kind, "ne", pred.value, tz)
    if isinstance(pred, P.In):
        if not pred.values:
            return F.lit(False)
        out = F.lit(False)
        for v in pred.values:
            out = out | _leaf(c, kind, "eq", v, tz)
        return out
    if isinstance(pred, P.IsNull):
        nulls = F.coalesce(F.col(f"{c}__nulls"), F.lit(-1))
        return (nulls > 0) | (nulls == -1)
    if isinstance(pred, P.IsNotNull):
        nulls = F.coalesce(F.col(f"{c}__nulls"), F.lit(-1))
        return F.when(nulls >= 0, F.col("__rows") - nulls > 0) \
            .otherwise(F.col("__rows") > 0)
    if isinstance(pred, P.Gt):
        return _leaf(c, kind, "gt", pred.value, tz)
    if isinstance(pred, P.Ge):
        return _leaf(c, kind, "ge", pred.value, tz)
    if isinstance(pred, P.Lt):
        return _leaf(c, kind, "lt", pred.value, tz)
    if isinstance(pred, P.Le):
        return _leaf(c, kind, "le", pred.value, tz)
    return F.lit(True)


def prune_files_with_spark(spark: SparkSession, metadata,
                           pred: P.Predicate, tz: str = None) -> List[str]:
    """Distributed equivalent of pruning.prune_files (minus membership).

    Partition-column predicates are folded too: partition values join in
    from the file manifest as exact pseudo-stats, mirroring the numpy
    context (metastore.IndexMetadata._build_context).
    """
    import json

    stats_path = os.path.join(metadata.index_dir, "stats")
    has_shards = os.path.isdir(stats_path) and any(
        f.endswith(".parquet") for f in os.listdir(stats_path))
    if not has_shards:
        return []
    stats_df = spark.read.parquet(stats_path)

    referenced = P.referenced_columns(pred)
    kinds = {c: k for c, k in metadata.index_columns.items() if c in referenced}
    pivoted = _pivot_stats(stats_df, sorted(kinds))

    # instant-timestamp partition values are wall-clock directory strings;
    # fold them in wall space (NTZ) so no session-tz localization applies
    part_kinds = {c: (ityp.TIMESTAMP_NTZ if k == ityp.TIMESTAMP else k)
                  for c, k in metadata.partition_columns.items()
                  if c in referenced}
    if part_kinds:
        rows = []
        for rec in metadata.files.to_dict("records"):
            pv = json.loads(rec["partition_json"])
            row = {"path": rec["path"]}
            for c, k in part_kinds.items():
                raw = pv.get(c)
                row[f"{c}__pv"] = None if raw in (None, "__HIVE_DEFAULT_PARTITION__") \
                    else ityp.parse_partition_value(raw, k)
            rows.append(row)
        pf = spark.createDataFrame(rows)
        pivoted = pivoted.join(F.broadcast(pf), "path", "left")
        for c, k in part_kinds.items():
            pv = F.col(f"{c}__pv")
            pivoted = (pivoted
                       .withColumn(f"{c}__has", pv.isNotNull())
                       .withColumn(f"{c}__nulls",
                                   F.when(pv.isNull(), F.col("__rows"))
                                   .otherwise(F.lit(0)))
                       .withColumn(f"{c}__min_l" if k != ityp.STRING else f"{c}__min_s", pv)
                       .withColumn(f"{c}__max_l" if k != ityp.STRING else f"{c}__max_s", pv))
        kinds.update(part_kinds)

    # ensure every referenced-but-missing stat column exists (unindexed
    # columns were already folded to True at compile time)
    match = compile_to_spark(pred, kinds, tz)
    survivors = (pivoted.withColumn("__match", match)
                 .groupBy("path")
                 .agg(F.max(F.col("__match").cast("int")).alias("m"))
                 .filter("m = 1")
                 .select("path"))
    manifest = set(metadata.files["path"])
    # drop orphan stats paths from an interrupted refresh (manifest is the
    # commit point — same tolerance as the numpy fold's _build_context)
    return [r["path"] for r in survivors.collect() if r["path"] in manifest]
