"""Physical-plan introspection and assertion helpers.

The 100 TB contract is enforced here: tests assert that plans keep filters
pushed to the parquet scan, prune columns, broadcast small dimensions, and
never degenerate into cartesian products — so a regression in plan quality
fails CI rather than surfacing as a 100x slowdown on a cluster.
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> List[str]:
    """All PushedFilters entries across scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out

def read_schemas(df: DataFrame) -> List[str]:
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def join_strategies(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
    }


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), \
        f"expected pushed filter containing {fragment!r}, got {filters}"


def assert_columns_pruned(df: DataFrame, max_cols: int,
                          table_fragment: str = "") -> None:
    """Assert some scan reads at most max_cols columns."""
    schemas = read_schemas(df)
    counts = [s.count(":") for s in schemas if table_fragment in s]
    assert counts and min(counts) <= max_cols, \
        f"no scan reads <= {max_cols} columns: {schemas}"


def assert_no_cartesian(df: DataFrame) -> None:
    strategies = join_strategies(df)
    assert strategies["nested_loop"] == 0, \
        f"plan contains a nested-loop/cartesian join: {strategies}"


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> None:
    strategies = join_strategies(df)
    assert strategies["broadcast_hash"] >= at_least, \
        f"expected >= {at_least} broadcast joins, got {strategies}"
