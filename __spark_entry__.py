"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H Q1 shape) at sf0.001
queries()      -> every implemented query/operator (SURVEY.md §2 + pipeline
                  extensions), keyed by name; callables take (spark, sf_dir)
oracle_sql()   -> matching DuckDB SQL per query (same column aliases; the
                  driver sorts columns by name and hash-compares values)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make it importable no matter
# how the driver loaded this module
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from parquet_index_spark.workload import QUERIES, q1_pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in QUERIES.items()
            if oracle is not None}
