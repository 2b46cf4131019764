"""Operator CLI: ``python -m parquet_index_spark <cmd> <table_path>``.

A thin wrapper over the diagnostic surface so an operator at a terminal
can inspect an index without writing a script:

- ``describe <path>``   — the describe summary (coverage, filter
  saturation, table/index byte accounting)
- ``recommend <path>``  — the filter-type advisor (measured distincts
  and spans -> dict / bitmap / bloom per column)
- ``explain <path> <predicate>`` — per-leaf pruning diagnosis with
  saturation attached
- ``recommend-ivf <path> [target_cluster_size] [n_centroids]`` — the
  IVF quantizer sizing advisor over the table's ``embedding`` column
  (k from corpus size / target cluster size; warns when the proposal
  implies clusters past semantic_dedup's enumeration cap)

Honors ``SPARK_GRAFT_METASTORE`` (falls back to the session default
resolution). Local-mode session; diagnostics are metadata-only except
``recommend-ivf``, which pays one count() of the embedding column.
"""

from __future__ import annotations

import json
import os
import sys


def _usage() -> int:
    print(__doc__)
    return 2


def main(argv) -> int:
    if len(argv) < 2:
        return _usage()
    cmd, path = argv[0], argv[1]
    if cmd not in ("describe", "recommend", "explain", "recommend-ivf"):
        return _usage()
    if cmd == "explain" and len(argv) < 3:
        return _usage()

    from pyspark.sql import SparkSession

    from parquet_index_spark import QueryContext

    spark = (SparkSession.builder.master("local[4]")
             .appName("parquet-index-spark-cli")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ms = os.environ.get("SPARK_GRAFT_METASTORE")
    if ms:
        spark.conf.set("spark.sql.index.metastore", ms)
    ctx = QueryContext(spark)
    try:
        if cmd == "describe":
            ctx.index.describe.parquet(path).show(100, truncate=False)
        elif cmd == "recommend":
            for rec in ctx.index.parquet(path).recommend_filter_types():
                print(json.dumps(rec))
        elif cmd == "recommend-ivf":
            from parquet_index_spark.operators.similarity import (
                recommend_ivf)
            target = int(argv[2]) if len(argv) > 2 else 10_000
            k = int(argv[3]) if len(argv) > 3 else None
            print(json.dumps(recommend_ivf(
                spark.read.parquet(path), target_cluster_size=target,
                n_centroids=k)))
        else:
            d = ctx.index.parquet(path).explain_pruning(
                argv[2], include_saturation=True)
            print(json.dumps(d, indent=1, default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
