"""Sources & sinks: ingestion into indexed parquet tables.

The reference reads parquet only (README.md:40-47); these helpers cover the
write side of a pipeline: land any DataFrame as a (optionally hive-
partitioned) parquet table and index it in one step, with layout knobs that
matter at scale (target file size via repartition, partition columns).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame

from parquet_index_spark.manager import QueryContext


def write_indexed(df: DataFrame, path: str,
                  index_by: Optional[List[str]] = None,
                  partition_by: Optional[List[str]] = None,
                  repartition: Optional[int] = None,
                  repartition_by: Optional[List[str]] = None,
                  mode: str = "error") -> None:
    """Write ``df`` as a parquet table at ``path`` and create its index.

    - repartition / repartition_by control output file count & co-location
      (e.g. repartition_by join keys so future joins align).
    - index_by=None indexes every supported column (indexByAll).
    - mode applies to BOTH the table write and the index create.
    """
    out = df
    if repartition and repartition_by:
        out = out.repartition(repartition, *repartition_by)
    elif repartition:
        out = out.repartition(repartition)
    elif repartition_by:
        out = out.repartition(*repartition_by)

    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    ctx = QueryContext(df.sparkSession)
    cmd = ctx.index.create.mode("overwrite" if mode == "overwrite" else "ignore")
    if index_by:
        cmd = cmd.indexBy(*index_by)
    else:
        cmd = cmd.indexByAll()
    cmd.parquet(path)


def ingest_csv(spark, csv_path: str, table_path: str, *, header: bool = True,
               infer_schema: bool = True, **write_kwargs) -> None:
    """CSV -> indexed parquet (ingestion path for raw drops)."""
    df = (spark.read.option("header", str(header).lower())
          .option("inferSchema", str(infer_schema).lower())
          .csv(csv_path))
    write_indexed(df, table_path, **write_kwargs)


def ingest_json(spark, json_path: str, table_path: str, **write_kwargs) -> None:
    """JSON lines -> indexed parquet."""
    df = spark.read.json(json_path)
    write_indexed(df, table_path, **write_kwargs)
