"""Catalog-table resolution for ``.table(name)`` index commands.

The reference resolves a table name through the session catalog to a file
scan and recovers (format, root path), rejecting non-file or multi-path
plans (CatalogTableSource.scala:32-63); JSON-format tables are rejected
(IndexSuite.scala:917). We use the public catalog API / DESCRIBE output
instead of physical-plan introspection.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class CatalogTableInfo:
    def __init__(self, name: str, location: str, provider: str):
        self.name = name
        self.location = location
        self.provider = provider


def resolve_catalog_table(spark: SparkSession, name: str) -> CatalogTableInfo:
    rows = spark.sql(f"DESCRIBE FORMATTED {name}").collect()
    location = None
    provider = None
    for r in rows:
        key = (r["col_name"] or "").strip().lower()
        if key == "location":
            location = (r["data_type"] or "").strip()
        elif key == "provider":
            provider = (r["data_type"] or "").strip().lower()
    if location is None:
        raise ValueError(f"Cannot resolve file location for table {name}")
    if provider != "parquet":
        raise ValueError(
            f"Table {name} has provider {provider!r}; only parquet tables "
            "can be indexed (reference: CatalogTableSource.scala:50-58, "
            "JSON rejected at IndexSuite.scala:917)")
    if location.startswith("file:"):
        location = location[len("file:"):]
        while location.startswith("//"):
            location = location[1:]
    return CatalogTableInfo(name, location, provider)
