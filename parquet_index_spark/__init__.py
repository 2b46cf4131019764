"""parquet_index_spark — a PySpark-native Parquet file-skipping index engine.

Re-expresses the capabilities of lightcopy/parquet-index (reference at
/root/reference) as an idiomatic PySpark design:

- ``QueryContext(spark).index`` — the index-management DSL mirroring the
  reference Python API (reference: python/src/lightcopy/index.py:196-371).
- A filesystem metastore holding per-table metadata *Parquet* (one row per
  file x row-group x column: min/max/null-count) plus optional membership
  filter statistics (dict / bloom).
- A predicate compiler that folds user predicates against the metadata to a
  surviving-file list *before* planning; the pruned files are then read with
  the stock ``spark.read.parquet`` and the full predicate re-applied, so
  pruning only ever needs to be sound, never exact
  (reference: IndexSourceStrategy.scala:111-112).
"""

from parquet_index_spark.predicates import col, lit
from parquet_index_spark.manager import QueryContext, DataFrameIndexManager
from parquet_index_spark.config import IndexConf

__version__ = "0.1.0"

__all__ = [
    "QueryContext",
    "DataFrameIndexManager",
    "IndexConf",
    "col",
    "lit",
]
