"""Distributed (Spark-job) pruning path: equivalence with the numpy fold.

The Spark path skips membership refinement, so its survivor set is a
superset of the numpy path's; with filter stats disabled the two must be
identical.
"""

import os

import pytest

from parquet_index_spark import QueryContext
from parquet_index_spark.predicates import parse_sql_predicate
from parquet_index_spark.pruning import prune_files
from parquet_index_spark.pruning_spark import (
    SPARK_PRUNING_THRESHOLD, prune_files_with_spark,
)
from tests.conftest import assert_same_rows


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


@pytest.fixture()
def table(spark, ctx, tmp_table_dir):
    path = os.path.join(tmp_table_dir, "t")
    (spark.range(0, 10_000)
     .selectExpr("id", "concat('s', lpad(cast(id as string), 5, '0')) AS s",
                 "cast(id % 4 AS int) AS grp")
     .repartitionByRange(8, "id")
     .write.partitionBy("grp").parquet(path))
    spark.conf.set("spark.sql.index.parquet.filter.enabled", "false")
    try:
        ctx.index.create.indexBy("id", "s").parquet(path)
    finally:
        spark.conf.set("spark.sql.index.parquet.filter.enabled", "true")
    return path


PREDICATES = [
    "id = 1234",
    "id > 9000 OR id < 100",
    "s >= 's09000'",
    "id IN (5, 5005, 99999)",
    "grp = 2 AND id < 3000",
    "NOT (id BETWEEN 100 AND 9900)",
    "id IS NOT NULL AND s < 's00100'",
]


class TestSparkPruningEquivalence:
    @pytest.mark.parametrize("pred", PREDICATES)
    def test_same_survivors_as_numpy(self, spark, ctx, table, pred):
        metadata = ctx.index.parquet(table)._metadata
        ast = parse_sql_predicate(pred)
        numpy_files = set(prune_files(ast, metadata.context()))
        spark_files = set(prune_files_with_spark(spark, metadata, ast))
        assert spark_files == numpy_files

    def test_threshold_switch_end_to_end(self, spark, ctx, table):
        """Force the Spark path via threshold=0 and check query results."""
        spark.conf.set(SPARK_PRUNING_THRESHOLD, "0")
        try:
            t = ctx.index.parquet(table)
            assert_same_rows(
                t.filter("grp = 1 AND id < 500"),
                spark.read.parquet(table).filter("grp = 1 AND id < 500"))
        finally:
            spark.conf.unset(SPARK_PRUNING_THRESHOLD)
