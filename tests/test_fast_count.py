"""Metadata-accelerated count (IndexedDataFrame.count_where).

The three-band fold must be differentially exact against a plain
filter().count() for every predicate shape, and must touch only boundary
files when the layout clusters the predicate column.
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_index_spark import QueryContext


@pytest.fixture(scope="module")
def counted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fastcount") / "tbl")
    ms = str(tmp_path_factory.mktemp("fastcount_ms"))
    spark.conf.set("spark.sql.index.metastore", ms)
    # clustered on id (range-partitioned files), strings + nulls included
    df = (spark.range(0, 10000)
          .select(F.col("id"),
                  F.concat(F.lit("k"), F.format_string("%05d", "id"))
                  .alias("key"),
                  F.when(F.col("id") % 10 == 0, None)
                  .otherwise(F.col("id") % 7).alias("bucket")))
    df.repartitionByRange(20, "id").write.mode("overwrite").parquet(d)
    ctx = QueryContext(spark)
    ctx.index.create.indexBy("id", "key", "bucket").parquet(d)
    t = ctx.index.parquet(d)
    plain = spark.read.parquet(d)
    return ctx, t, plain


PREDICATES = [
    "id >= 2500 AND id < 7500",
    "id = 4242",
    "id IN (1, 2, 3, 9999)",
    "id <> 5000",
    "bucket IS NULL",
    "bucket IS NOT NULL",
    "id < 100 OR id >= 9900",
    "key >= 'k02500' AND key < 'k07500'",
    "id BETWEEN 0 AND 9999",
    "id > 100000",
    "bucket = 3",          # unclustered column: correct, mostly scanned
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_count_matches_plain_filter(counted, pred):
    _ctx, t, plain = counted
    assert t.count_where(pred) == plain.filter(pred).count()


def test_interior_files_counted_from_metadata(counted):
    ctx, t, plain = counted
    pred = "id >= 2500 AND id < 7500"
    n = t.count_where(pred)
    info = ctx.index.last_prune_info
    assert n == plain.filter(pred).count()
    # 20 range files over 10k ids: interior files are proven full-match,
    # only the two boundary files get scanned
    assert info.total_files == 20
    assert info.selected_files <= 2


def test_no_predicate_is_pure_metadata(counted):
    ctx, t, plain = counted
    assert t.count_where() == plain.count()
    assert ctx.index.last_prune_info.selected_files == 0


def test_impossible_range_scans_nothing(counted):
    ctx, t, _plain = counted
    assert t.count_where("id > 100000") == 0
    assert ctx.index.last_prune_info.selected_files == 0


def test_covering_range_scans_nothing(counted):
    ctx, t, plain = counted
    assert t.count_where("id >= 0 AND id < 10000") == plain.count()
    assert ctx.index.last_prune_info.selected_files == 0


def test_unindexed_column_still_exact(counted, spark):
    _ctx, t, plain = counted
    # arithmetic on the column is outside the foldable grammar ->
    # falls back to pruned filter().count(), still exact
    pred = "id % 2 = 0"
    assert t.count_where(pred) == plain.filter(pred).count()
