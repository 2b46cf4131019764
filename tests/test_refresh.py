"""Incremental index refresh tests (beyond-reference capability)."""

import os

import pytest
from pyspark.sql import functions as F

from parquet_index_spark import QueryContext
from parquet_index_spark.metastore import IndexNotFoundError
from tests.conftest import assert_same_rows


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


@pytest.fixture()
def growing_table(spark, tmp_table_dir):
    path = os.path.join(tmp_table_dir, "growing")
    spark.range(0, 1000).repartition(4).write.parquet(path)
    return path


class TestRefresh:
    def test_noop_when_unchanged(self, ctx, growing_table):
        ctx.index.create.indexBy("id").parquet(growing_table)
        out = ctx.index.refresh.parquet(growing_table)
        assert out == {"mode": "noop", "new_files": 0, "removed_or_changed": 0}

    def test_incremental_on_append(self, spark, ctx, growing_table):
        ctx.index.create.indexBy("id").parquet(growing_table)
        # append-only growth: new files land in the same directory
        spark.range(5000, 6000).repartition(2).write.mode("append") \
            .parquet(growing_table)
        out = ctx.index.refresh.parquet(growing_table)
        assert out["mode"] == "incremental" and out["new_files"] == 2
        t = ctx.index.parquet(growing_table)
        # new data must be indexed: point query into the appended range
        assert_same_rows(t.filter("id = 5500"),
                         spark.read.parquet(growing_table).filter("id = 5500"))
        t.filter("id = 5500").collect()
        info = ctx.index.last_prune_info
        assert info.total_files == 6 and info.selected_files == 1

    def test_rebuild_on_removed_file(self, spark, ctx, growing_table):
        ctx.index.create.indexBy("id").parquet(growing_table)
        data_files = [f for f in os.listdir(growing_table)
                      if f.endswith(".parquet")]
        os.remove(os.path.join(growing_table, data_files[0]))
        out = ctx.index.refresh.parquet(growing_table)
        assert out["mode"] == "rebuild"
        t = ctx.index.parquet(growing_table)
        assert_same_rows(t.filter("id >= 0"),
                         spark.read.parquet(growing_table).filter("id >= 0"))

    def test_refresh_missing_index_raises(self, ctx, growing_table):
        with pytest.raises(IndexNotFoundError):
            ctx.index.refresh.parquet(growing_table)

    def test_repeated_refresh_accumulates(self, spark, ctx, growing_table):
        ctx.index.create.indexBy("id").parquet(growing_table)
        for lo in (10_000, 20_000):
            spark.range(lo, lo + 100).repartition(1).write.mode("append") \
                .parquet(growing_table)
            out = ctx.index.refresh.parquet(growing_table)
            assert out["mode"] == "incremental"
        t = ctx.index.parquet(growing_table)
        assert t.filter("id = 20050").count() == 1
        info = ctx.index.last_prune_info
        assert info.selected_files == 1


class TestRefreshAtomicity:
    """Orphan stats shards from an interrupted refresh must not break or
    mis-prune subsequent loads (manifest = commit point)."""

    def test_orphan_stats_rows_ignored(self, spark, ctx, growing_table):
        import os
        import pyarrow as pa
        import pyarrow.parquet as pq
        from parquet_index_spark.collector import STATS_SCHEMA
        from parquet_index_spark.metastore import STATS_DIR

        ctx.index.create.mode("overwrite").indexBy("id").parquet(growing_table)
        # simulate a refresh that wrote shards but crashed before the
        # manifest landed: a stats shard for a path missing from files.parquet
        idx_dir = ctx.index._metastore(ctx.index._conf()).index_dir(
            __import__("parquet_index_spark.metastore", fromlist=["LocationSpec"])
            .LocationSpec(growing_table))
        orphan = pa.Table.from_pylist([{
            "path": "part-orphan.parquet", "block": 0, "rows": 10,
            "column": "id", "nulls": 0, "has_stats": True,
            "min_long": 0, "max_long": 9, "min_str": None, "max_str": None,
            "dict_long": None, "dict_str": None, "bloom": None,
        }], schema=STATS_SCHEMA)
        pq.write_table(orphan, os.path.join(idx_dir, STATS_DIR,
                                            "part-r9999-00000.parquet"))
        ctx.index._metastore(ctx.index._conf()).invalidate(idx_dir)

        t = ctx.index.parquet(growing_table)
        rows = t.filter("id = 3").collect()
        plain = spark.read.parquet(growing_table).filter("id = 3").collect()
        assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in plain)
        info = ctx.index.last_prune_info
        assert info.pruned
