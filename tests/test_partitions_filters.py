"""E2E tests: hive-partitioned tables, filter statistics, edge fixtures.

Covers the reference's partitioned-table and filter-statistics matrix
(IndexSuite.scala:68-91, 417-541) and its edge fixtures: all-null columns
(691), empty partitions/tables (759-794), empty strings (795-834), UTF-8
ordering (708-758).
"""

import os

import pytest
from pyspark.sql import Row, functions as F

from parquet_index_spark import QueryContext, col
from tests.conftest import assert_same_rows


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


class TestPartitionedTables:
    @pytest.fixture()
    def ptable(self, spark, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "ptable")
        df = spark.createDataFrame(
            [Row(str_col=f"s{i}", num=i, part=i % 4) for i in range(100)])
        df.write.partitionBy("part").parquet(path)
        return path

    def test_partition_pruning(self, spark, ctx, ptable):
        ctx.index.create.indexBy("num").parquet(ptable)
        t = ctx.index.parquet(ptable)
        indexed = t.filter("part = 2")
        plain = spark.read.parquet(ptable).filter("part = 2")
        assert_same_rows(indexed, plain)
        info = ctx.index.last_prune_info
        assert info.selected_files < info.total_files

    def test_partition_and_data_predicate(self, spark, ctx, ptable):
        ctx.index.create.indexBy("num").parquet(ptable)
        t = ctx.index.parquet(ptable)
        assert_same_rows(
            t.filter("part = 1 AND num < 10"),
            spark.read.parquet(ptable).filter("part = 1 AND num < 10"))

    def test_partition_in_range(self, spark, ctx, ptable):
        ctx.index.create.indexBy("num").parquet(ptable)
        t = ctx.index.parquet(ptable)
        for pred in ["part IN (0, 3)", "part > 2", "part <> 1"]:
            assert_same_rows(t.filter(pred),
                             spark.read.parquet(ptable).filter(pred))

    def test_whole_partition_collapses_to_directory(self, spark, ctx, ptable):
        """When every file of a partition survives, the reader gets the
        directory path, not the file list (scale: short path lists)."""
        ctx.index.create.mode("overwrite").indexBy("num").parquet(ptable)
        t = ctx.index.parquet(ptable)
        survivors = None
        import parquet_index_spark.manager as mgr
        orig = mgr.IndexedDataFrame._collapse_to_directories

        def spy(self, s):
            nonlocal survivors
            survivors = orig(self, s)
            return survivors

        mgr.IndexedDataFrame._collapse_to_directories = spy
        try:
            t.filter("part = 2").collect()
        finally:
            mgr.IndexedDataFrame._collapse_to_directories = orig
        assert survivors == ["part=2"]

    def test_indexing_partition_column_rejected(self, ctx, ptable):
        # ParquetMetastoreSupport.scala:111-117
        with pytest.raises(ValueError, match="partition column"):
            ctx.index.create.indexBy("part").parquet(ptable)

    def test_index_by_all_skips_partition_columns(self, spark, ctx, ptable):
        ctx.index.create.indexByAll().parquet(ptable)
        t = ctx.index.parquet(ptable)
        assert_same_rows(t.filter("str_col = 's7'"),
                         spark.read.parquet(ptable).filter("str_col = 's7'"))

    def test_string_partition_values(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "strpart")
        df = spark.createDataFrame(
            [Row(v=i, grp=g) for i in range(20) for g in ("us", "eu")])
        df.write.partitionBy("grp").parquet(path)
        ctx.index.create.indexBy("v").parquet(path)
        t = ctx.index.parquet(path)
        assert_same_rows(t.filter("grp = 'eu' AND v <= 3"),
                         spark.read.parquet(path).filter("grp = 'eu' AND v <= 3"))
        assert ctx.index.last_prune_info.selected_files < \
            ctx.index.last_prune_info.total_files


class TestFilterStatistics:
    @pytest.fixture(autouse=True)
    def _restore_filter_confs(self, spark):
        keys = ("spark.sql.index.parquet.filter.enabled",
                "spark.sql.index.parquet.filter.type")

        def get(k):
            try:
                return spark.conf.get(k)
            except Exception:
                return None
        old = {k: get(k) for k in keys}
        yield
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    @pytest.fixture()
    def table16(self, spark, tmp_table_dir):
        """wide16 fixture: 16 rows in 16 files (IndexSuite.scala:233-357)."""
        path = os.path.join(tmp_table_dir, "wide16")
        df = spark.createDataFrame([Row(id=i, s=f"id-{i}") for i in range(16)])
        df.repartition(16, "id").write.parquet(path)
        return path

    @pytest.mark.parametrize("ftype", ["bloom", "dict", "bitmap"])
    def test_point_query_with_filter_stats(self, spark, ctx, table16, ftype):
        spark.conf.set("spark.sql.index.parquet.filter.enabled", "true")
        spark.conf.set("spark.sql.index.parquet.filter.type", ftype)
        ctx.index.create.mode("overwrite").indexBy("id", "s").parquet(table16)
        t = ctx.index.parquet(table16)
        assert_same_rows(t.filter("id = 7"),
                         spark.read.parquet(table16).filter("id = 7"))
        # hash-partitioned files all share overlapping [min,max]; the
        # membership filter is what gets this to ~1 file
        assert ctx.index.last_prune_info.selected_files <= 2
        assert_same_rows(t.filter("s = 'id-3'"),
                         spark.read.parquet(table16).filter("s = 'id-3'"))
        assert ctx.index.last_prune_info.selected_files <= 2

    def test_no_filter_stats_scans_more(self, spark, ctx, table16):
        spark.conf.set("spark.sql.index.parquet.filter.enabled", "false")
        try:
            ctx.index.create.mode("overwrite").indexBy("id").parquet(table16)
            t = ctx.index.parquet(table16)
            assert_same_rows(t.filter("id = 7"),
                             spark.read.parquet(table16).filter("id = 7"))
        finally:
            spark.conf.set("spark.sql.index.parquet.filter.enabled", "true")

    @pytest.mark.parametrize("eager", ["true", "false"])
    def test_eager_vs_lazy_loading(self, spark, ctx, table16, eager):
        spark.conf.set("spark.sql.index.parquet.filter.eagerLoading", eager)
        try:
            ctx.index.create.mode("overwrite").indexBy("id").parquet(table16)
            t = ctx.index.parquet(table16)
            assert_same_rows(t.filter("id IN (3, 12)"),
                             spark.read.parquet(table16).filter("id IN (3, 12)"))
        finally:
            spark.conf.set("spark.sql.index.parquet.filter.eagerLoading", "false")


class TestEdgeFixtures:
    def test_all_null_column(self, spark, ctx, tmp_table_dir):
        # IndexSuite.scala:691-707
        path = os.path.join(tmp_table_dir, "allnulls")
        df = spark.createDataFrame(
            [Row(id=i, nullable=None) for i in range(10)],
            schema="id bigint, nullable string")
        df.repartition(2).write.parquet(path)
        ctx.index.create.indexBy("id", "nullable").parquet(path)
        t = ctx.index.parquet(path)
        assert_same_rows(t.filter("nullable IS NULL"),
                         spark.read.parquet(path).filter("nullable IS NULL"))
        assert_same_rows(t.filter("nullable = 'x'"),
                         spark.read.parquet(path).filter("nullable = 'x'"))
        assert ctx.index.last_prune_info.selected_files == 0
        assert_same_rows(t.filter("nullable IS NOT NULL"),
                         spark.read.parquet(path).filter("nullable IS NOT NULL"))

    def test_empty_strings(self, spark, ctx, tmp_table_dir):
        # IndexSuite.scala:795-834
        path = os.path.join(tmp_table_dir, "emptystr")
        df = spark.createDataFrame(
            [Row(id=i, s="" if i % 2 == 0 else f"v{i}") for i in range(10)])
        df.repartition(2).write.parquet(path)
        ctx.index.create.indexBy("s").parquet(path)
        t = ctx.index.parquet(path)
        for pred in ["s = ''", "s = 'v1'", "s > ''"]:
            assert_same_rows(t.filter(pred),
                             spark.read.parquet(path).filter(pred))

    def test_empty_table(self, spark, ctx, tmp_table_dir):
        # IndexSuite.scala:759-794: zero-row files => every query empty
        path = os.path.join(tmp_table_dir, "empty")
        df = spark.createDataFrame([], schema="id bigint, s string")
        df.repartition(2).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t = ctx.index.parquet(path)
        assert t.filter("id = 1").count() == 0
        assert t.filter("id IS NULL").count() == 0

    def test_utf8_values(self, spark, ctx, tmp_table_dir):
        # issue #25 fixture (IndexSuite.scala:708-758): non-ASCII strings
        path = os.path.join(tmp_table_dir, "utf8")
        values = ["aa≤", "bb", "ÿzz", "aa", "≤≥"]
        df = spark.createDataFrame([Row(id=i, s=s) for i, s in enumerate(values)])
        df.repartition(2).write.parquet(path)
        ctx.index.create.indexBy("s").parquet(path)
        t = ctx.index.parquet(path)
        for pred in ["s = 'aa≤'", "s > 'bb'", "s <= 'aa'", "s = '≤≥'"]:
            assert_same_rows(t.filter(pred),
                             spark.read.parquet(path).filter(pred))

    def test_nested_types_rejected(self, spark, ctx, tmp_table_dir):
        # IndexSuite.scala:657-690
        path = os.path.join(tmp_table_dir, "nested")
        df = spark.range(5).select(
            F.col("id"), F.array(F.col("id")).alias("arr"),
            F.struct(F.col("id").alias("a")).alias("st"))
        df.write.parquet(path)
        for bad in ("arr", "st"):
            with pytest.raises(ValueError, match="unsupported type"):
                ctx.index.create.mode("overwrite").indexBy(bad).parquet(path)
        # indexByAll silently keeps only supported columns
        ctx.index.create.mode("overwrite").indexByAll().parquet(path)
        t = ctx.index.parquet(path)
        assert_same_rows(t.filter("id = 3"),
                         spark.read.parquet(path).filter("id = 3"))

    def test_single_file_table(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "single.parquet")
        spark.range(100).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t = ctx.index.parquet(path)
        assert_same_rows(t.filter("id = 5"),
                         spark.read.parquet(path).filter("id = 5"))
