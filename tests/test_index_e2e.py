"""End-to-end differential tests: indexed read vs plain read must agree.

Port of the reference's workhorse pattern (IndexSuite.scala:233-360:
checkAnswer(spark.index.parquet(p).filter(f), spark.read.parquet(p).filter(f)))
plus pruning-effectiveness assertions the reference only logs.
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from parquet_index_spark import QueryContext, col
from parquet_index_spark.metastore import IndexExistsError, IndexNotFoundError

from tests.conftest import SF_SMOKE, assert_same_rows

LINEITEM = os.path.join(SF_SMOKE, "lineitem.parquet")


@pytest.fixture()
def multi_file_table(spark, tmp_table_dir):
    """lineitem sf0.001 split into 8 files so pruning has something to skip."""
    path = os.path.join(tmp_table_dir, "lineitem8")
    (spark.read.parquet(LINEITEM)
     .repartitionByRange(8, "l_orderkey")
     .write.parquet(path))
    return path


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


@pytest.fixture(scope="module")
def multi_file_table_ro(spark):
    """Module-scoped twin of multi_file_table for the READ-ONLY test
    classes below: built once instead of per test (the per-test rebuild
    dominated this file's runtime). Never mutate it."""
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="pis_e2e_ro_")
    path = os.path.join(d, "lineitem8")
    (spark.read.parquet(LINEITEM)
     .repartitionByRange(8, "l_orderkey")
     .write.parquet(path))
    yield path
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="class")
def ro_ctx(spark):
    """Class-scoped metastore + context for read-only classes: the index
    is built once per class. Safe because tests within a class run
    consecutively, so the session-global metastore conf is not reset
    by other tests' function-scoped tmp_metastore in between."""
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="pis_metastore_ro_")
    spark.conf.set("spark.sql.index.metastore", d)
    yield QueryContext(spark)
    shutil.rmtree(d, ignore_errors=True)


class TestLifecycle:
    def test_create_exists_delete(self, spark, ctx, multi_file_table):
        assert not ctx.index.exists.parquet(multi_file_table)
        ctx.index.create.indexBy("l_orderkey").parquet(multi_file_table)
        assert ctx.index.exists.parquet(multi_file_table)
        ctx.index.delete.parquet(multi_file_table)
        assert not ctx.index.exists.parquet(multi_file_table)

    def test_mode_error(self, ctx, multi_file_table):
        ctx.index.create.indexBy("l_orderkey").parquet(multi_file_table)
        with pytest.raises(IndexExistsError):
            ctx.index.create.mode("error").indexBy("l_orderkey").parquet(multi_file_table)

    def test_mode_ignore_and_overwrite(self, ctx, multi_file_table):
        ctx.index.create.indexBy("l_orderkey").parquet(multi_file_table)
        ctx.index.create.mode("ignore").indexBy("l_orderkey").parquet(multi_file_table)
        ctx.index.create.mode("overwrite").indexBy("l_orderkey", "l_returnflag") \
            .parquet(multi_file_table)
        assert ctx.index.exists.parquet(multi_file_table)

    def test_load_missing_raises(self, ctx, multi_file_table):
        with pytest.raises(IndexNotFoundError):
            ctx.index.parquet(multi_file_table)

    def test_delete_missing_is_noop(self, ctx, multi_file_table):
        ctx.index.delete.parquet(multi_file_table)  # no raise

    def test_unsupported_column_type_rejected(self, ctx, multi_file_table):
        with pytest.raises(ValueError, match="unsupported type"):
            ctx.index.create.indexBy("l_quantity").parquet(multi_file_table)

    def test_missing_column_rejected(self, ctx, multi_file_table):
        with pytest.raises(ValueError, match="does not exist"):
            ctx.index.create.indexBy("nope").parquet(multi_file_table)


class TestDifferential:
    @pytest.fixture(autouse=True, scope="class")
    def _index(self, request, ro_ctx, multi_file_table_ro):
        ro_ctx.index.create.mode("overwrite") \
            .indexBy("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate") \
            .parquet(multi_file_table_ro)
        request.cls.ctx = ro_ctx
        request.cls.path = multi_file_table_ro

    def _check(self, spark, predicate_sql):
        indexed = self.ctx.index.parquet(self.path).filter(predicate_sql)
        plain = spark.read.parquet(self.path).filter(predicate_sql)
        assert_same_rows(indexed, plain)

    def test_eq_long(self, spark):
        self._check(spark, "l_orderkey = 1")

    def test_eq_no_match(self, spark):
        self._check(spark, "l_orderkey = -42")
        info = self.ctx.index.last_prune_info
        assert info.selected_files == 0

    def test_in(self, spark):
        self._check(spark, "l_orderkey IN (1, 5, 100000000)")

    def test_range_and(self, spark):
        self._check(spark, "l_orderkey > 100 AND l_orderkey <= 500")

    def test_or(self, spark):
        self._check(spark, "l_orderkey = 1 OR l_orderkey = 5000")

    def test_not_eq_is_sound(self, spark):
        # reference folds Not unsoundly (ParquetIndexFilters.scala:118-123);
        # we must return every row with l_orderkey != 1
        self._check(spark, "NOT (l_orderkey = 1)")

    def test_string_eq(self, spark):
        self._check(spark, "l_returnflag = 'R'")

    def test_timestamp_range(self, spark):
        self._check(spark, "l_shipdate > TIMESTAMP '1995-06-01 00:00:00'")

    def test_between(self, spark):
        self._check(spark, "l_linenumber BETWEEN 2 AND 3")

    def test_is_null(self, spark):
        self._check(spark, "l_returnflag IS NULL")

    def test_is_not_null(self, spark):
        self._check(spark, "l_orderkey IS NOT NULL")

    def test_unindexed_column_passthrough(self, spark):
        self._check(spark, "l_quantity > 30.0")

    def test_mixed_indexed_unindexed(self, spark):
        self._check(spark, "l_orderkey < 500 AND l_quantity > 30.0")

    def test_like_passthrough(self, spark):
        self._check(spark, "l_returnflag LIKE 'R%'")

    def test_null_safe_eq(self, spark):
        self._check(spark, "l_orderkey <=> 1")
        # the negation must KEEP null rows (3VL-exact complement)
        self._check(spark, "NOT (l_returnflag <=> 'R')")

    def test_dsl_predicate(self, spark):
        indexed = self.ctx.index.parquet(self.path).filter(
            (col("l_orderkey") == 1) | (col("l_linenumber") > 5))
        plain = spark.read.parquet(self.path).filter(
            (F.col("l_orderkey") == 1) | (F.col("l_linenumber") > 5))
        assert_same_rows(indexed, plain)

    def test_spark_column_predicate_prunes(self, spark):
        # round 2: native Column predicates translate through the analyzed
        # plan and prune like the string DSL (was a full scan in round 1)
        indexed = self.ctx.index.parquet(self.path).filter(
            F.col("l_orderkey") == 1)
        plain = spark.read.parquet(self.path).filter(F.col("l_orderkey") == 1)
        assert_same_rows(indexed, plain)
        assert self.ctx.index.last_prune_info.pruned is True

    def test_dsl_date_literal_on_timestamp(self, spark):
        indexed = self.ctx.index.parquet(self.path).filter(
            col("l_shipdate") > datetime.datetime(1995, 6, 1))
        plain = spark.read.parquet(self.path).filter(
            F.col("l_shipdate") > F.lit(datetime.datetime(1995, 6, 1)))
        assert_same_rows(indexed, plain)


class TestPruningEffectiveness:
    @pytest.fixture(autouse=True, scope="class")
    def _index(self, request, ro_ctx, multi_file_table_ro):
        ro_ctx.index.create.mode("overwrite").indexBy("l_orderkey") \
            .parquet(multi_file_table_ro)
        request.cls.ctx = ro_ctx
        request.cls.path = multi_file_table_ro

    def test_point_query_prunes_files(self, spark):
        t = self.ctx.index.parquet(self.path)
        t.filter("l_orderkey = 1").collect()
        info = self.ctx.index.last_prune_info
        # range-partitioned by l_orderkey: a point query must hit 1 file
        assert info.total_files == 8
        assert info.selected_files == 1

    def test_full_scan_when_unindexed(self, spark):
        t = self.ctx.index.parquet(self.path)
        t.filter("l_quantity > 0.0").collect()
        assert self.ctx.index.last_prune_info.selected_files == 8

    def test_unfiltered_operations_delegate(self, spark):
        t = self.ctx.index.parquet(self.path)
        assert t.count() == spark.read.parquet(self.path).count()
        assert set(t.schema.fieldNames()) == \
            set(spark.read.parquet(self.path).schema.fieldNames())


class TestColumnPredicatePruning:
    """Native pyspark Column predicates (the most natural API) must prune —
    reference parity: every predicate form reaches the index fold
    (IndexSourceStrategy.scala:27-123)."""

    @pytest.fixture(autouse=True, scope="class")
    def _index(self, request, ro_ctx, multi_file_table_ro):
        ro_ctx.index.create.mode("overwrite") \
            .indexBy("l_orderkey", "l_linenumber", "l_returnflag") \
            .parquet(multi_file_table_ro)
        request.cls.ctx = ro_ctx
        request.cls.path = multi_file_table_ro

    def _check(self, spark, col_pred):
        indexed = self.ctx.index.parquet(self.path).filter(col_pred)
        plain = spark.read.parquet(self.path).filter(col_pred)
        assert_same_rows(indexed, plain)
        return self.ctx.index.last_prune_info

    def test_eq_prunes(self, spark):
        info = self._check(spark, F.col("l_orderkey") == 1000)
        assert info.pruned and info.selected_files < info.total_files

    def test_composite_in_or_prunes(self, spark):
        info = self._check(
            spark,
            (F.col("l_orderkey").isin(42, 4242)
             | (F.col("l_returnflag") == "R"))
            & (F.col("l_linenumber") <= 3))
        assert info.pruned

    def test_between_prunes(self, spark):
        info = self._check(spark, F.col("l_orderkey").between(10, 20))
        assert info.pruned and info.selected_files < info.total_files

    def test_unfoldable_warns_and_scans(self, spark):
        import warnings
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            info = self._check(
                spark, F.col("l_returnflag").startswith("R"))
        assert not info.pruned
        assert any("pruning disabled" in str(x.message).lower()
                   or "full" in str(x.message).lower() for x in w)

    def test_unindexed_column_passthrough(self, spark):
        # l_partkey isn't indexed: fold treats it as scan-all, stays correct
        info = self._check(spark, (F.col("l_partkey") == 5)
                           & (F.col("l_orderkey") < 50000))
        assert info.pruned  # the l_orderkey half still folds


class TestExplainPruning:
    def test_per_leaf_file_counts(self, spark, ctx, tmp_table_dir):
        """The diagnosis shows which clause drives the skip: a tight key
        range keeps few files, an unindexed-column clause keeps all, the
        conjunction keeps the intersection-bound."""
        import os
        from pyspark.sql import functions as F
        path = os.path.join(tmp_table_dir, "xp")
        (spark.range(0, 10_000)
         .select("id", (F.col("id") % 7).alias("v"))
         .repartitionByRange(10, "id").write.parquet(path))
        ctx.index.create.indexBy("id").parquet(path)
        t = ctx.index.parquet(path)
        rep = t.explain_pruning("id >= 3000 AND id < 3500 AND v = 2")
        assert rep["pruned"] and rep["total_files"] == 10
        assert rep["overall_files"] <= 2
        leaves = rep["leaves"]
        assert len(leaves) == 3
        by_pref = {k.split("(")[0]: n for k, n in leaves.items()}
        assert by_pref["Ge"] <= 8 and by_pref["Lt"] <= 5
        # v is unindexed: its leaf keeps everything (the tell)
        assert by_pref["Eq"] == 10
        # unfoldable predicate: honest "no pruning" report
        rep2 = t.explain_pruning(F.col("id").cast("string") == "5")
        assert rep2 == {"total_files": 10, "overall_files": 10,
                        "pruned": False, "leaves": {}}
