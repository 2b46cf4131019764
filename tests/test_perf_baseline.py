"""BASELINE.md commitments: README-snippet reproduction + speedup sanity.

The reference README (README.md:111-146) promises: a 1M-row table across
400 files, point predicate ``id === 123 && code === "123"`` with filter
statistics on, "will scan only small number of files (1 file usually)".
We assert the files-scanned count programmatically (the reference only logs
it) and that the indexed query is not slower than the plain scan.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from parquet_index_spark import QueryContext
from tests.conftest import assert_same_rows


@pytest.fixture(scope="module")
def codes_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("codes") / "codes")
    (spark.range(0, 1_000_000)
     .select(F.col("id"), F.col("id").cast("string").alias("code"))
     .repartition(400, "id")
     .write.parquet(path))
    return path


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


class TestReadmeReproduction:
    @pytest.mark.parametrize("ftype", ["bloom", "dict"])
    def test_point_query_scans_about_one_file(self, spark, ctx, codes_table,
                                              ftype):
        spark.conf.set("spark.sql.index.parquet.filter.type", ftype)
        ctx.index.create.mode("overwrite").indexBy("id", "code") \
            .parquet(codes_table)
        t = ctx.index.parquet(codes_table)
        rows = t.filter("id = 123 AND code = '123'").collect()
        assert len(rows) == 1 and rows[0]["id"] == 123
        info = ctx.index.last_prune_info
        assert info.total_files == 400
        # bloom FPP 3% over 400 files can pass a few extras; dict is exact
        assert info.selected_files <= (1 if ftype == "dict" else 14)

    def test_indexed_not_slower_than_plain(self, spark, ctx, codes_table):
        """Reference's own comparison recipe (README.md:144-146)."""
        spark.conf.set("spark.sql.index.parquet.filter.type", "bloom")
        if not ctx.index.exists.parquet(codes_table):
            ctx.index.create.indexBy("id", "code").parquet(codes_table)
        t = ctx.index.parquet(codes_table)
        pred = "id = 123 AND code = '123'"

        # warm both paths once, then time
        t.filter(pred).collect()
        spark.read.parquet(codes_table).filter(pred).collect()

        t0 = time.time()
        for _ in range(3):
            t.filter(pred).collect()
        indexed_sec = time.time() - t0

        t0 = time.time()
        for _ in range(3):
            spark.read.parquet(codes_table).filter(pred).collect()
        plain_sec = time.time() - t0

        assert_same_rows(t.filter(pred),
                         spark.read.parquet(codes_table).filter(pred))
        # generous bound: pruning must not make us slower; usually >>2x faster
        assert indexed_sec < plain_sec * 1.5, \
            f"indexed {indexed_sec:.2f}s vs plain {plain_sec:.2f}s"
