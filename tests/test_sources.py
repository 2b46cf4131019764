"""Ingestion/sink tests: write_indexed, CSV/JSON ingestion paths."""

import os

import pytest
from pyspark.sql import Row

from parquet_index_spark import QueryContext
from parquet_index_spark.sources import write_indexed, ingest_csv, ingest_json
from tests.conftest import assert_same_rows


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


class TestWriteIndexed:
    def test_write_and_query(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        df = spark.createDataFrame(
            [Row(k=i, grp=i % 3, s=f"s{i}") for i in range(300)])
        write_indexed(df, path, index_by=["k", "s"], partition_by=["grp"],
                      repartition=4)
        assert ctx.index.exists.parquet(path)
        t = ctx.index.parquet(path)
        assert_same_rows(t.filter("k = 7"),
                         spark.read.parquet(path).filter("k = 7"))
        t.filter("grp = 1 AND k < 50").collect()
        info = ctx.index.last_prune_info
        assert info.selected_files < info.total_files

    def test_index_by_all_default(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t2")
        df = spark.createDataFrame([Row(a=i, b=f"x{i}") for i in range(50)])
        write_indexed(df, path)
        t = ctx.index.parquet(path)
        assert t.filter("b = 'x9'").count() == 1

    def test_overwrite_mode(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t3")
        df1 = spark.createDataFrame([Row(a=1)])
        df2 = spark.createDataFrame([Row(a=2)])
        write_indexed(df1, path, index_by=["a"])
        write_indexed(df2, path, index_by=["a"], mode="overwrite")
        assert [r["a"] for r in ctx.index.parquet(path).collect()] == [2]


class TestIngestion:
    def test_csv_roundtrip(self, spark, ctx, tmp_table_dir):
        csv = os.path.join(tmp_table_dir, "in.csv")
        with open(csv, "w") as fh:
            fh.write("id,name\n1,alpha\n2,beta\n3,gamma\n")
        out = os.path.join(tmp_table_dir, "csv_table")
        ingest_csv(spark, csv, out, index_by=["id"])
        t = ctx.index.parquet(out)
        assert t.filter("id = 2").head()["name"] == "beta"

    def test_json_roundtrip(self, spark, ctx, tmp_table_dir):
        js = os.path.join(tmp_table_dir, "in.json")
        with open(js, "w") as fh:
            fh.write('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
        out = os.path.join(tmp_table_dir, "json_table")
        ingest_json(spark, js, out, index_by=["id"])
        assert ctx.index.parquet(out).filter("id = 1").count() == 1
