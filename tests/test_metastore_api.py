"""Metastore protocol, config surface, and catalog-table API tests.

Reference coverage model: MetastoreSuite.scala (39 tests: lifecycle,
permissions, cache), IndexSuite catalog-table cases (887-1008), Python API
plumbing (python/test/test_index.py).
"""

import json
import os

import pytest
from pyspark.sql import Row

from parquet_index_spark import QueryContext
from parquet_index_spark.config import IndexConf
from parquet_index_spark.metastore import (
    LocationSpec, Metastore, IndexExistsError, SUCCESS_FILE,
)
from tests.conftest import assert_same_rows


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


class TestMetastoreProtocol:
    def test_layout(self, ctx, tmp_metastore, spark, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        # {store}/{dataspace}/{identifier}/{scheme}/{path} (Metastore.scala:254-261)
        expected = os.path.join(
            tmp_metastore, "source", "parquet", "file", path.lstrip(os.sep))
        assert os.path.isdir(expected)
        assert os.path.isfile(os.path.join(expected, SUCCESS_FILE))
        assert os.path.isfile(os.path.join(expected, "_table_metadata.json"))

    def test_no_success_marker_means_not_exists(self, ctx, spark,
                                                tmp_metastore, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        idx_dir = os.path.join(
            tmp_metastore, "source", "parquet", "file", path.lstrip(os.sep))
        os.remove(os.path.join(idx_dir, SUCCESS_FILE))
        # corrupt index (no _SUCCESS) reads as absent (Metastore.scala:240-248)
        assert not ctx.index.exists.parquet(path)

    def test_rollback_on_failure(self, tmp_metastore):
        ms = Metastore(tmp_metastore)
        spec = LocationSpec("/tmp/some_table")

        def failing_writer(d):
            with open(os.path.join(d, "partial"), "w") as fh:
                fh.write("x")
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            ms.create(spec, "overwrite", failing_writer)
        # rollback deletes the partial dir (Metastore.scala:166-176)
        assert not os.path.exists(ms.index_dir(spec))

    def test_create_does_not_touch_source_table(self, ctx, spark, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        before = sorted(os.listdir(path))
        ctx.index.create.indexBy("id").parquet(path)
        ctx.index.delete.parquet(path)
        assert sorted(os.listdir(path)) == before

    def test_cache_hit_returns_same_object(self, ctx, spark, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t1 = ctx.index.parquet(path)
        t2 = ctx.index.parquet(path)
        assert t1._metadata is t2._metadata

    def test_overwrite_invalidates_cache(self, ctx, spark, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t1 = ctx.index.parquet(path)
        ctx.index.create.mode("overwrite").indexBy("id").parquet(path)
        t2 = ctx.index.parquet(path)
        assert t1._metadata is not t2._metadata

    def test_cache_ttl_expires_after_access(self, spark, tmp_table_dir):
        """12h expire-after-access (Metastore.scala:60-65): a stale entry
        reloads after the TTL, an access inside the TTL restarts it —
        clock injected, no sleeping."""
        from parquet_index_spark.metastore import (
            CACHE_TTL_SECONDS, LocationSpec, Metastore)
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        from parquet_index_spark import QueryContext
        ctx = QueryContext(spark)
        ctx.index.create.indexBy("id").parquet(path)
        ms_root = spark.conf.get("spark.sql.index.metastore")
        now = [0.0]
        ms = Metastore(ms_root, clock=lambda: now[0])
        spec = LocationSpec(path)
        m1 = ms.load(spec)
        now[0] = CACHE_TTL_SECONDS - 10
        m2 = ms.load(spec)                  # within TTL: cache hit...
        assert m2 is m1
        now[0] = 2 * CACHE_TTL_SECONDS - 20
        assert ms.load(spec) is m1          # ...which restarted the TTL
        now[0] = 3 * CACHE_TTL_SECONDS
        m3 = ms.load(spec)                  # expired: fresh load
        assert m3 is not m1


class TestConfigSurface:
    def test_defaults(self, spark, tmp_metastore):
        conf = IndexConf.from_spark(spark)
        assert conf.metastore_location == tmp_metastore
        assert conf.filter_enabled is True
        assert conf.filter_type == "bloom"
        assert conf.filter_eager_loading is False
        assert conf.create_if_not_exists is False
        assert conf.num_partitions >= 1

    def test_invalid_filter_type_raises(self, spark, tmp_metastore):
        spark.conf.set("spark.sql.index.parquet.filter.type", "roaring")
        try:
            with pytest.raises(ValueError, match="bloom"):
                IndexConf.from_spark(spark)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.type")

    def test_partitions_override(self, spark, tmp_metastore):
        spark.conf.set("spark.sql.index.partitions", "7")
        try:
            assert IndexConf.from_spark(spark).num_partitions == 7
        finally:
            spark.conf.unset("spark.sql.index.partitions")

    def test_create_if_not_exists(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(100).write.parquet(path)
        spark.conf.set("spark.sql.index.createIfNotExists", "true")
        try:
            t = ctx.index.parquet(path)  # auto-creates over all columns
            assert ctx.index.exists.parquet(path)
            assert t.filter("id = 5").count() == 1
        finally:
            spark.conf.set("spark.sql.index.createIfNotExists", "false")


class TestCatalogTables:
    @pytest.fixture()
    def cat_table(self, spark, tmp_table_dir):
        name = "pis_cat_test"
        loc = os.path.join(tmp_table_dir, "cat_tbl")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (spark.createDataFrame([Row(id=i, s=f"v{i}") for i in range(50)])
         .write.option("path", loc).saveAsTable(name))
        yield name
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_catalog_lifecycle_and_query(self, spark, ctx, cat_table,
                                         tmp_metastore):
        assert not ctx.index.exists.table(cat_table)
        ctx.index.create.indexBy("id").table(cat_table)
        assert ctx.index.exists.table(cat_table)
        # lands in the catalog dataspace (IndexLocationSpec.scala:72-78)
        assert os.path.isdir(os.path.join(tmp_metastore, "catalog"))
        t = ctx.index.table(cat_table)
        assert_same_rows(t.filter("id = 7"),
                         spark.table(cat_table).filter("id = 7"))
        ctx.index.delete.table(cat_table)
        assert not ctx.index.exists.table(cat_table)

    def test_non_parquet_table_rejected(self, spark, ctx, tmp_table_dir):
        name = "pis_json_test"
        loc = os.path.join(tmp_table_dir, "json_tbl")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.range(5).write.format("json").option("path", loc).saveAsTable(name)
        try:
            # JSON tables rejected (IndexSuite.scala:917)
            with pytest.raises(ValueError, match="parquet"):
                ctx.index.create.indexBy("id").table(name)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestDescribe:
    def test_describe_summary(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "dt")
        spark.createDataFrame(
            [Row(id=i, s=f"v{i}", part=i % 2) for i in range(100)]) \
            .repartition(2).write.partitionBy("part").parquet(path)
        ctx.index.create.indexBy("id", "s").parquet(path)
        desc = {(r["entry"], r["column"]): r
                for r in ctx.index.describe.parquet(path).collect()}
        table = desc[("TABLE", "")]
        assert table["n_rows"] == 100 and table["n_files"] >= 2
        assert ("INDEXED_COLUMN", "id") in desc
        assert ("INDEXED_COLUMN", "s") in desc
        assert ("PARTITION_COLUMN", "part") in desc

    def test_describe_missing_raises(self, ctx, tmp_table_dir):
        from parquet_index_spark.metastore import IndexNotFoundError
        with pytest.raises(IndexNotFoundError):
            ctx.index.describe.parquet(os.path.join(tmp_table_dir, "nope"))


class TestUnicodeAboveBMP:
    def test_emoji_string_pruning(self, spark, ctx, tmp_table_dir):
        """Supplementary-plane characters: python code-point order must
        agree with Spark's UTF8String binary order (SURVEY §7 risk item —
        the reference's Java UTF-16 ordering diverges here; ours must not)."""
        path = os.path.join(tmp_table_dir, "emoji")
        values = ["zz", "\U0001F600", "�", "aa", "\U0001F4A9zz"]
        spark.createDataFrame([Row(id=i, s=v) for i, v in enumerate(values)]) \
            .repartition(3).write.parquet(path)
        ctx.index.create.indexBy("s").parquet(path)
        t = ctx.index.parquet(path)
        for pred in ["s > 'zz'", "s = '\U0001F600'", "s <= '�'",
                     "s >= '\U0001F4A9'"]:
            a = sorted(tuple(r) for r in t.filter(pred).collect())
            b = sorted(tuple(r) for r in
                       spark.read.parquet(path).filter(pred).collect())
            assert a == b, pred


class TestMetadataPreservation:
    def test_column_metadata_survives_indexed_read(self, spark, ctx,
                                                   tmp_table_dir):
        """Schema metadata (e.g. comments) must round-trip through the
        metastore (reference: IndexSuite.scala:835-886)."""
        from pyspark.sql import types as T
        path = os.path.join(tmp_table_dir, "meta_t")
        schema = T.StructType([
            T.StructField("id", T.LongType(), True,
                          metadata={"comment": "primary id", "ttl": 7}),
            T.StructField("s", T.StringType(), True),
        ])
        df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
        df.write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t = ctx.index.parquet(path)
        field = t.schema["id"]
        assert field.metadata.get("comment") == "primary id"
        assert field.metadata.get("ttl") == 7

    def test_catalog_table_reread_after_cache(self, spark, ctx,
                                              tmp_table_dir, tmp_metastore):
        """Catalog table re-queried through a cached index metadata entry
        (reference: IndexSuite.scala:613)."""
        name = "pis_cached_reread"
        loc = os.path.join(tmp_table_dir, "cached_tbl")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.range(20).write.option("path", loc).saveAsTable(name)
        try:
            ctx.index.create.indexBy("id").table(name)
            first = ctx.index.table(name).filter("id = 3").count()
            second = ctx.index.table(name).filter("id = 3").count()
            assert first == second == 1
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestBuilderPlumbing:
    def test_format_parquet_only(self, ctx):
        ctx.index.format("parquet")  # ok
        with pytest.raises(ValueError, match="not supported"):
            ctx.index.format("json")

    def test_option_path_load(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy("id").parquet(path)
        t = ctx.index.option("path", path).load()
        assert t.count() == 10

    def test_index_by_list_form(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "t")
        spark.range(10).write.parquet(path)
        ctx.index.create.indexBy(["id"]).parquet(path)
        assert ctx.index.exists.parquet(path)

    def test_index_by_empty_raises(self, ctx):
        with pytest.raises(ValueError):
            ctx.index.create.indexBy()

    def test_index_by_non_string_raises(self, ctx):
        with pytest.raises(TypeError):
            ctx.index.create.indexBy(1, 2)


class TestMetastorePermissions:
    """Reference Metastore.scala:96-117: the resolved root must be a
    directory with usable permissions — unusable roots fail FAST with
    the reference's error semantics, not as a confusing mid-build IO
    error on a shared filesystem. Bit-level checks (the reference's
    FsPermission implies-comparison) so the cases hold even when tests
    run as root, where os.access always succeeds."""

    def test_file_as_metastore_rejected(self, tmp_path):
        f = tmp_path / "not_a_dir"
        f.write_text("x")
        with pytest.raises(NotADirectoryError, match="Expected directory"):
            Metastore(str(f))

    def test_unwritable_root_rejected_at_create(self, tmp_path):
        d = tmp_path / "ro_root"
        d.mkdir()
        os.chmod(d, 0o500)
        try:
            with pytest.raises(PermissionError, match="owner rwx"):
                Metastore(str(d))
        finally:
            os.chmod(d, 0o755)

    def test_untraversable_root_rejected(self, tmp_path):
        d = tmp_path / "wo_root"
        d.mkdir()
        os.chmod(d, 0o200)
        try:
            with pytest.raises(PermissionError, match="owner rwx"):
                Metastore(str(d))
        finally:
            os.chmod(d, 0o755)

    def test_unreadable_root_rejected_at_load(self, tmp_path):
        d = tmp_path / "ms"
        ms = Metastore(str(d))
        os.chmod(d, 0o200)
        try:
            with pytest.raises(PermissionError, match="owner r-x"):
                ms.load(LocationSpec(str(tmp_path / "some_table")))
        finally:
            os.chmod(d, 0o755)

    def test_new_root_created_with_reference_mode(self, tmp_path):
        import stat
        d = tmp_path / "fresh"
        Metastore(str(d))
        assert stat.S_IMODE(os.stat(d).st_mode) == 0o744

    def test_private_0700_root_accepted(self, tmp_path):
        """mkdtemp-style private roots are usable by their owner; the
        reference's literal group/other-read demand is relaxed
        (documented deviation in _check_metastore_dir)."""
        d = tmp_path / "private"
        d.mkdir(mode=0o700)
        Metastore(str(d))  # must not raise


class TestGlobPathRejection:
    """Reference contract: table paths resolve via a plain getFileStatus
    and must not contain glob expansions (IndexedDataSource.scala:174-177).
    The repo rejects them eagerly at LocationSpec with a clear message
    instead of surfacing a confusing downstream listing failure."""

    @pytest.mark.parametrize("bad", [
        "/data/table/*.parquet",
        "/data/table/part-?.parquet",
        "/data/[ab]/table",
        "/data/{a,b}/table",
    ])
    def test_glob_path_rejected(self, bad):
        with pytest.raises(ValueError, match="glob"):
            LocationSpec(bad)

    def test_glob_rejected_through_manager(self, ctx):
        with pytest.raises(ValueError, match="glob"):
            ctx.index.create.indexBy("id").parquet("/tmp/tbl/*/part.parquet")
        with pytest.raises(ValueError, match="glob"):
            ctx.index.exists.parquet("/tmp/tbl/*.parquet")
        with pytest.raises(ValueError, match="glob"):
            ctx.index.delete.parquet("/tmp/tbl/*.parquet")

    def test_plain_path_unaffected(self, tmp_path):
        spec = LocationSpec(str(tmp_path / "plain_table"))
        assert spec.table_path.endswith("plain_table")


class TestDescribeSaturation:
    def test_term_index_reports_fill_and_fpp(self, spark, ctx,
                                             tmp_table_dir):
        """describe surfaces per-column membership-filter capacity:
        term-indexed columns report filter_blocks / fill / est fpp so an
        operator can see phrase-index (bigram) vocabulary pressure
        before pruning degrades to may-match."""
        path = os.path.join(tmp_table_dir, "dsat")
        docs = [(i, " ".join(f"w{i}_{j}" for j in range(30)))
                for i in range(50)]
        spark.createDataFrame(docs, "doc_id: long, text: string") \
            .coalesce(1).write.parquet(path)
        (ctx.index.create.indexBy("doc_id").termIndexBy("text")
            .parquet(path))
        desc = {r["column"]: r
                for r in ctx.index.describe.parquet(path).collect()}
        terms = desc["text#terms2"]
        assert terms["filter_blocks"] >= 1
        assert terms["max_stored_items"] > 0
        # healthy index: under design capacity, tiny fpp, not saturated
        assert terms["saturated"] is False
        if terms["max_fill"] is not None:       # bloom-backed
            assert 0.0 < terms["max_fill"] < 0.55
            assert terms["max_est_fpp"] < 0.05
            assert terms["design_item_cap"] >= terms["max_stored_items"]
        # non-filter rows carry the null telemetry shape
        assert desc[""]["filter_blocks"] == 0

    def test_oversized_block_flags_saturated(self):
        """A block whose vocabulary overflowed its bloom's design
        capacity (the 2^20 sizing cap on long documents) must flag
        ``saturated`` with an honest fpp estimate — telemetry is
        recovered from the stored bits alone, so it works on existing
        indexes. Exercised directly on a deliberately 10x-overfilled
        filter (building a 2^20-term block in-test is minutes of CPU;
        the math is identical at any scale)."""
        import pyarrow as pa
        from parquet_index_spark.collector import STATS_SCHEMA
        from parquet_index_spark.manager import DataFrameIndexManager
        from parquet_index_spark.statistics import BloomFilter

        bf = BloomFilter.create(100, 0.03)   # sized for 100 items
        for i in range(1000):                # ...holds 1000
            bf.put_bytes(f"tok{i}".encode())
        healthy = BloomFilter.create(100, 0.03)
        for i in range(80):
            healthy.put_bytes(f"tok{i}".encode())
        rows = [
            {"path": "f.parquet", "block": 0, "rows": 10,
             "column": "text#terms2", "nulls": 0, "has_stats": False,
             "bloom": bf.to_bytes()},
            {"path": "f.parquet", "block": 1, "rows": 10,
             "column": "text#terms2", "nulls": 0, "has_stats": False,
             "bloom": healthy.to_bytes()},
        ]
        stats = pa.Table.from_pylist(rows, schema=STATS_SCHEMA)

        class _Meta:
            def _load_stats(self):
                return stats

        sat = DataFrameIndexManager._filter_saturation(_Meta())
        blocks, items, cap, fill, fpp, saturated = sat["text#terms2"]
        assert blocks == 2 and saturated is True
        assert items > 1.1 * cap             # overflow detected
        assert fill > 0.9 and fpp > 0.5      # near-useless filter, said so

    def test_explain_pruning_attaches_saturation(self, spark, ctx,
                                                 tmp_table_dir):
        path = os.path.join(tmp_table_dir, "dsat2")
        docs = [(i, " ".join(f"t{i}_{j}" for j in range(20)))
                for i in range(40)]
        spark.createDataFrame(docs, "doc_id: long, text: string") \
            .coalesce(1).write.parquet(path)
        (ctx.index.create.indexBy("doc_id").termIndexBy("text")
            .parquet(path))
        t = ctx.index.parquet(path)
        base = t.explain_pruning("doc_id = 3")
        assert "filter_saturation" not in base        # opt-in
        d = t.explain_pruning("doc_id = 3", include_saturation=True)
        sat = d["filter_saturation"]
        assert "text#terms2" in sat
        assert sat["text#terms2"]["filter_blocks"] >= 1
        assert sat["text#terms2"]["saturated"] is False

    def test_describe_reports_size_accounting(self, spark, ctx,
                                              tmp_table_dir):
        """The TABLE row carries table_bytes (manifest sum) and
        index_bytes (metastore dir walk) — the index-overhead ratio an
        operator sizing a rollout asks for first."""
        path = os.path.join(tmp_table_dir, "dsz")
        spark.range(0, 5000).selectExpr("id", "CAST(id AS STRING) AS s") \
            .repartition(4).write.parquet(path)
        ctx.index.create.indexBy("id", "s").parquet(path)
        desc = {r["entry"]: r
                for r in ctx.index.describe.parquet(path).collect()}
        t = desc["TABLE"]
        assert t["table_bytes"] > 0 and t["index_bytes"] > 0
        # (no index<data ratio assert: at toy scale per-block blooms can
        # exceed the compact data; the ratio only means something at SF)
        assert desc["INDEXED_COLUMN"]["table_bytes"] is None


class TestRecommendFilterTypes:
    def test_recommendations_follow_observed_stats(self, spark, ctx,
                                                   tmp_table_dir):
        from pyspark.sql import functions as F
        path = os.path.join(tmp_table_dir, "rec")
        (spark.range(0, 20_000)
         .select("id",                                     # dense ints
                 (F.col("id") % 13).alias("lowcard"),      # tiny dict
                 F.concat(F.lit("u"), (F.col("id") * 7919) % 1_000_000)
                 .cast("string").alias("highcard"),        # wide strings
                 (F.col("id") * 1_000_000).alias("wide"))  # huge span
         .repartition(4).write.parquet(path))
        ctx.index.create.indexBy("id", "lowcard", "highcard", "wide") \
            .parquet(path)
        rec = {r["column"]: r for r in
               ctx.index.parquet(path).recommend_filter_types()}
        assert rec["lowcard"]["recommended_type"] == "dict"
        # ~5000 distinct ids per block > dict cap, span < 2^20 -> bitmap
        assert rec["id"]["recommended_type"] == "bitmap"
        # huge span, high cardinality int -> bloom
        assert rec["wide"]["recommended_type"] == "bloom"
        # strings never bitmap; high-cardinality -> bloom
        assert rec["highcard"]["recommended_type"] == "bloom"
        for r in rec.values():
            assert r["current_type"] in ("bloom", "dict", "bitmap", "none")
            assert r["reason"]
        # r6 ADVICE: a bloom-fill-derived distinct count is an ESTIMATE
        # and must be flagged as such in the advice (and compared against
        # a 20%-margined dict cap, not the raw one)
        if rec["lowcard"]["current_type"] == "bloom":
            assert "estimate" in rec["lowcard"]["reason"]

    def test_estimated_counts_get_margin_exact_counts_do_not(
            self, spark, ctx, tmp_table_dir, monkeypatch):
        """The decision boundary itself (r6 ADVICE / r7 verdict #6a):
        a FILL-DERIVED estimate just under the dict cap must NOT tip the
        advice to 'dict' (20% safety margin) while an EXACT count of the
        same size does. Saturation rows are crafted directly so the
        boundary is hit deterministically."""
        from parquet_index_spark.config import IndexConf
        from parquet_index_spark.manager import DataFrameIndexManager
        path = os.path.join(tmp_table_dir, "recmargin")
        spark.range(0, 100).selectExpr("CAST(id AS STRING) AS s") \
            .coalesce(1).write.parquet(path)
        ctx.index.create.indexBy("s").parquet(path)
        t = ctx.index.parquet(path)
        cap = IndexConf.from_spark(spark).dict_max_size
        near_cap = cap - 1          # inside the 20% margin band
        safe = int(cap * 0.7)       # below the margined cap

        # estimated (design cap present) at cap-1 -> NOT dict
        monkeypatch.setattr(
            DataFrameIndexManager, "_filter_saturation",
            staticmethod(lambda meta: {"s": (4, near_cap, cap, 0.9,
                                             0.01, False)}))
        rec = {r["column"]: r for r in t.recommend_filter_types()}
        assert rec["s"]["recommended_type"] == "bloom", rec["s"]
        # estimated but comfortably under 0.8*cap -> dict, flagged
        monkeypatch.setattr(
            DataFrameIndexManager, "_filter_saturation",
            staticmethod(lambda meta: {"s": (4, safe, cap, 0.5,
                                             0.01, False)}))
        rec = {r["column"]: r for r in t.recommend_filter_types()}
        assert rec["s"]["recommended_type"] == "dict"
        assert "estimate" in rec["s"]["reason"]
        # EXACT count (no design cap) at cap-1 -> dict, no estimate flag
        monkeypatch.setattr(
            DataFrameIndexManager, "_filter_saturation",
            staticmethod(lambda meta: {"s": (4, near_cap, None, None,
                                             None, False)}))
        rec = {r["column"]: r for r in t.recommend_filter_types()}
        assert rec["s"]["recommended_type"] == "dict"
        assert "estimate" not in rec["s"]["reason"]


class TestCli:
    def test_usage_paths_no_spark(self):
        """Bad invocations exit 2 with usage, before any session spins
        up (the happy paths are wrappers over methods tested above and
        are driven in the verify flows)."""
        from parquet_index_spark.__main__ import main
        assert main([]) == 2
        assert main(["bogus", "/x"]) == 2
        assert main(["explain", "/x"]) == 2   # missing predicate
        assert main(["recommend-ivf"]) == 2   # missing path
        assert main(["validate", "/x"]) == 2  # missing rules

    def test_rule_specs_parse_no_spark(self):
        from parquet_index_spark.__main__ import _parse_rule
        from parquet_index_spark.operators import validate as V
        assert _parse_rule("not_null:c") == V.not_null("c")
        assert _parse_rule("unique:c") == V.unique("c")
        assert _parse_rule("unique~:c") == V.unique("c", approximate=True)
        assert _parse_rule("range:c:0,10") == V.in_range("c", 0.0, 10.0)
        assert _parse_rule("range:c:0,") == V.in_range("c", lo=0.0)
        assert _parse_rule("set:c:a,b") == V.in_set("c", ["a", "b"])
        assert _parse_rule("regex:c:^x-") == V.matches("c", "^x-")
        import pytest as _pt
        for bad in ("nope", "what:c", "range:c", "set:c", "regex:c"):
            with _pt.raises(SystemExit):
                _parse_rule(bad)

    def test_validate_cli_gates_on_failure(self, spark, tmp_table_dir):
        from parquet_index_spark.__main__ import main
        p = os.path.join(tmp_table_dir, "cli_dirty")
        spark.createDataFrame([(1,), (1,), (None,)], "id int") \
            .write.parquet(p)
        assert main(["validate", p, "not_null:id", "unique:id"]) == 1
        clean = os.path.join(tmp_table_dir, "cli_clean")
        spark.range(5).write.parquet(clean)
        assert main(["validate", clean, "not_null:id", "unique:id"]) == 0


class TestSessionCacheKeys:
    """Round-11 (round-10 verdict #1): every per-session singleton cache
    keys on applicationId, never the CPython id of the session object —
    ids are reused after GC, so a restarted session landing on a dead
    session's id must NOT inherit its cache entries (stale Metastore
    metadata; a skipped addPyFile failing the stats job mid-flight).
    Simulated with mock sessions: distinct objects sharing an
    applicationId model one app; a fresh applicationId models a
    restarted context (which is what a real replacement produces)."""

    class _FakeSC:
        def __init__(self, app_id):
            self.applicationId = app_id
            self.shipped = []

        def addPyFile(self, path):
            self.shipped.append(path)

    class _FakeSession:
        def __init__(self, app_id):
            self.sparkContext = TestSessionCacheKeys._FakeSC(app_id)

    def test_metastore_singleton_follows_application_id(self, tmp_path):
        import uuid

        from parquet_index_spark import manager as M
        app_a, app_b = f"app-{uuid.uuid4()}", f"app-{uuid.uuid4()}"
        loc = str(tmp_path / "ms")
        s1 = self._FakeSession(app_a)
        ms1 = M._metastore_for(s1, loc)
        # a DIFFERENT session object of the SAME application (the id-reuse
        # scenario: the key must not depend on the object identity)
        s2 = self._FakeSession(app_a)
        assert M._metastore_for(s2, loc) is ms1
        # a replaced context (fresh applicationId) gets a FRESH metastore
        s3 = self._FakeSession(app_b)
        ms3 = M._metastore_for(s3, loc)
        assert ms3 is not ms1
        for k in list(M._METASTORES):
            if k[0] in (app_a, app_b):
                del M._METASTORES[k]

    def test_package_reships_for_new_application(self):
        import uuid

        from parquet_index_spark import collector as C
        app_a, app_b = f"app-{uuid.uuid4()}", f"app-{uuid.uuid4()}"
        s1 = self._FakeSession(app_a)
        C._ensure_package_shipped(s1)
        assert len(s1.sparkContext.shipped) == 1
        # same application, different session OBJECT: ship-once holds
        s2 = self._FakeSession(app_a)
        C._ensure_package_shipped(s2)
        assert s2.sparkContext.shipped == []
        # replaced context: MUST re-ship (the round-10 verdict hazard —
        # a skipped addPyFile means ModuleNotFoundError on executors)
        s3 = self._FakeSession(app_b)
        C._ensure_package_shipped(s3)
        assert len(s3.sparkContext.shipped) == 1
        C._SHIPPED_SESSIONS.discard(app_a)
        C._SHIPPED_SESSIONS.discard(app_b)

    def test_workload_ctx_cache_keys_on_application_id(self, spark):
        from parquet_index_spark import workload as W
        ctx1 = W._session_ctx(spark)
        assert W._session_ctx(spark) is ctx1
        app = spark.sparkContext.applicationId
        assert app in W._CTX_CACHE


class TestVacuumCli:
    """Round-10 verdict #5: a stranded-tmp recovery at 3am must not
    require a Python REPL — ``python -m parquet_index_spark vacuum
    <path>`` with exit 0 (clean, restores included) vs 3 (dirs KEPT
    for manual inspection)."""

    def test_vacuum_cli_restores_and_exits_clean(self, spark, ctx,
                                                 tmp_table_dir, capsys):
        import glob
        import json
        import shutil

        from parquet_index_spark.__main__ import main
        from parquet_index_spark.sources import STAGE_SIDECAR
        path = os.path.join(tmp_table_dir, "cli_vac")
        spark.range(0, 400).selectExpr("id AS k").repartition(4, "k") \
            .write.parquet(path)
        ctx.index.create.indexBy("k").parquet(path)
        # strand a tmp holding one displaced original + its sidecar
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        victim = os.path.basename(files[0])
        tmp = path + "__merge_tmp"
        os.makedirs(tmp)
        shutil.move(files[0], os.path.join(tmp, victim))
        with open(os.path.join(tmp, STAGE_SIDECAR), "w") as fh:
            fh.write(victim + "\n")
        assert main(["vacuum", path]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["restored"] == [os.path.join(path, victim)]
        assert out["removed"] == [tmp] and out["kept"] == []
        assert not os.path.exists(tmp)
        assert spark.read.parquet(path).count() == 400

    def test_vacuum_cli_heals_swap_window_crash(self, spark, ctx,
                                                tmp_table_dir, capsys):
        """Round-11 review (third pass): the crash BETWEEN the swap's
        two renames (bak present, table dir absent, tmp fully staged)
        previously dead-ended the CLI with exit 3 on two kept dirs —
        while every DML entry self-heals the same state. vacuum_table
        now restores the bak first, then the sidecar-listed displaced
        entries, so the 3am runbook path recovers the table."""
        import glob
        import json
        import shutil

        from parquet_index_spark.__main__ import main
        from parquet_index_spark.sources import STAGE_SIDECAR
        path = os.path.join(tmp_table_dir, "cli_swapwin")
        spark.range(0, 400).selectExpr("id AS k").repartition(4, "k") \
            .write.parquet(path)
        ctx.index.create.indexBy("k").parquet(path)
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        carried = os.path.basename(files[-1])
        tmp, bak = path + "__merge_tmp", path + "__merge_bak"
        os.makedirs(tmp)
        shutil.move(files[-1], os.path.join(tmp, carried))
        with open(os.path.join(tmp, STAGE_SIDECAR), "w") as fh:
            fh.write(carried + "\n")
        with open(os.path.join(tmp, "part-rewrite.parquet"), "wb") as fh:
            fh.write(b"never-visible rewrite")
        os.rename(path, bak)
        assert main(["vacuum", path]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["kept"] == []
        assert path in out["restored"]           # whole-table bak restore
        assert os.path.join(path, carried) in out["restored"]
        assert not os.path.exists(bak) and not os.path.exists(tmp)
        assert spark.read.parquet(path).count() == 400

    def test_vacuum_cli_kept_dirs_exit_3(self, spark, tmp_table_dir,
                                         capsys):
        import json

        from parquet_index_spark.__main__ import main
        # unclassifiable: non-empty tmp, no sidecar, no table at all
        gone = os.path.join(tmp_table_dir, "cli_vac_gone")
        os.makedirs(gone + "__delete_tmp")
        with open(os.path.join(gone + "__delete_tmp", "part-x.parquet"),
                  "wb") as fh:
            fh.write(b"maybe the only copy")
        assert main(["vacuum", gone]) == 3
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["kept"] == [gone + "__delete_tmp"]
        assert os.path.exists(
            os.path.join(gone + "__delete_tmp", "part-x.parquet"))
