"""Footer-statistics distrust (reference issue #25 analog).

Parquet writers may truncate long BYTE_ARRAY min/max, and legacy writers
ordered them by signed bytes — a truncated/mis-ordered footer max can
unsoundly prune a file that contains matching rows. The reference refuses
to trust footer stats for strings and recomputes them by scan
(IndexSuite.scala:708-758); the collector's footer fast path must do the
same whenever the footer pair is not provably exact (>=64 UTF-8 bytes or
any non-ASCII byte).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parquet_index_spark import QueryContext
from parquet_index_spark import types as ityp
from parquet_index_spark.collector import (
    _footer_stats_for_file, _footer_str_trusted,
)

from tests.conftest import assert_same_rows


class _FakeStats:
    def __init__(self, mn, mx):
        self.min_raw, self.max_raw = mn, mx


class TestTrustHeuristic:
    def test_short_ascii_trusted(self):
        assert _footer_str_trusted(_FakeStats(b"1-URGENT", b"5-LOW"))

    def test_long_values_distrusted(self):
        long = b"x" * 64
        assert not _footer_str_trusted(_FakeStats(b"a", long))
        assert not _footer_str_trusted(_FakeStats(long, b"a"))
        assert _footer_str_trusted(_FakeStats(b"x" * 63, b"x" * 63))

    def test_non_ascii_distrusted(self):
        assert not _footer_str_trusted(_FakeStats("é".encode(), b"z"))
        assert not _footer_str_trusted(_FakeStats(b"a", b"\xff\xfe"))


class TestFooterFallback:
    def test_long_string_stats_recomputed_from_data(self, tmp_path):
        """A file whose string values exceed the trust length must get
        data-exact min/max through the footer path — identical to what a
        full scan would produce, whatever the footer claims."""
        vals = [("k" * 80) + c for c in "dbyaq"]
        path = str(tmp_path / "long.parquet")
        pq.write_table(pa.table({"key": pa.array(vals)}), path)
        rows, _blocks, _total = _footer_stats_for_file(
            path, "", [("key", ityp.STRING)])
        (row,) = rows
        assert row["has_stats"]
        assert row["min_str"] == min(vals) and row["max_str"] == max(vals)

    def test_short_ascii_keeps_metadata_only_path(self, tmp_path):
        """Trusted footers must NOT trigger data reads — the fast path
        stays metadata-only (stats equal the footer verbatim)."""
        path = str(tmp_path / "short.parquet")
        pq.write_table(pa.table({"key": pa.array(["b", "a", "c"])}), path)
        rows, _b, _t = _footer_stats_for_file(path, "", [("key", ityp.STRING)])
        assert rows[0]["min_str"] == "a" and rows[0]["max_str"] == "c"

    def test_indexed_queries_on_astral_plane_keys_sound(
            self, spark, tmp_metastore, tmp_table_dir):
        """UTF-8 ordering above the BMP (SURVEY §7 hard case / reference
        issue #25 class): Java compares UTF-16 code units, where astral
        characters (surrogate pairs 0xD800-0xDFFF) sort BELOW U+E000..FFFF
        — the opposite of code-point order. Spark's UTF8String and our
        Python fold both compare code points, and non-ASCII footer stats
        are recomputed from data, so point and range queries over keys
        mixing astral (U+1F600), BMP-high (U+FFFD) and ASCII values must
        stay differentially exact against the plain scan."""
        keys = ["apple", "�-replacement", "\U0001F600-grin",
                "\U0001F680-rocket", "zebra", "émigré", "中文键"]
        rows = [(k, i) for i, k in enumerate(keys) for _ in range(3)]
        df = spark.createDataFrame(rows, "key string, v long")
        df.repartition(4, "key").write.mode("overwrite") \
            .parquet(tmp_table_dir)
        ctx = QueryContext(spark)
        ctx.index.create.indexBy("key").parquet(tmp_table_dir)
        t = ctx.index.parquet(tmp_table_dir)
        plain = spark.read.parquet(tmp_table_dir)
        for k in keys:
            assert_same_rows(t.filter(F.col("key") == k),
                             plain.filter(F.col("key") == k))
        # range whose answer differs between code-point and UTF-16 order:
        # U+FFFD < U+1F600 in code points, but reversed in UTF-16 units
        for lo, hi in [("�", "\U0001F700"), ("a", "�"),
                       ("z", "\U0001F650")]:
            pred = (F.col("key") >= lo) & (F.col("key") <= hi)
            assert_same_rows(t.filter(pred), plain.filter(pred))

    def test_indexed_point_query_on_long_keys_sound(
            self, spark, tmp_metastore, tmp_table_dir):
        """End-to-end: footer-only index (filter stats off) over >64-byte
        string keys; every key's equality query must return its rows —
        the unsound-prune regression the truncation guard prevents."""
        spark.conf.set("spark.sql.index.parquet.filter.enabled", "false")
        try:
            prefix = "p" * 80
            df = (spark.range(0, 2000)
                  .select(F.concat(F.lit(prefix),
                                   F.format_string("%04d", F.col("id")))
                          .alias("key"),
                          F.col("id").alias("v")))
            df.repartition(8, "key").write.mode("overwrite") \
                .parquet(tmp_table_dir)
            ctx = QueryContext(spark)
            ctx.index.create.indexBy("key").parquet(tmp_table_dir)
            t = ctx.index.parquet(tmp_table_dir)
            for probe in (0, 777, 1999):
                pred = F.col("key") == f"{prefix}{probe:04d}"
                assert_same_rows(
                    t.filter(pred),
                    spark.read.parquet(tmp_table_dir).filter(pred))
        finally:
            spark.conf.set("spark.sql.index.parquet.filter.enabled", "true")


class TestInt96Legacy:
    """Legacy INT96 timestamps (writeLegacyFormat-era files) carry NO
    footer statistics; the reference decodes them via Julian-day math in
    its read support (ParquetIndexReadSupport.scala:64-73). The collector
    indexes them through the Arrow scan path (which performs the same
    decode), so legacy tables still get min/max pruning."""

    def test_footer_path_decodes_int96_from_data(self, tmp_path):
        import datetime as dt
        vals = [dt.datetime(2001, 1, 1, 12, 0, 0),
                dt.datetime(2015, 6, 1, 0, 0, 1), None]
        path = str(tmp_path / "int96.parquet")
        pq.write_table(
            pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))}),
            path, use_deprecated_int96_timestamps=True)
        assert pq.ParquetFile(path).metadata.schema.column(0) \
            .physical_type == "INT96"
        rows, _b, _t = _footer_stats_for_file(path, "",
                                              [("ts", ityp.TIMESTAMP)])
        (row,) = rows
        assert row["has_stats"] and row["nulls"] == 1
        import datetime as dt2
        epoch = dt2.datetime(1970, 1, 1, tzinfo=dt2.timezone.utc)

        def us(d):
            return int((d.replace(tzinfo=dt2.timezone.utc) - epoch)
                       .total_seconds() * 1_000_000)

        assert row["min_long"] == us(vals[0])
        assert row["max_long"] == us(vals[1])

    def test_indexed_time_range_on_int96_table(self, spark, tmp_metastore,
                                               tmp_table_dir):
        """End-to-end on a Spark-written INT96 table: the index must
        collect stats (no footer to trust), prune files outside the time
        range, and stay differentially exact against the plain scan."""
        old_out = spark.conf.get("spark.sql.parquet.outputTimestampType")
        old_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            df = (spark.range(0, 4000)
                  .select(F.timestamp_seconds(F.lit(1000000000)
                                              + F.col("id") * 60)
                          .alias("ts"),
                          F.col("id").alias("v")))
            (df.repartitionByRange(8, "ts")
             .write.mode("overwrite").parquet(tmp_table_dir))
            part = [f for f in os.listdir(tmp_table_dir)
                    if f.endswith(".parquet")][0]
            assert pq.ParquetFile(os.path.join(tmp_table_dir, part)) \
                .metadata.schema.column(0).physical_type == "INT96"
            ctx = QueryContext(spark)
            ctx.index.create.indexBy("ts").parquet(tmp_table_dir)
            t = ctx.index.parquet(tmp_table_dir)
            plain = spark.read.parquet(tmp_table_dir)
            pred = ("ts >= timestamp'2001-09-09 02:00:00' AND "
                    "ts < timestamp'2001-09-09 04:00:00'")
            assert_same_rows(t.filter(pred), plain.filter(pred))
            info = ctx.index.last_prune_info
            assert info.pruned and info.selected_files < info.total_files
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old_out)
            spark.conf.set("spark.sql.session.timeZone", old_tz)
