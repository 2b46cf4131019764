"""Term index (full-text file skipping): collection, fold soundness,
refresh round-trip, and the distributed-fold path.

The term index stores per-block membership filters over each block's
DISTINCT whitespace tokens under the pseudo-column ``<col>#terms``;
``TermMatch`` folds against it and the residual re-filters with the exact
``array_contains(split(trim(col), '\\s+'), term)``.
"""

import os

import pytest
from pyspark.sql import Row, functions as F

from parquet_index_spark import QueryContext
from parquet_index_spark import predicates as P


@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


def _docs_table(spark, ctx, tmp_table_dir, name="td", filter_type=None,
                term_index=True):
    path = os.path.join(tmp_table_dir, name)
    rows = ([Row(doc_id=i, text="alpha beta gamma") for i in range(100)]
            + [Row(doc_id=100 + i, text="delta epsilon zeta")
               for i in range(100)]
            + [Row(doc_id=200 + i, text=f"needle tail{200 + i} word")
               for i in range(100)])
    (spark.createDataFrame(rows).repartitionByRange(6, "doc_id")
     .write.parquet(path))
    if filter_type:
        spark.conf.set("spark.sql.index.parquet.filter.type", filter_type)
    try:
        cmd = ctx.index.create.indexBy("doc_id")
        if term_index:
            cmd = cmd.termIndexBy("text")
        cmd.parquet(path)
    finally:
        if filter_type:
            spark.conf.unset("spark.sql.index.parquet.filter.type")
    return path


class TestTermIndexPruning:
    def test_prunes_and_matches_plain_scan(self, spark, ctx,
                                           tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir)
        t = ctx.index.parquet(path)
        got = sorted(r["doc_id"] for r in
                     t.contains_term("text", "needle").collect())
        info = ctx.index.last_prune_info
        assert got == list(range(200, 300))
        assert info.selected_files < info.total_files
        # exact needle: one document; bloom false positives may add a
        # file or two (fpp .03) but most of the table stays unread
        one = t.contains_term("text", "tail250").collect()
        assert len(one) == 1 and one[0]["doc_id"] == 250
        assert ctx.index.last_prune_info.selected_files \
            < ctx.index.last_prune_info.total_files

    def test_multi_term_is_conjunction(self, spark, ctx, tmp_table_dir):
        # dict filter: exact membership, so file counts are deterministic
        path = _docs_table(spark, ctx, tmp_table_dir, name="tdc",
                           filter_type="dict")
        t = ctx.index.parquet(path)
        assert t.contains_term("text", "alpha", "gamma").count() == 100
        # terms from disjoint blocks: no row holds both
        assert t.contains_term("text", "alpha", "delta").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    def test_absent_term_prunes_everything(self, spark, ctx,
                                           tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tda",
                           filter_type="dict")
        t = ctx.index.parquet(path)
        assert t.contains_term("text", "zzz_missing").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    @pytest.mark.slow
    def test_dict_filter_type_supported(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tdd",
                           filter_type="dict")
        t = ctx.index.parquet(path)
        got = t.contains_term("text", "tail205").collect()
        assert len(got) == 1 and got[0]["doc_id"] == 205
        assert ctx.index.last_prune_info.selected_files <= 2

    def test_no_term_index_soundly_scans(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tdn",
                           term_index=False)
        t = ctx.index.parquet(path)
        got = t.contains_term("text", "needle").count()
        assert got == 100
        info = ctx.index.last_prune_info
        assert info.selected_files == info.total_files  # full, sound scan

    def test_negation_scans_but_is_exact(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tneg")
        t = ctx.index.parquet(path)
        got = t.filter(~P.TermMatch("text", "needle")).count()
        assert got == 200  # exact complement via the residual

    def test_or_with_range_predicate(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tor")
        t = ctx.index.parquet(path)
        pred = P.TermMatch("text", "tail299") | P.Lt("doc_id", 10)
        got = sorted(r["doc_id"] for r in t.filter(pred).collect())
        assert got == list(range(10)) + [299]

    def test_contains_phrase_requires_adjacency(self, spark, ctx,
                                                tmp_table_dir):
        """Phrase search: token-AND pruning + exact adjacency residual.
        Tokens present but non-consecutive must NOT match; normalization
        tolerates irregular whitespace."""
        path = os.path.join(tmp_table_dir, "tph")
        rows = [Row(doc_id=1, text="the quick brown fox jumps"),
                Row(doc_id=2, text="brown the quick stone fox"),  # scattered
                Row(doc_id=3, text="   quick   brown\tfox   "),   # messy ws
                Row(doc_id=4, text="totally unrelated words here")]
        (spark.createDataFrame(rows).repartitionByRange(2, "doc_id")
         .write.parquet(path))
        spark.conf.set("spark.sql.index.parquet.filter.type", "dict")
        try:
            ctx.index.create.indexBy("doc_id").termIndexBy("text") \
                .parquet(path)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.type")
        t = ctx.index.parquet(path)
        got = sorted(r["doc_id"] for r in
                     t.contains_phrase("text", "quick brown fox").collect())
        assert got == [1, 3]
        # a token absent from the corpus prunes everything
        assert t.contains_phrase("text", "quick missing").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0
        with pytest.raises(ValueError, match="non-empty"):
            t.contains_phrase("text", "   ")

    def test_phrase_prunes_on_bigrams(self, spark, ctx, tmp_table_dir):
        """The #terms2 vocabulary stores adjacent bigrams: a phrase of
        individually-COMMON words still prunes to the files where the
        words sit side by side — single-token probes alone would keep
        every file here."""
        path = os.path.join(tmp_table_dir, "tbg")
        rows = ([Row(doc_id=i, text="green blue red green blue")
                 for i in range(100)]   # all tokens, never green-red/red-blue
                + [Row(doc_id=100 + i, text="green red blue wall")
                   for i in range(100)])  # the adjacency lives only here
        (spark.createDataFrame(rows).repartitionByRange(4, "doc_id")
         .write.parquet(path))
        spark.conf.set("spark.sql.index.parquet.filter.type", "dict")
        try:
            ctx.index.create.indexBy("doc_id").termIndexBy("text") \
                .parquet(path)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.type")
        t = ctx.index.parquet(path)
        # every file holds every single token...
        t.contains_term("text", "green").count()
        assert ctx.index.last_prune_info.selected_files == 4
        # ...but the phrase's bigram probe keeps only the adjacency files
        got = t.contains_phrase("text", "green red blue").count()
        info = ctx.index.last_prune_info
        assert got == 100
        assert info.selected_files == 2, info
        # bigram order matters: reversed phrase exists nowhere
        assert t.contains_phrase("text", "blue green").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    def test_contains_any_term_is_disjunction(self, spark, ctx,
                                              tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tany",
                           filter_type="dict")
        t = ctx.index.parquet(path)
        got = t.contains_any_term("text", "alpha", "delta").count()
        assert got == 200
        info = ctx.index.last_prune_info
        assert info.selected_files < info.total_files  # needle files only
        assert t.contains_any_term("text", "zz1", "zz2").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    @pytest.mark.slow
    def test_empty_term_rejected(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="te")
        t = ctx.index.parquet(path)
        with pytest.raises(ValueError, match="non-empty"):
            t.contains_term("text", "  ")
        with pytest.raises(ValueError, match="at least one"):
            t.contains_term("text")


class TestTermIndexComposition:
    def test_count_where_scans_candidates_only(self, spark, ctx,
                                               tmp_table_dir):
        """TermMatch composes with the metadata-accelerated count: only
        files whose token filter may hold the term are scanned (term
        full-match is never claimed, so candidates re-count exactly)."""
        path = _docs_table(spark, ctx, tmp_table_dir, name="tcw",
                           filter_type="dict")
        t = ctx.index.parquet(path)
        n = t.count_where(P.TermMatch("text", "needle"))
        info = ctx.index.last_prune_info
        assert n == 100
        assert info.selected_files < info.total_files
        assert t.count_where(P.TermMatch("text", "zz_missing")) == 0
        assert ctx.index.last_prune_info.selected_files == 0


class TestTermIndexLifecycle:
    @pytest.mark.slow
    def test_refresh_append_and_rebuild_roundtrip(self, spark, ctx,
                                                  tmp_table_dir):
        """Incremental refresh collects term stats for NEW files; the
        rebuild path (file removed) round-trips the term columns through
        their #terms names in metadata.index_columns."""
        path = _docs_table(spark, ctx, tmp_table_dir, name="tr")
        (spark.createDataFrame([Row(doc_id=900, text="fresh uniquetoken")])
         .coalesce(1).write.mode("append").parquet(path))
        ctx.index.refresh.parquet(path)
        t = ctx.index.parquet(path)
        got = t.contains_term("text", "uniquetoken").collect()
        assert len(got) == 1 and got[0]["doc_id"] == 900
        assert ctx.index.last_prune_info.selected_files == 1
        # force the rebuild path: rewrite the table (every file replaced)
        df = spark.read.parquet(path)
        rows = df.collect()
        (spark.createDataFrame(rows, df.schema)
         .repartitionByRange(4, "doc_id")
         .write.mode("overwrite").parquet(path))
        ctx.index.refresh.parquet(path)
        t2 = ctx.index.parquet(path)
        assert t2.contains_term("text", "uniquetoken").count() == 1
        assert ctx.index.last_prune_info.selected_files \
            < ctx.index.last_prune_info.total_files

    def test_requires_filter_statistics(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "tf")
        spark.createDataFrame([Row(doc_id=1, text="a b")]) \
            .write.parquet(path)
        spark.conf.set("spark.sql.index.parquet.filter.enabled", "false")
        try:
            with pytest.raises(ValueError, match="filter statistics"):
                ctx.index.create.indexBy("doc_id").termIndexBy("text") \
                    .parquet(path)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.enabled")

    def test_validates_term_columns(self, spark, ctx, tmp_table_dir):
        path = os.path.join(tmp_table_dir, "tv")
        spark.createDataFrame([Row(doc_id=1, text="a b")]) \
            .write.parquet(path)
        with pytest.raises(ValueError, match="must be string"):
            ctx.index.create.indexBy("text").termIndexBy("doc_id") \
                .parquet(path)
        with pytest.raises(ValueError, match="does not exist"):
            ctx.index.create.indexBy("doc_id").termIndexBy("nope") \
                .parquet(path)


class TestTermIndexSoundness:
    @pytest.mark.parametrize("filter_type", [
        "dict",  # fast representative (round-13 budget trim)
        pytest.param("bloom", marks=pytest.mark.slow),
    ])
    def test_randomized_differential(self, spark, ctx, tmp_table_dir,
                                     filter_type):
        """Seeded randomized sweep: for random corpora and random terms
        (present, absent, and substring-of-a-token — which must NOT
        match), the indexed result equals the plain tokenizing scan."""
        import random
        rng = random.Random(17)
        vocab = [f"w{i}" for i in range(40)]
        rows = [Row(doc_id=i,
                    text=" ".join(rng.choices(vocab,
                                              k=rng.randint(1, 12))))
                for i in range(400)]
        path = os.path.join(tmp_table_dir, f"trand_{filter_type}")
        (spark.createDataFrame(rows).repartitionByRange(5, "doc_id")
         .write.parquet(path))
        spark.conf.set("spark.sql.index.parquet.filter.type", filter_type)
        try:
            ctx.index.create.indexBy("doc_id").termIndexBy("text") \
                .parquet(path)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.type")
        t = ctx.index.parquet(path)
        plain = spark.read.parquet(path)
        probes = (rng.sample(vocab, 8) + ["w999", "absent"]
                  + ["w1 w2", "w"])   # multi-word + prefix: no token match
        for term in probes:
            want = sorted(r["doc_id"] for r in plain.filter(
                F.array_contains(F.split(F.trim("text"), r"\s+"), term)
            ).collect())
            got = sorted(r["doc_id"] for r in
                         t.contains_term("text", term).collect())
            assert got == want, (term, filter_type)


class TestTermIndexDistributedFold:
    @pytest.mark.slow
    def test_spark_fold_matches_numpy_fold(self, spark, ctx,
                                           tmp_table_dir):
        """Force the distributed pruning path (threshold 0) and compare
        survivors with the driver-side numpy fold."""
        path = _docs_table(spark, ctx, tmp_table_dir, name="tsf")
        t = ctx.index.parquet(path)
        for term, expect_rows in (("needle", 100), ("tail233", 1),
                                  ("zzz", 0), ("alpha", 100)):
            base = t.contains_term("text", term).count()
            base_info = ctx.index.last_prune_info
            spark.conf.set("spark.sql.index.pruning.sparkThreshold", "0")
            try:
                dist = t.contains_term("text", term).count()
                dist_info = ctx.index.last_prune_info
            finally:
                spark.conf.unset("spark.sql.index.pruning.sparkThreshold")
            assert dist == base == expect_rows
            assert dist_info.selected_files == base_info.selected_files


class TestTermPrefix:
    """contains_term_prefix — token-prefix search through the dict term
    index (TermPrefixMatch; bloom filters carry no prefix evidence)."""

    def test_prefix_prunes_and_matches_plain(self, spark, ctx,
                                             tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp",
                          filter_type="dict")
        t = ctx.index.parquet(path)
        got = sorted(r["doc_id"] for r in
                     t.contains_term_prefix("text", "eps").collect())
        info = ctx.index.last_prune_info
        assert got == list(range(100, 200))
        assert info.selected_files < info.total_files, info
        plain = sorted(
            r["doc_id"] for r in spark.read.parquet(path)
            .filter(F.exists(F.split(F.trim("text"), r"\s+"),
                             lambda x: x.startswith("eps"))).collect())
        assert got == plain

    def test_shared_prefix_family(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp2",
                          filter_type="dict")
        t = ctx.index.parquet(path)
        got = sorted(r["doc_id"] for r in
                     t.contains_term_prefix("text", "tail2").collect())
        assert got == list(range(200, 300))
        info = ctx.index.last_prune_info
        assert info.selected_files < info.total_files, info

    def test_absent_prefix_prunes_everything(self, spark, ctx,
                                             tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp3",
                          filter_type="dict")
        t = ctx.index.parquet(path)
        assert t.contains_term_prefix("text", "zzz").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    def test_bloom_scans_but_is_exact(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp4",
                          filter_type="bloom")
        t = ctx.index.parquet(path)
        got = sorted(r["doc_id"] for r in
                     t.contains_term_prefix("text", "gam").collect())
        assert got == list(range(0, 100))

    def test_no_term_index_soundly_scans(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp5",
                          term_index=False)
        t = ctx.index.parquet(path)
        assert t.contains_term_prefix("text", "delt").count() == 100
        assert ctx.index.last_prune_info.selected_files == \
            ctx.index.last_prune_info.total_files

    def test_validation(self, spark, ctx, tmp_table_dir):
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp6",
                          filter_type="dict")
        t = ctx.index.parquet(path)
        with pytest.raises(ValueError):
            t.contains_term_prefix("text", "")
        with pytest.raises(ValueError):
            t.contains_term_prefix("text", "two words")

    def test_negation_scans_but_is_exact(self, spark, ctx, tmp_table_dir):
        from parquet_index_spark import predicates as P
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp7",
                          filter_type="dict")
        t = ctx.index.parquet(path)
        got = t.filter(P.Not(P.TermPrefixMatch("text", "eps"))).count()
        assert got == 200  # everything except the epsilon docs

    def test_distributed_fold_matches_numpy(self, spark, ctx,
                                            tmp_table_dir):
        """TermPrefixMatch parity between the numpy and Spark-job
        pruning executions (the term pseudo-column's dict arrays ride
        the pivoted stats frame in the distributed path)."""
        from parquet_index_spark import predicates as P
        from parquet_index_spark.pruning import prune_files
        from parquet_index_spark.pruning_spark import prune_files_with_spark
        path = _docs_table(spark, ctx, tmp_table_dir, name="tp8",
                          filter_type="dict")
        metadata = ctx.index.parquet(path)._metadata
        for prefix in ("eps", "tail2", "zzz", "a"):
            pred = P.TermPrefixMatch("text", prefix)
            numpy_files = set(prune_files(pred, metadata.context()))
            spark_files = set(prune_files_with_spark(spark, metadata, pred))
            assert spark_files == numpy_files, prefix
