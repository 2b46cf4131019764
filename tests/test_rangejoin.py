"""interval_join (bucketed range join) and dpp_join (index-aware star
join): differential correctness vs a naive formulation, plan guards, and
file-skip assertions.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_index_spark import plans
from parquet_index_spark.operators.rangejoin import interval_join
from tests.conftest import SF_CORRECT, assert_same_rows


def _points(spark):
    rows = [(i, ts) for i, ts in enumerate(
        [0, 50, 99, 100, 101, 250, 999, 1000, 5000, -120, -1])]
    return spark.createDataFrame(rows, "pid long, ts long")


def _intervals(spark):
    rows = [(0, 0, 100), (1, 90, 210), (2, 1000, 1000), (3, 4000, 6000),
            (4, -200, -100), (5, 7000, 8000)]
    return spark.createDataFrame(rows, "iid long, lo long, hi long")


def _naive(points, intervals, how="inner"):
    cond = points["ts"].between(intervals["lo"], intervals["hi"])
    return points.crossJoin(intervals).filter(cond) if how == "inner" else \
        points.join(intervals, cond, "left")


class TestIntervalJoin:
    @pytest.mark.parametrize("width", [
        pytest.param(1, marks=pytest.mark.slow),
        pytest.param(7, marks=pytest.mark.slow),
        100,
        pytest.param(1000, marks=pytest.mark.slow)])
    def test_matches_naive_inner(self, spark, width):
        p, iv = _points(spark), _intervals(spark)
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=width)
        assert_same_rows(out.select("pid", "iid"),
                         _naive(p, iv).select("pid", "iid"))

    def test_matches_naive_left(self, spark):
        p, iv = _points(spark), _intervals(spark)
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=64,
                            how="left")
        assert_same_rows(out.select("pid", "iid"),
                         _naive(p, iv, "left").select("pid", "iid"))

    def test_negative_timestamps_floor_not_trunc(self, spark):
        """floor-division bucketing: ts=-120 must land in interval
        [-200, -100] even though -120 div 100 truncates toward zero."""
        p, iv = _points(spark), _intervals(spark)
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=100)
        got = {(r.pid, r.iid) for r in out.select("pid", "iid").collect()}
        assert (9, 4) in got

    def test_keyed_join_restricts_matches(self, spark):
        p = spark.createDataFrame([(1, "a", 50), (2, "b", 50)],
                                  "pid long, k string, ts long")
        iv = spark.createDataFrame([(10, "a", 0, 100)],
                                   "iid long, k string, lo long, hi long")
        out = interval_join(p, iv, "ts", "lo", "hi", keys=["k"],
                            bucket_width=10)
        assert [(r.pid, r.iid) for r in out.select("pid", "iid").collect()] \
            == [(1, 10)]

    def test_no_nested_loop_plan(self, spark):
        p, iv = _points(spark), _intervals(spark)
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=100)
        plans.assert_no_cartesian(out)
        plan = plans.formatted_plan(out)
        assert "BroadcastNestedLoopJoin" not in plan

    def test_self_source_join(self, spark):
        """points and intervals derived from the SAME DataFrame (the
        workload's error-window shape) must resolve unambiguously."""
        base = spark.createDataFrame([(1, 10), (2, 100)], "id long, ts long")
        p = base.select(F.col("id").alias("pid"), "ts")
        iv = base.select(F.col("id").alias("iid"),
                         (F.col("ts") - 20).alias("lo"),
                         (F.col("ts") + 20).alias("hi"))
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=16)
        got = sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())
        assert got == [(1, 1), (2, 2)]

    def test_rejects_ambiguous_and_bad_args(self, spark):
        p, iv = _points(spark), _intervals(spark)
        with pytest.raises(ValueError, match="bucket_width"):
            interval_join(p, iv, "ts", "lo", "hi", bucket_width=0)
        with pytest.raises(ValueError, match="how="):
            interval_join(p, iv, "ts", "lo", "hi", bucket_width=10,
                          how="full")
        with pytest.raises(ValueError, match="ambiguous"):
            interval_join(p, p.selectExpr("pid", "ts lo", "ts hi"),
                          "ts", "lo", "hi", bucket_width=10)


class TestDppJoin:
    def _ctx_and_fact(self, spark, tmp_metastore, tmp_table_dir):
        from parquet_index_spark import QueryContext
        from parquet_index_spark.sources import write_zordered
        orders = spark.read.parquet(
            os.path.join(SF_CORRECT, "orders.parquet"))
        fact = os.path.join(tmp_table_dir, "orders_z")
        write_zordered(orders, fact, ["o_custkey", "o_orderkey"],
                       n_files=16, mode="overwrite")
        return QueryContext(spark), fact, orders

    @pytest.mark.slow  # dpp long tail
    def test_rejects_fact_preserving_joins(self, spark, tmp_metastore,
                                           tmp_table_dir):
        """File pruning from the dim key set is only sound for INNER:
        a LEFT/FULL/ANTI join must still emit pruned files' fact rows,
        so those hows are refused instead of silently dropping rows."""
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, _orders = self._ctx_and_fact(spark, tmp_metastore,
                                                tmp_table_dir)
        dim = spark.createDataFrame([(421, "x")], "c_custkey: long, c: string")
        for how in ("left", "full", "left_anti", "left_semi"):
            with pytest.raises(ValueError, match="inner"):
                dpp_join(ctx, fact, "o_custkey", dim, "c_custkey", how=how)

    @pytest.mark.slow  # dpp long tail: the prune+match and
    # guard-fallback reps stay fast; full grid under -m ""
    def test_null_key_cannot_mask_oversized_dim(self, spark, tmp_metastore,
                                                tmp_table_dir):
        """The over-cap check counts the PRE-null-filter distinct sample:
        with a NULL key among > max_keys distinct values, the old
        post-filter count could land exactly AT the cap and fold an
        INCOMPLETE IN-set, silently dropping join rows. Results must
        equal the plain join no matter which keys the limit sampled."""
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, orders = self._ctx_and_fact(spark, tmp_metastore,
                                               tmp_table_dir)
        keys = [(long, f"c{long}") for long in range(400, 450)]
        dim = spark.createDataFrame(keys + [(None, "cnull")],
                                    "c_custkey: long, c_name: string")
        out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey", max_keys=5)
        expected = (orders.join(dim,
                                orders["o_custkey"] == dim["c_custkey"])
                    .select(*[orders[c] for c in orders.columns], "c_name"))
        assert_same_rows(out, expected)

    def test_prunes_files_and_matches_plain_join(self, spark, tmp_metastore,
                                                 tmp_table_dir):
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, orders = self._ctx_and_fact(spark, tmp_metastore,
                                               tmp_table_dir)
        dim = (spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
               .filter(F.col("c_custkey").isin(421, 900))
               .select("c_custkey", "c_name"))
        out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey")
        expected = (orders.join(F.broadcast(dim),
                                orders["o_custkey"] == dim["c_custkey"])
                    .select(*[orders[c] for c in orders.columns], "c_name"))
        assert_same_rows(out, expected)
        pi = ctx.index.last_prune_info
        assert pi.total_files == 16
        # the Z-layout's file boundaries come from repartitionByRange's
        # SAMPLED split points, so a fixed file-count threshold flakes
        # run to run; derive the bound from the actual layout instead:
        # the fold may never keep more files than those whose true
        # o_custkey [min, max] contains a probe key (blooms only refute
        # further), and it must beat a full scan
        import glob as _glob
        import pyarrow.parquet as _pq
        range_match = 0
        for f in _glob.glob(os.path.join(fact, "*.parquet")):
            md = _pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            ci = sch["o_custkey"]
            hit = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or st.min is None:
                    hit = True
                    break
                if any(st.min <= k <= st.max for k in (421, 900)):
                    hit = True
                    break
            range_match += hit
        assert pi.selected_files <= range_match, (pi, range_match)
        assert pi.selected_files < pi.total_files

    @pytest.mark.slow  # dpp long tail
    def test_empty_dim_yields_zero_files_and_rows(self, spark, tmp_metastore,
                                                  tmp_table_dir):
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, _ = self._ctx_and_fact(spark, tmp_metastore, tmp_table_dir)
        dim = (spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
               .filter("c_custkey < 0").select("c_custkey", "c_name"))
        out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey")
        assert out.count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    @pytest.mark.slow  # dpp long tail
    def test_max_keys_fallback_uses_range(self, spark, tmp_metastore,
                                          tmp_table_dir):
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, orders = self._ctx_and_fact(spark, tmp_metastore,
                                               tmp_table_dir)
        dim = (spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
               .filter("c_custkey BETWEEN 100 AND 140")
               .select("c_custkey", "c_name"))
        out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey", max_keys=5)
        expected = (orders.join(F.broadcast(dim),
                                orders["o_custkey"] == dim["c_custkey"])
                    .select(*[orders[c] for c in orders.columns], "c_name"))
        assert_same_rows(out, expected)
        # range fold [100, 140] still skips files outside the key band
        assert ctx.index.last_prune_info.selected_files < 16

    def test_broadcast_guard_falls_back_to_shuffle(self, spark,
                                                   tmp_metastore,
                                                   tmp_table_dir):
        # dim over the row cap: identical rows via a plain shuffle join
        # (r7 verdict #1 — the operator must degrade, not OOM); file
        # pruning still applies (the IN fold is independent of the join
        # strategy)
        from parquet_index_spark import plans
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, orders = self._ctx_and_fact(spark, tmp_metastore,
                                               tmp_table_dir)
        dim = (spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
               .filter(F.col("c_custkey").isin(421, 900))
               .select("c_custkey", "c_name"))
        # the guard removes the FORCED hint; Catalyst's own size estimate
        # then decides (and would broadcast this tiny test dim anyway) —
        # disable auto-broadcast to observe the fallback strategy
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey",
                           max_broadcast_rows=1)
            expected = (orders.join(dim,
                                    orders["o_custkey"] == dim["c_custkey"])
                        .select(*[orders[c] for c in orders.columns],
                                "c_name"))
            assert_same_rows(out, expected)
            strats = plans.join_strategies(out)
            assert strats["broadcast_hash"] == 0, strats
            assert strats["sort_merge"] + strats["shuffled_hash"] >= 1, strats
            assert ctx.index.last_prune_info.selected_files < 16
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    @pytest.mark.slow  # dpp long tail
    def test_degraded_range_branch_never_broadcasts(self, spark,
                                                    tmp_metastore,
                                                    tmp_table_dir):
        # > max_keys distinct keys: the branch's premise is "dim is big",
        # so it must go straight to the shuffle join without probing
        from parquet_index_spark import plans
        from parquet_index_spark.functions.joins import dpp_join
        ctx, fact, orders = self._ctx_and_fact(spark, tmp_metastore,
                                               tmp_table_dir)
        dim = (spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
               .filter("c_custkey BETWEEN 100 AND 140")
               .select("c_custkey", "c_name"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = dpp_join(ctx, fact, "o_custkey", dim, "c_custkey",
                           max_keys=5)
            strats = plans.join_strategies(out)
            assert strats["broadcast_hash"] == 0, strats
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestOverlapJoin:
    def _ivs(self, spark, name):
        rows = [(0, 0, 100), (1, 90, 210), (2, 1000, 1000), (3, 4000, 6000),
                (4, -200, -100), (5, -150, 50), (6, 100, 100), (7, 5000, 5500)]
        return spark.createDataFrame(
            rows, f"{name}_id long, {name}_lo long, {name}_hi long")

    @pytest.mark.parametrize("width", [
        pytest.param(1, marks=pytest.mark.slow),
        pytest.param(7, marks=pytest.mark.slow),
        100,
        pytest.param(1000, marks=pytest.mark.slow)])
    def test_matches_naive(self, spark, width):
        from parquet_index_spark.operators.rangejoin import overlap_join
        a, b = self._ivs(spark, "a"), self._ivs(spark, "b")
        out = overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                           bucket_width=width).select("a_id", "b_id")
        naive = (a.crossJoin(b)
                 .filter((F.col("a_lo") <= F.col("b_hi"))
                         & (F.col("b_lo") <= F.col("a_hi")))
                 .select("a_id", "b_id"))
        assert_same_rows(out, naive)

    def test_each_pair_exactly_once(self, spark):
        # long intervals share many cells; the anchor-cell rule must admit
        # each overlapping pair exactly once
        from parquet_index_spark.operators.rangejoin import overlap_join
        a = spark.createDataFrame([(1, 0, 10000)], "a_id long, a_lo long, a_hi long")
        b = spark.createDataFrame([(2, 5, 9999)], "b_id long, b_lo long, b_hi long")
        out = overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=10)
        assert out.count() == 1

    def test_keyed(self, spark):
        from parquet_index_spark.operators.rangejoin import overlap_join
        a = spark.createDataFrame([("u", 1, 0, 100), ("v", 2, 0, 100)],
                                  "k string, a_id long, a_lo long, a_hi long")
        b = spark.createDataFrame([("u", 9, 50, 150)],
                                  "k string, b_id long, b_lo long, b_hi long")
        out = overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                           keys=["k"], bucket_width=64)
        assert [(r.a_id, r.b_id) for r in out.select("a_id", "b_id").collect()] \
            == [(1, 9)]

    def test_no_nested_loop(self, spark):
        from parquet_index_spark.operators.rangejoin import overlap_join
        from parquet_index_spark import plans
        a, b = self._ivs(spark, "a"), self._ivs(spark, "b")
        out = overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                           bucket_width=100)
        plans.assert_no_cartesian(out)


class TestRandomizedDifferential:
    """Seeded randomized inputs, verified against a pure-Python oracle
    computed independently in the test (no Spark in the reference path) —
    one Spark run per width instead of per hypothesis example."""

    def _data(self):
        import random
        rng = random.Random(20260813)
        pts = [(i, rng.randint(-500, 1500)) for i in range(300)]
        ivs = []
        for j in range(120):
            lo = rng.randint(-600, 1400)
            ivs.append((j, lo, lo + rng.randint(0, 300)))
        return pts, ivs

    @pytest.mark.parametrize("width", [13, 97, 512])
    def test_interval_join_random(self, spark, width):
        pts, ivs = self._data()
        expected = sorted((pid, iid) for pid, ts in pts
                          for iid, lo, hi in ivs if lo <= ts <= hi)
        p = spark.createDataFrame(pts, "pid long, ts long")
        iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
        out = interval_join(p, iv, "ts", "lo", "hi", bucket_width=width)
        got = sorted((r.pid, r.iid)
                     for r in out.select("pid", "iid").collect())
        assert got == expected

    @pytest.mark.parametrize("width", [13, 97, 512])
    def test_overlap_join_random(self, spark, width):
        from parquet_index_spark.operators.rangejoin import overlap_join
        _, ivs = self._data()
        a_rows = [(i, lo, hi) for i, lo, hi in ivs[:60]]
        b_rows = [(i, lo, hi) for i, lo, hi in ivs[60:]]
        expected = sorted((ai, bi) for ai, alo, ahi in a_rows
                          for bi, blo, bhi in b_rows
                          if alo <= bhi and blo <= ahi)
        a = spark.createDataFrame(a_rows, "a_id long, a_lo long, a_hi long")
        b = spark.createDataFrame(b_rows, "b_id long, b_lo long, b_hi long")
        out = overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                           bucket_width=width)
        got = sorted((r.a_id, r.b_id)
                     for r in out.select("a_id", "b_id").collect())
        assert got == expected


class TestDppBloomTier:
    """Round-9 big-dim pruning tier: past max_keys, a distributed bloom
    over the dim's keys (predicates.InBloom) refutes fact blocks whose
    EXACT filter evidence (dict values / bitmap bitsets) all miss —
    file-level semi-join pushdown where the range tier prunes nothing
    (fully overlapping key ranges)."""

    N_FILES = 8
    KEYS_PER_FILE = 60

    def _interleaved_fact(self, spark, tmp_table_dir, filter_type,
                          name, string_keys=False):
        """8 files whose key RANGES fully overlap but whose key SETS are
        disjoint residue classes mod 8 — the layout where min/max pruning
        is useless and membership evidence is everything."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        path = os.path.join(tmp_table_dir, name)
        os.makedirs(path)
        for i in range(self.N_FILES):
            ks = [100 * j + i for j in range(self.KEYS_PER_FILE)]
            if string_keys:
                arr = pa.array([f"k{v:06d}" for v in ks], type=pa.string())
            else:
                arr = pa.array(ks, type=pa.int64())
            pq.write_table(pa.table({"k": arr, "payload": pa.array(
                [i] * len(ks), type=pa.int64())}),
                os.path.join(path, f"f{i}.parquet"))
        from parquet_index_spark import QueryContext
        ctx = QueryContext(spark)
        spark.conf.set("spark.sql.index.parquet.filter.type", filter_type)
        try:
            ctx.index.create.mode("overwrite").indexBy("k").parquet(path)
        finally:
            spark.conf.unset("spark.sql.index.parquet.filter.type")
        return ctx, path

    def _dim(self, spark, residue=5, n=20, string_keys=False):
        ks = [100 * j + residue for j in range(n)]
        if string_keys:
            rows = [(f"k{v:06d}", f"d{v}") for v in ks]
            return spark.createDataFrame(rows, "dk: string, d_name: string")
        return spark.createDataFrame([(v, f"d{v}") for v in ks],
                                     "dk: long, d_name: string")

    def _plain(self, spark, path, dim):
        plain = spark.read.parquet(path)
        return (plain.join(dim, plain["k"] == dim["dk"])
                .select(plain["k"], plain["payload"], dim["d_name"]))

    @pytest.mark.parametrize("filter_type", ["dict", "bitmap"])
    def test_prunes_unclustered_key_exact_evidence(self, spark,
                                                   tmp_metastore,
                                                   tmp_table_dir,
                                                   filter_type):
        from parquet_index_spark.functions.joins import dpp_join
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, filter_type, f"ifact_{filter_type}")
        dim = self._dim(spark)  # 20 keys, all in residue file 5
        out = dpp_join(ctx, path, "k", dim, "dk", max_keys=5) \
            .select("k", "payload", "d_name")
        assert_same_rows(out, self._plain(spark, path, dim))
        info = ctx.index.last_prune_info
        # range tier alone keeps all 8 files (every range overlaps);
        # the bloom tier must cut to the single residue file
        assert info.total_files == self.N_FILES
        assert info.selected_files == 1, info

    @pytest.mark.slow  # bloom-tier long tail
    def test_prunes_string_keys_via_dict(self, spark, tmp_metastore,
                                         tmp_table_dir):
        from parquet_index_spark.functions.joins import dpp_join
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, "dict", "ifact_str", string_keys=True)
        dim = self._dim(spark, string_keys=True)
        out = dpp_join(ctx, path, "k", dim, "dk", max_keys=5) \
            .select("k", "payload", "d_name")
        assert_same_rows(out, self._plain(spark, path, dim))
        assert ctx.index.last_prune_info.selected_files == 1

    @pytest.mark.slow  # bloom-tier long tail: the exact-
    # evidence bitmap rep stays fast
    def test_distributed_fold_path_identical(self, spark, tmp_metastore,
                                             tmp_table_dir):
        """sparkThreshold=0 forces the Spark-side fold: the pandas-UDF
        dict/bitmap-vs-bloom probe must keep the same file set."""
        from parquet_index_spark.functions.joins import dpp_join
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, "dict", "ifact_spark")
        dim = self._dim(spark)
        spark.conf.set("spark.sql.index.pruning.sparkThreshold", "0")
        try:
            out = dpp_join(ctx, path, "k", dim, "dk", max_keys=5) \
                .select("k", "payload", "d_name")
            assert_same_rows(out, self._plain(spark, path, dim))
            assert ctx.index.last_prune_info.selected_files == 1
        finally:
            spark.conf.unset("spark.sql.index.pruning.sparkThreshold")

    @pytest.mark.slow  # bloom-tier long tail
    def test_type_family_mismatch_skips_bloom_soundly(self, spark,
                                                      tmp_metastore,
                                                      tmp_table_dir):
        """A string dim key against a long fact key leans on Spark's
        implicit cast: the bloom tier must NOT engage (hash families
        differ => false negatives) and results must equal the plain
        join."""
        from parquet_index_spark.functions.joins import dpp_join
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, "dict", "ifact_mismatch")
        ks = [100 * j + 5 for j in range(20)]
        dim = spark.createDataFrame([(str(v), f"d{v}") for v in ks],
                                    "dk: string, d_name: string")
        out = dpp_join(ctx, path, "k", dim, "dk", max_keys=5) \
            .select("k", "payload", "d_name")
        plain = spark.read.parquet(path)
        expected = (plain.join(dim, plain["k"] == dim["dk"])
                    .select(plain["k"], plain["payload"], dim["d_name"]))
        assert_same_rows(out, expected)
        # no bloom => only the (useless) range tier => all files kept
        assert ctx.index.last_prune_info.selected_files == self.N_FILES

    @pytest.mark.slow  # bloom-tier long tail
    def test_bloom_fpp_false_positive_only_keeps_files(self, spark,
                                                       tmp_metastore,
                                                       tmp_table_dir):
        """fpp=0.5 (deliberately terrible) may keep extra files but can
        never lose rows — soundness does not depend on the fpp."""
        from parquet_index_spark.functions.joins import dpp_join
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, "dict", "ifact_fpp")
        dim = self._dim(spark)
        out = dpp_join(ctx, path, "k", dim, "dk", max_keys=5,
                       bloom_fpp=0.5).select("k", "payload", "d_name")
        assert_same_rows(out, self._plain(spark, path, dim))

    def test_explain_pruning_shows_compact_leaf(self, spark,
                                                tmp_metastore,
                                                tmp_table_dir):
        from parquet_index_spark import predicates as P
        from parquet_index_spark.functions.joins import _dim_key_bloom
        ctx, path = self._interleaved_fact(
            spark, tmp_table_dir, "dict", "ifact_explain")
        dim = self._dim(spark)
        blob = _dim_key_bloom(dim, "dk", 20, 0.01)
        t = ctx.index.parquet(path)
        diag = t.explain_pruning(
            P.And((P.Ge("k", 0), P.InBloom("k", blob))))
        leaf = [k for k in diag["leaves"] if k.startswith("in_bloom")]
        assert leaf and f"{len(blob)}B" in leaf[0]
        assert diag["leaves"][leaf[0]] == 1
        assert diag["overall_files"] == 1

    @pytest.mark.slow  # bloom-tier long tail
    def test_big_dim_date_keys_keep_range_fold(self, spark, tmp_metastore,
                                               tmp_table_dir):
        """Round-9 review repro: equal-typed DATE keys must KEEP the
        [min, max] range tier past max_keys (the first family guard
        disabled it — a silent pruning regression); the bloom tier
        rightly stays off (date kinds don't ride the raw-int64 hash
        family)."""
        from parquet_index_spark import QueryContext
        from parquet_index_spark.functions.joins import dpp_join
        path = os.path.join(tmp_table_dir, "datefact")
        base = (spark.range(0, 16000)
                .select(F.date_add(F.lit("2024-01-01").cast("date"),
                                   (F.col("id") % 160).cast("int"))
                        .alias("d"),
                        F.col("id").alias("v")))
        (base.repartitionByRange(8, "d").sortWithinPartitions("d")
         .write.mode("overwrite").parquet(path))
        ctx = QueryContext(spark)
        ctx.index.create.mode("overwrite").indexBy("d").parquet(path)
        dim = (base.select(F.col("d").alias("dd")).distinct()
               .filter(F.col("dd").between("2024-02-10", "2024-02-29"))
               .withColumn("tag", F.lit("x")))
        out = dpp_join(ctx, path, "d", dim, "dd", max_keys=5) \
            .select("d", "v", "tag")
        plain = spark.read.parquet(path)
        expected = (plain.join(dim, plain["d"] == dim["dd"])
                    .select(plain["d"], plain["v"], dim["tag"]))
        assert_same_rows(out, expected)
        info = ctx.index.last_prune_info
        assert info.selected_files < info.total_files, info
