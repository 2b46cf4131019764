"""StartsWith (LIKE 'p%') prefix pruning — beyond-reference capability.

The reference lists StringStartsWith under unsupported filters and keeps
every file (ParquetIndexFilters.scala:128-136). Our fold exploits that
strings with prefix p form the lexicographic interval
[p, prefix_upper_bound(p)): may-match is interval intersection against
string min/max, full-match is interval containment, and string dict
filters refute blocks whose stored distinct set has no prefix member.

Layers covered here:
- truth-table cases for the numpy fold (may-match + full-match bands);
- hypothesis soundness vs an independent row-level LIKE evaluator;
- dict-refinement exactness and bloom passthrough;
- end-to-end differential (indexed vs plain read) with pruning
  effectiveness on a prefix-clustered table.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from parquet_index_spark import QueryContext, col
from parquet_index_spark import predicates as P
from parquet_index_spark import types as ityp
from parquet_index_spark.pruning import evaluate, evaluate_full, prune_files
from parquet_index_spark.statistics import (
    BloomFilter, DictFilter, MembershipFilter,
)

from tests.conftest import assert_same_rows
from tests.test_fold_algebra import make_ctx

S = ityp.STRING
MAXC = chr(0x10FFFF)


def str_block(mn, mx, nulls=0, rows=100):
    return make_ctx([{"file": "f0", "rows": rows,
                      "cols": {"a": (S, mn, mx, nulls)}}])


def fold1(pred, ctx):
    return bool(evaluate(pred, ctx)[0])


def full1(pred, ctx):
    return bool(evaluate_full(pred, ctx)[0])


class TestPrefixUpperBound:
    def test_simple_increment(self):
        assert P.prefix_upper_bound("abc") == "abd"

    def test_carry_over_max_codepoint(self):
        assert P.prefix_upper_bound("a" + MAXC) == "b"
        assert P.prefix_upper_bound("a" + MAXC + MAXC) == "b"

    def test_no_upper_bound(self):
        assert P.prefix_upper_bound("") is None
        assert P.prefix_upper_bound(MAXC * 3) is None

    def test_bound_is_exclusive_supremum(self):
        # every string with the prefix sorts < bound; the bound itself
        # and anything above it does not have the prefix
        for p in ("abc", "z", "a" + MAXC):
            hi = P.prefix_upper_bound(p)
            assert p < hi
            assert (p + MAXC * 4) < hi
            assert not hi.startswith(p)


class TestLikeLowering:
    def test_prefix_pattern(self):
        node = P.like_pattern_to_predicate("c", "PROMO%")
        assert node == P.StartsWith("c", "PROMO")

    def test_exact_pattern_is_equality(self):
        assert P.like_pattern_to_predicate("c", "abc") == P.Eq("c", "abc")

    @pytest.mark.parametrize("pat", ["%abc", "a%c%", "a_c%", "a\\%c%", "_%"])
    def test_general_patterns_stay_unsupported(self, pat):
        assert isinstance(P.like_pattern_to_predicate("c", pat), P.Unsupported)

    def test_sql_parser_lowers_like(self):
        node = P.parse_sql_predicate("s LIKE 'ab%'")
        assert node == P.StartsWith("s", "ab")

    def test_dsl_startswith(self):
        assert P.col("s").startswith("ab") == P.StartsWith("s", "ab")

    def test_not_startswith_scans(self):
        assert isinstance(P.push_not_down(P.Not(P.StartsWith("s", "a"))),
                          P.Unsupported)


class TestMayMatchFold:
    def test_range_overlaps_prefix_interval(self):
        assert fold1(P.StartsWith("a", "m"), str_block("alpha", "zulu"))

    def test_block_entirely_below(self):
        assert not fold1(P.StartsWith("a", "m"), str_block("aa", "cc"))

    def test_block_entirely_above(self):
        assert not fold1(P.StartsWith("a", "m"), str_block("na", "zz"))

    def test_boundary_max_equals_prefix(self):
        # max == 'm' can be exactly the string 'm', which matches
        assert fold1(P.StartsWith("a", "m"), str_block("aa", "m"))

    def test_boundary_min_just_below_upper(self):
        # min = 'mzz' < 'n' = upper bound: still inside the interval
        assert fold1(P.StartsWith("a", "m"), str_block("mzz", "zz"))

    def test_boundary_min_equals_upper(self):
        assert not fold1(P.StartsWith("a", "m"), str_block("n", "zz"))

    def test_empty_prefix_keeps_nonnull_blocks(self):
        assert fold1(P.StartsWith("a", ""), str_block("aa", "zz"))

    def test_all_null_block_pruned(self):
        assert not fold1(P.StartsWith("a", "m"),
                         str_block(None, None, nulls=100))

    def test_statless_block_kept(self):
        assert fold1(P.StartsWith("a", "m"), str_block(None, None, nulls=-1))

    def test_max_codepoint_prefix_lower_bound_only(self):
        p = MAXC  # no upper bound exists
        assert fold1(P.StartsWith("a", p), str_block("aa", MAXC + "x"))
        assert not fold1(P.StartsWith("a", p), str_block("aa", "zz"))

    def test_non_string_column_scans(self):
        ctx = make_ctx([{"file": "f0", "rows": 10,
                         "cols": {"a": (ityp.LONG, 0, 5, 0)}}])
        assert fold1(P.StartsWith("a", "m"), ctx)

    def test_unindexed_column_scans(self):
        assert fold1(P.StartsWith("zz", "m"), str_block("aa", "bb"))


class TestFullMatchFold:
    def test_contained_range_is_full(self):
        assert full1(P.StartsWith("a", "m"), str_block("ma", "mz"))

    def test_exact_prefix_min(self):
        assert full1(P.StartsWith("a", "m"), str_block("m", "m" + MAXC))

    def test_straddling_range_is_partial(self):
        assert not full1(P.StartsWith("a", "m"), str_block("la", "mz"))
        assert not full1(P.StartsWith("a", "m"), str_block("ma", "na"))

    def test_nulls_break_full(self):
        assert not full1(P.StartsWith("a", "m"),
                         str_block("ma", "mz", nulls=1))

    def test_empty_prefix_full_iff_no_nulls(self):
        assert full1(P.StartsWith("a", ""), str_block("aa", "zz"))
        assert not full1(P.StartsWith("a", ""), str_block("aa", "zz", nulls=1))

    def test_full_implies_may(self):
        for mn, mx, nulls in [("ma", "mz", 0), ("la", "mz", 0),
                              ("m", "m" + MAXC, 0), (None, None, 100)]:
            ctx = str_block(mn, mx, nulls)
            pred = P.StartsWith("a", "m")
            assert not (evaluate_full(pred, ctx) & ~evaluate(pred, ctx)).any()


class TestDictRefinement:
    def _ctx(self, values_per_block, ranges, filters):
        specs = [{"file": f"f{i}", "rows": 100,
                  "cols": {"a": (S, mn, mx, 0)}}
                 for i, (mn, mx) in enumerate(ranges)]
        return make_ctx(specs, membership={"a": filters})

    def test_dict_refutes_rangeonly_survivor(self):
        # both blocks' [min, max] straddle the 'mb' prefix interval, but
        # only block 0's stored distinct set has an 'mb...' member
        ranges = [("aa", "zz"), ("aa", "zz")]
        filters = [
            MembershipFilter(DictFilter({"aa", "mbx", "zz"}), None),
            MembershipFilter(DictFilter({"aa", "mc", "zz"}), None),
        ]
        keep = evaluate(P.StartsWith("a", "mb"), self._ctx(None, ranges, filters))
        assert keep.tolist() == [True, False]

    def test_bloom_passes_through(self):
        bf = BloomFilter.create(3)
        for v in ("aa", "mc", "zz"):
            bf.put(v, S)
        ranges = [("aa", "zz")]
        filters = [MembershipFilter(None, bf)]
        # bloom holds no prefix evidence: the range-surviving block keeps
        keep = evaluate(P.StartsWith("a", "mb"), self._ctx(None, ranges, filters))
        assert keep.tolist() == [True]

    def test_mixed_dict_and_bloom_blocks(self):
        bf = BloomFilter.create(1)
        bf.put("qq", S)
        ranges = [("aa", "zz"), ("aa", "zz"), ("aa", "zz")]
        filters = [
            MembershipFilter(DictFilter({"mba"}), None),   # dict: has prefix
            MembershipFilter(DictFilter({"qq"}), None),    # dict: refuted
            MembershipFilter(None, bf),                    # bloom: passes
        ]
        keep = evaluate(P.StartsWith("a", "mb"), self._ctx(None, ranges, filters))
        assert keep.tolist() == [True, False, True]

    def test_empty_prefix_never_consults_dict(self):
        ranges = [("aa", "zz")]
        filters = [MembershipFilter(DictFilter({"qq"}), None)]
        keep = evaluate(P.StartsWith("a", ""), self._ctx(None, ranges, filters))
        assert keep.tolist() == [True]


# --- hypothesis: soundness vs an independent row evaluator -----------------

ALPHA = "abm" + MAXC
str_vals_st = st.lists(
    st.one_of(st.none(), st.text(alphabet=ALPHA, max_size=3)),
    min_size=0, max_size=12)
str_blocks_st = st.lists(str_vals_st, min_size=1, max_size=4)
prefix_st = st.text(alphabet=ALPHA, max_size=3)


def eval_row_prefix(pred, x):
    if isinstance(pred, P.StartsWith):
        return None if x is None else x.startswith(pred.prefix)
    if isinstance(pred, P.Not):
        c = eval_row_prefix(pred.child, x)
        return None if c is None else not c
    raise AssertionError(pred)


def build_str_ctx(blocks, ftype):
    specs, filters = [], []
    for i, vals in enumerate(blocks):
        nn = [v for v in vals if v is not None]
        specs.append({"file": f"f{i}", "rows": len(vals),
                      "cols": {"a": (S, min(nn) if nn else None,
                                     max(nn) if nn else None,
                                     len(vals) - len(nn))}})
        if ftype == "dict":
            filters.append(MembershipFilter(DictFilter(set(nn)), None))
        elif ftype == "bloom":
            bf = BloomFilter.create(max(len(nn), 1))
            for v in nn:
                bf.put(v, S)
            filters.append(MembershipFilter(None, bf))
        else:
            filters.append(None)
    membership = None if ftype == "none" else {"a": filters}
    return make_ctx(specs, membership=membership)


@settings(max_examples=300, deadline=None)
@given(blocks=str_blocks_st, prefix=prefix_st,
       ftype=st.sampled_from(["none", "dict", "bloom"]),
       negate=st.booleans())
def test_prefix_fold_never_drops_a_matching_block(blocks, prefix, ftype,
                                                  negate):
    pred = P.StartsWith("a", prefix)
    if negate:
        pred = P.Not(pred)
    ctx = build_str_ctx(blocks, ftype)
    keep = evaluate(pred, ctx)
    for i, vals in enumerate(blocks):
        if any(eval_row_prefix(pred, x) is True for x in vals):
            assert keep[i], (f"block {i} {vals!r} matches {pred} "
                             f"but was pruned (ftype={ftype})")


@settings(max_examples=300, deadline=None)
@given(blocks=str_blocks_st, prefix=prefix_st,
       ftype=st.sampled_from(["none", "dict", "bloom"]))
def test_prefix_full_match_never_overclaims(blocks, prefix, ftype):
    pred = P.StartsWith("a", prefix)
    ctx = build_str_ctx(blocks, ftype)
    full = evaluate_full(pred, ctx)
    for i, vals in enumerate(blocks):
        if full[i]:
            bad = [x for x in vals if eval_row_prefix(pred, x) is not True]
            assert not bad, (f"block {i} {vals!r} marked full for {pred} "
                             f"but rows {bad!r} fail it")


@settings(max_examples=200, deadline=None)
@given(blocks=str_blocks_st, prefix=prefix_st)
def test_dict_prefix_refinement_is_exact(blocks, prefix):
    """With exact dict filters, a block keeps iff some value matches —
    the prefix probe is complete, not just sound (non-empty prefixes;
    the fold never consults membership for '')."""
    if not prefix:
        return
    ctx = build_str_ctx(blocks, "dict")
    keep = evaluate(P.StartsWith("a", prefix), ctx)
    for i, vals in enumerate(blocks):
        expected = any(x is not None and x.startswith(prefix) for x in vals)
        assert bool(keep[i]) == expected, (
            f"block {i} {vals!r} prefix {prefix!r}: keep={keep[i]}")


# --- end-to-end: differential + pruning effectiveness ----------------------

@pytest.fixture()
def ctx(spark, tmp_metastore):
    return QueryContext(spark)


@pytest.fixture()
def typed_table(spark, tmp_table_dir):
    """part-like table range-clustered by a categorical string column so
    prefix families land in few files (the 100-TB layout this serves:
    cluster or Z-order by the column you prefix-filter on)."""
    path = os.path.join(tmp_table_dir, "typed")
    (spark.range(0, 20_000)
     .selectExpr(
         "id",
         "concat(element_at(array('ECONOMY','LARGE','MEDIUM','PROMO','SMALL','STANDARD'), "
         "cast(id % 6 AS int) + 1), ' ', "
         "element_at(array('ANODIZED','BRUSHED','BURNISHED','PLATED','POLISHED'), "
         "cast(id % 5 AS int) + 1)) AS p_type")
     # 24 range partitions over 6 p_type families: the 5 family
     # boundaries can straddle at most 10 files, so every family keeps
     # interior all-one-family files REGARDLESS of the range sampler's
     # boundary draw (the whole-file-drop DELETE test needs that
     # deterministically)
     .repartitionByRange(24, "p_type", "id")
     .write.parquet(path))
    return path


class TestPrefixEndToEnd:
    def test_differential_and_prunes(self, spark, ctx, typed_table):
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        indexed = t.filter("p_type LIKE 'PROMO%'")
        plain = spark.read.parquet(typed_table).filter("p_type LIKE 'PROMO%'")
        assert_same_rows(indexed, plain)
        info = ctx.index.last_prune_info
        assert 0 < info.selected_files < info.total_files, info

    def test_absent_prefix_prunes_everything(self, spark, ctx, typed_table):
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        assert t.filter("p_type LIKE 'ZZTOP%'").count() == 0
        assert ctx.index.last_prune_info.selected_files == 0

    def test_dsl_startswith_matches_sql_like(self, spark, ctx, typed_table):
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        via_dsl = t.filter(col("p_type").startswith("MEDIUM"))
        via_sql = spark.read.parquet(typed_table) \
            .filter("p_type LIKE 'MEDIUM%'")
        assert_same_rows(via_dsl, via_sql)

    def test_interior_wildcard_full_scans_but_correct(self, spark, ctx,
                                                      typed_table):
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        indexed = t.filter("p_type LIKE '%BRUSH%'")
        plain = spark.read.parquet(typed_table).filter("p_type LIKE '%BRUSH%'")
        assert_same_rows(indexed, plain)
        info = ctx.index.last_prune_info
        assert info.selected_files == info.total_files

    def test_prefix_delete_drops_whole_files(self, spark, ctx, typed_table):
        """DML inherits the prefix fold's FULL band: on a p_type-clustered
        table, DELETE WHERE p_type LIKE 'PROMO%' drops the all-PROMO
        interior files from metadata with zero bytes read; only boundary
        files rewrite. Result must equal the plain-SQL delete."""
        from parquet_index_spark.sources import delete_where
        expect = (spark.read.parquet(typed_table)
                  .filter("NOT (p_type LIKE 'PROMO%')").count())
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        info = delete_where(ctx, typed_table, "p_type LIKE 'PROMO%'")
        assert info["files_dropped_whole"] >= 1, info
        assert info["files_rewritten"] < info["files_total"], info
        after = spark.read.parquet(typed_table)
        assert after.count() == expect
        assert after.filter("p_type LIKE 'PROMO%'").count() == 0

    def test_count_where_uses_full_band(self, spark, ctx, typed_table):
        """Metadata-accelerated count with a prefix predicate: the clusters
        make whole files all-PROMO, so part of the count comes from footer
        row counts with no data IO."""
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        expect = spark.read.parquet(typed_table) \
            .filter("p_type LIKE 'PROMO%'").count()
        assert t.count_where("p_type LIKE 'PROMO%'") == expect


class TestSurrogateBoundary:
    def test_upper_bound_skips_surrogate_block(self):
        hi = P.prefix_upper_bound("x" + chr(0xD7FF))
        assert hi == "x" + chr(0xE000)
        # still a valid exclusive supremum of the prefixed interval
        assert ("x" + chr(0xD7FF) + MAXC * 3) < hi
        assert not hi.startswith("x" + chr(0xD7FF))

    def test_surrogate_adjacent_prefix_folds_in_spark(self, spark, ctx,
                                                      typed_table):
        """The distributed compile must accept the bound (F.lit rejects
        lone surrogates); the query still answers correctly."""
        ctx.index.create.indexBy("id", "p_type").parquet(typed_table)
        t = ctx.index.parquet(typed_table)
        pred = col("p_type").startswith("x" + chr(0xD7FF))
        assert t.filter(pred).count() == 0
