"""Property-based soundness of the pruning fold (hypothesis).

The contract behind every pruned scan: the fold may only ever
OVER-approximate — a block containing at least one row matching the
predicate MUST survive `evaluate` (ParquetIndexFilters.scala analog:
"filters must not produce false negatives"). Exactness is not required
(bloom false positives and range approximations are allowed); soundness
is what makes skipping files correct.

Reference rows are judged with SQL three-valued semantics implemented
independently here (eval_row), so a fold bug and a semantics bug cannot
cancel out.
"""

from hypothesis import given, settings, strategies as st

from parquet_index_spark import predicates as P
from parquet_index_spark import types as ityp
from parquet_index_spark.statistics import (
    BitmapFilter, BloomFilter, DictFilter, MembershipFilter,
)

from tests.test_fold_algebra import make_ctx
from parquet_index_spark.pruning import evaluate, prune_files

L = ityp.LONG


# --- row-level SQL three-valued evaluation (the independent oracle) -------

def eval_row(pred, x):
    """True / False / None(unknown) for column value x (None = SQL NULL)."""
    if isinstance(pred, P.Eq):
        return None if x is None else x == pred.value
    if isinstance(pred, P.NullSafeEq):
        # null-safe equality never yields UNKNOWN
        return False if x is None else x == pred.value
    if isinstance(pred, P.Ne):
        return None if x is None else x != pred.value
    if isinstance(pred, P.In):
        return None if x is None else x in pred.values
    if isinstance(pred, P.Gt):
        return None if x is None else x > pred.value
    if isinstance(pred, P.Ge):
        return None if x is None else x >= pred.value
    if isinstance(pred, P.Lt):
        return None if x is None else x < pred.value
    if isinstance(pred, P.Le):
        return None if x is None else x <= pred.value
    if isinstance(pred, P.IsNull):
        return x is None
    if isinstance(pred, P.IsNotNull):
        return x is not None
    if isinstance(pred, P.Not):
        c = eval_row(pred.child, x)
        return None if c is None else not c
    if isinstance(pred, P.And):
        cs = [eval_row(c, x) for c in pred.children]
        if any(c is False for c in cs):
            return False
        return None if any(c is None for c in cs) else True
    if isinstance(pred, P.Or):
        cs = [eval_row(c, x) for c in pred.children]
        if any(c is True for c in cs):
            return True
        return None if any(c is None for c in cs) else False
    raise AssertionError(f"unhandled predicate {pred!r}")


# --- strategies -----------------------------------------------------------

values_st = st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                     min_size=0, max_size=25)
blocks_st = st.lists(values_st, min_size=1, max_size=5)
lit_st = st.integers(-60, 60)

leaf_st = st.one_of(
    st.builds(P.Eq, st.just("a"), lit_st),
    st.builds(P.Ne, st.just("a"), lit_st),
    st.builds(P.Gt, st.just("a"), lit_st),
    st.builds(P.Ge, st.just("a"), lit_st),
    st.builds(P.Lt, st.just("a"), lit_st),
    st.builds(P.Le, st.just("a"), lit_st),
    st.builds(P.In, st.just("a"),
              st.lists(lit_st, min_size=1, max_size=4).map(tuple)),
    st.builds(P.IsNull, st.just("a")),
    st.builds(P.IsNotNull, st.just("a")),
    st.builds(P.NullSafeEq, st.just("a"), lit_st),
)

pred_st = st.recursive(
    leaf_st,
    lambda inner: st.one_of(
        st.builds(lambda l, r: P.And((l, r)), inner, inner),
        st.builds(lambda l, r: P.Or((l, r)), inner, inner),
        st.builds(P.Not, inner),
    ),
    max_leaves=8)

ftype_st = st.sampled_from(["none", "dict", "bloom", "bitmap"])


def build_ctx(blocks, ftype):
    specs, filters = [], []
    for vals in blocks:
        nn = [v for v in vals if v is not None]
        nulls = len(vals) - len(nn)
        mn = min(nn) if nn else None
        mx = max(nn) if nn else None
        # rows must be truthful: the collector's nulls count is exact, and
        # the fold's statless-keep rule (no min/max AND nulls != rows =>
        # keep) relies on it. An empty block is rows=0, not a phantom row.
        specs.append({"file": f"f{len(specs)}", "rows": len(vals),
                      "cols": {"a": (L, mn, mx, nulls)}})
        if ftype == "dict":
            filters.append(MembershipFilter(DictFilter(set(nn)), None))
        elif ftype == "bloom":
            bf = BloomFilter.create(max(len(nn), 1))
            for v in nn:
                bf.put(v, L)
            filters.append(MembershipFilter(None, bf))
        elif ftype == "bitmap":
            filters.append(MembershipFilter(
                None, None, BitmapFilter.from_values(nn)))
        else:
            filters.append(None)
    membership = None if ftype == "none" else {"a": filters}
    return make_ctx(specs, membership=membership)


# --- properties -----------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(blocks=blocks_st, pred=pred_st, ftype=ftype_st)
def test_fold_never_drops_a_matching_block(blocks, pred, ftype):
    ctx = build_ctx(blocks, ftype)
    keep = evaluate(pred, ctx)
    for i, vals in enumerate(blocks):
        if any(eval_row(pred, x) is True for x in vals):
            assert keep[i], (
                f"block {i} {vals} matches {pred} but was pruned "
                f"(ftype={ftype})")


@settings(max_examples=150, deadline=None)
@given(blocks=blocks_st, pred=pred_st, ftype=ftype_st)
def test_prune_files_keeps_every_matching_file(blocks, pred, ftype):
    ctx = build_ctx(blocks, ftype)
    kept = set(prune_files(pred, ctx))
    for i, vals in enumerate(blocks):
        if any(eval_row(pred, x) is True for x in vals):
            assert f"f{i}" in kept


@settings(max_examples=150, deadline=None)
@given(blocks=blocks_st, vals=st.lists(lit_st, min_size=1, max_size=3))
def test_exact_filters_are_also_complete_for_membership(blocks, vals):
    """dict and bitmap are EXACT for Eq/In: a block with no matching row
    and no nulls interfering must be pruned when min/max can't save it —
    specifically, an In() whose values all miss the block's value set
    never keeps a dict/bitmap block."""
    pred = P.In("a", tuple(vals))
    for ftype in ("dict", "bitmap"):
        ctx = build_ctx(blocks, ftype)
        keep = evaluate(pred, ctx)
        for i, bvals in enumerate(blocks):
            present = {v for v in bvals if v is not None}
            if not (present & set(vals)):
                assert not keep[i], (
                    f"{ftype} kept block {i} {bvals} for In{vals} "
                    "despite exact membership miss")


# --- full-match fold (metadata-accelerated count) -------------------------

from parquet_index_spark.pruning import evaluate_full  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(blocks=blocks_st, pred=pred_st, ftype=ftype_st)
def test_full_match_fold_never_overclaims(blocks, pred, ftype):
    """The dual soundness contract behind count_where: a block the fold
    marks FULL-match must have EVERY row evaluate strictly True under
    independent SQL three-valued semantics — a single False or NULL row
    would corrupt the metadata-only count."""
    ctx = build_ctx(blocks, ftype)
    full = evaluate_full(pred, ctx)
    for i, vals in enumerate(blocks):
        if full[i]:
            bad = [x for x in vals if eval_row(pred, x) is not True]
            assert not bad, (
                f"block {i} {vals} marked full-match for {pred} but rows "
                f"{bad} do not satisfy it (ftype={ftype})")


@settings(max_examples=200, deadline=None)
@given(blocks=blocks_st, pred=pred_st, ftype=ftype_st)
def test_full_match_implies_may_match(blocks, pred, ftype):
    """Band consistency: FULL ⊆ MAY on non-empty blocks — count_where's
    three-band decomposition (full / boundary / no) partitions blocks
    only if the two folds agree on the inclusion. Empty blocks are
    excluded: they are vacuously FULL (every row of zero rows matches)
    but never MAY-match, and contribute zero to any count either way."""
    ctx = build_ctx(blocks, ftype)
    may = evaluate(pred, ctx)
    full = evaluate_full(pred, ctx)
    assert not (full & ~may & (ctx.rows > 0)).any()
