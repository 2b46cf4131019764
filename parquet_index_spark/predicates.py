"""Predicate AST, DSL (``col``), and SQL parser.

The reference receives ``org.apache.spark.sql.sources.Filter`` trees from
Catalyst and folds them against statistics (ParquetIndexFilters.scala:52-137).
PySpark cannot intercept Catalyst planning without JVM code, so we accept the
predicate *before* planning in one of three forms:

1. our DSL:       ``t.filter((col("a") == 5) & (col("d") > "1995-01-01"))``
2. a SQL string:  ``t.filter("a = 5 AND d > DATE '1995-01-01'")``
3. a pyspark Column — opaque: no pruning, full (still correct) scan.

All three re-apply the *complete* predicate on the pruned DataFrame, so the
index fold only needs to be sound (never prune a file that could contain a
matching row) — same contract as the reference's residual FilterExec
(IndexSourceStrategy.scala:111-112).

Divergence from the reference, deliberate: the reference folds
``Not(Trivial(true)) => Trivial(false)`` (ParquetIndexFilters.scala:118-123),
which is unsound for approximate statistics (``NOT (a = 5)`` would prune a
block whose min<=5<=max even though it holds other values). We instead push
``NOT`` to the leaves with exact complement rules (De Morgan + SQL
three-valued-logic-aware negation of each comparison).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

class Predicate:
    """Base class for predicate AST nodes."""

    def __and__(self, other: "Predicate") -> "Predicate":
        return And((self, _as_pred(other)))

    def __or__(self, other: "Predicate") -> "Predicate":
        return Or((self, _as_pred(other)))

    def __invert__(self) -> "Predicate":
        return Not(self)

    # no __bool__: catching `and`/`or` misuse
    def __bool__(self):
        raise TypeError(
            "Cannot convert Predicate to bool; use & | ~ instead of and/or/not")

    def to_spark(self) -> SparkColumn:
        raise NotImplementedError


def _as_pred(p: Any) -> "Predicate":
    if isinstance(p, Predicate):
        return p
    raise TypeError(f"expected Predicate, got {type(p)}")


def _lit_to_spark(v: Any) -> SparkColumn:
    return F.lit(v)


@dataclass(frozen=True)
class Eq(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) == _lit_to_spark(self.value)


@dataclass(frozen=True)
class Ne(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) != _lit_to_spark(self.value)


@dataclass(frozen=True)
class In(Predicate):
    column: str
    values: tuple

    def to_spark(self) -> SparkColumn:
        return F.col(self.column).isin(list(self.values))


@dataclass(frozen=True)
class IsNull(Predicate):
    column: str

    def to_spark(self) -> SparkColumn:
        return F.col(self.column).isNull()


@dataclass(frozen=True)
class IsNotNull(Predicate):
    column: str

    def to_spark(self) -> SparkColumn:
        return F.col(self.column).isNotNull()


@dataclass(frozen=True)
class Gt(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) > _lit_to_spark(self.value)


@dataclass(frozen=True)
class Ge(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) >= _lit_to_spark(self.value)


@dataclass(frozen=True)
class Lt(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) < _lit_to_spark(self.value)


@dataclass(frozen=True)
class Le(Predicate):
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column) <= _lit_to_spark(self.value)


@dataclass(frozen=True)
class And(Predicate):
    children: tuple

    def to_spark(self) -> SparkColumn:
        out = self.children[0].to_spark()
        for c in self.children[1:]:
            out = out & c.to_spark()
        return out


@dataclass(frozen=True)
class Or(Predicate):
    children: tuple

    def to_spark(self) -> SparkColumn:
        out = self.children[0].to_spark()
        for c in self.children[1:]:
            out = out | c.to_spark()
        return out


@dataclass(frozen=True)
class Not(Predicate):
    child: Predicate

    def to_spark(self) -> SparkColumn:
        return ~self.child.to_spark()


@dataclass(frozen=True)
class Trivial(Predicate):
    """Constant-result predicate (reference: sources/filters.scala:23-33)."""
    value: bool

    def to_spark(self) -> SparkColumn:
        return F.lit(self.value)


#: stats-row column-name suffixes for a term index over a text column —
#: encoding the pseudo-column (and its vocabulary version) in the name
#: lets create/refresh/load carry it with zero extra plumbing.
#: "#terms": per-block distinct single tokens (round-5 initial format).
#: "#terms2": tokens PLUS adjacent bigrams ("a b") — phrase queries can
#: prune on pairs; single-token probes work against either.
TERMS_SUFFIX = "#terms"
TERMS2_SUFFIX = "#terms2"


@dataclass(frozen=True)
class TermMatch(Predicate):
    """Whitespace-token membership: row matches when ``term`` is one of
    the tokens of ``column`` (full-text point lookup). Foldable against a
    TERM INDEX (`termIndexBy`): per-block bloom/dict filters over each
    block's distinct tokens prune files that cannot contain the term;
    blocks without a term filter soundly may-match. The residual re-filter
    is the exact array_contains over the same whitespace tokenization.

    ``fold_only=True`` (INTERNAL — contains_phrase only) makes the
    residual trivially TRUE while the fold still prunes: used for
    adjacent-bigram probes whose row-level truth is enforced by the
    phrase's exact adjacency residual instead. Standalone fold_only
    probes would be unsound (pruning stricter than the residual) — the
    phrase composition is what restores the superset contract."""
    column: str
    term: str
    fold_only: bool = False

    def to_spark(self) -> SparkColumn:
        if self.fold_only:
            return F.lit(True)
        return F.array_contains(
            F.split(F.trim(F.col(self.column)), r"\s+"), self.term)


@dataclass(frozen=True)
class NullSafeEq(Predicate):
    """``a <=> v`` for a non-null literal v (``a <=> NULL`` parses
    straight to IsNull). Beyond-reference: EqualNullSafe is on the
    reference's unsupported list (ParquetIndexFilters.scala:128-136,
    keep every file), but it folds exactly: with v non-null it keeps the
    same rows as ``a = v``, so push_not_down lowers it to Eq for the
    fold, and its exact negation is ``a IS NULL OR a != v`` — both
    shapes the fold already handles. to_spark stays the true null-safe
    operator so the residual is exact under any composition."""
    column: str
    value: Any

    def to_spark(self) -> SparkColumn:
        return F.col(self.column).eqNullSafe(_lit_to_spark(self.value))


@dataclass(frozen=True)
class InBloom(Predicate):
    """Metadata-only semi-join probe: "``column``'s value is (probably)
    in the key set summarized by ``blob``" — a serialized
    :class:`statistics.BloomFilter` over the OTHER side's join keys.

    Beyond-reference: built by ``functions.joins.dpp_join`` when the dim
    side exceeds ``max_keys`` (too many keys to enumerate into an
    ``In``): the fold refutes a fact block when its DICT filter's exact
    stored values all miss the dim bloom (no false negatives on the
    probe side, exact values on the block side => sound); blocks
    carrying only min/max, bloom, or bitmap evidence soundly scan. The
    row-level residual is TRUE — the predicate is intentionally
    approximate and the JOIN itself enforces exact row semantics, so it
    must only ever appear conjoined with a join (never user-facing,
    never negated: a NOT over an approximate membership can neither
    refute blocks nor express a sound residual).
    """
    column: str
    blob: bytes

    def to_spark(self) -> SparkColumn:
        return F.lit(True)

    def __invert__(self) -> "Predicate":
        raise TypeError(
            "InBloom is a metadata-only approximate probe and cannot be "
            "negated (NOT over it has no sound fold or residual)")

    def __str__(self) -> str:  # keep the blob out of diagnostics
        return f"in_bloom({self.column}, {len(self.blob)}B)"

    __repr__ = __str__


@dataclass(frozen=True)
class StartsWith(Predicate):
    """Literal-prefix match — ``col LIKE 'p%'`` / ``col.startswith(p)``.

    Beyond-reference: the reference folds StringStartsWith to "keep the
    file" (ParquetIndexFilters.scala:128-136 lists it under unsupported
    filters => Trivial(true)); string min/max order statistics can do
    better. All strings with prefix p form the interval
    ``[p, prefix_upper_bound(p))`` in lexicographic order, so a block may
    match iff ``max >= p AND min < prefix_upper_bound(p)`` — sound even
    against parquet's truncated footer bounds, because truncation only
    widens [min, max]. Dict filter statistics refine further (a stored
    distinct-value set with no member starting with p refutes the block);
    bloom/bitmap filters are hash-based and carry no prefix evidence.
    """
    column: str
    prefix: str

    def to_spark(self) -> SparkColumn:
        return F.col(self.column).startswith(self.prefix)


def prefix_upper_bound(prefix: str) -> Optional[str]:
    """Smallest string greater than EVERY string with this prefix, or
    None when no such string exists (all code points at the maximum —
    then only the lower bound applies; "" also has no upper bound).

    Increment the rightmost incrementable code point and truncate:
    exactly the exclusive upper end of the prefix interval under
    code-point order (== UTF-8 binary order, which Spark strings use).
    An increment landing in the surrogate block (U+D800-U+DFFF — not
    encodable, F.lit would reject it) skips to U+E000: a slightly looser
    but still-valid upper bound (every prefixed string's code point at
    that position is <= U+D7FF < U+E000).
    """
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if 0xD800 <= nxt <= 0xDFFF:
                nxt = 0xE000
            return prefix[:i] + chr(nxt)
    return None


def like_pattern_to_predicate(name: str, pattern: str) -> Predicate:
    """SQL LIKE -> foldable predicate where the pattern allows.

    - no wildcards at all => exact equality (LIKE 'abc' is ``= 'abc'``);
    - literal prefix + single trailing ``%`` => StartsWith;
    - anything else (``_``, interior ``%``, escapes) => Unsupported
      (sound full scan with the exact LIKE as residual).
    """
    if "\\" not in pattern and "_" not in pattern:
        if "%" not in pattern:
            return Eq(name, pattern)
        if pattern.endswith("%") and "%" not in pattern[:-1]:
            return StartsWith(name, pattern[:-1])
    return Unsupported(lambda: F.col(name).like(pattern), f"like({name})")


@dataclass(frozen=True)
class TermPrefixMatch(Predicate):
    """Token-PREFIX membership: row matches when SOME whitespace token
    of ``column`` starts with ``prefix`` (wildcard search /
    autocomplete over a 100 TB corpus). Foldable against a TERM INDEX
    whose blocks carry DICT filters: the stored distinct-token set
    refutes blocks with no token starting with the prefix (statistics.
    ColumnMembership.refine_prefix); bloom-filtered blocks hold no
    prefix evidence and soundly scan. The residual is the exact
    per-token startswith over the same whitespace tokenization.
    ``prefix`` must be non-empty and whitespace-free (a #terms2 dict
    also stores bigrams, whose first token is always stored singly too,
    so bigram entries can only ADD may-matches — sound)."""
    column: str
    prefix: str

    def to_spark(self) -> SparkColumn:
        p = self.prefix
        return F.exists(F.split(F.trim(F.col(self.column)), r"\s+"),
                        lambda t: t.startswith(p))


@dataclass(frozen=True)
class Unsupported(Predicate):
    """A predicate the index cannot fold (LIKE, endswith, UDF, ...).

    Folds to "scan the file" (reference: ParquetIndexFilters.scala:128-136);
    still convertible to a Spark Column for residual evaluation.
    """
    builder: Callable[[], SparkColumn] = field(compare=False)
    description: str = ""

    def to_spark(self) -> SparkColumn:
        return self.builder()


# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------

class ColumnRef:
    """``col("name")`` — builds Predicate nodes with python operators."""

    def __init__(self, name: str):
        self._name = name

    def __eq__(self, other: Any) -> Predicate:  # type: ignore[override]
        if other is None:
            return IsNull(self._name)
        return Eq(self._name, other)

    def __ne__(self, other: Any) -> Predicate:  # type: ignore[override]
        if other is None:
            return IsNotNull(self._name)
        return Ne(self._name, other)

    def __gt__(self, other: Any) -> Predicate:
        return Gt(self._name, other)

    def __ge__(self, other: Any) -> Predicate:
        return Ge(self._name, other)

    def __lt__(self, other: Any) -> Predicate:
        return Lt(self._name, other)

    def __le__(self, other: Any) -> Predicate:
        return Le(self._name, other)

    def eqNullSafe(self, other: Any) -> Predicate:
        if other is None:
            return IsNull(self._name)
        return NullSafeEq(self._name, other)

    def isin(self, *values: Any) -> Predicate:
        if len(values) == 1 and isinstance(values[0], (list, tuple, set)):
            values = tuple(values[0])
        return In(self._name, tuple(values))

    def isNull(self) -> Predicate:
        return IsNull(self._name)

    def isNotNull(self) -> Predicate:
        return IsNotNull(self._name)

    def between(self, low: Any, high: Any) -> Predicate:
        return And((Ge(self._name, low), Le(self._name, high)))

    def startswith(self, s: str) -> Predicate:
        return StartsWith(self._name, s)

    def endswith(self, s: str) -> Predicate:
        name = self._name
        return Unsupported(lambda: F.col(name).endswith(s), f"endswith({name})")

    def contains(self, s: str) -> Predicate:
        name = self._name
        return Unsupported(lambda: F.col(name).contains(s), f"contains({name})")

    def like(self, pattern: str) -> Predicate:
        return like_pattern_to_predicate(self._name, pattern)


def col(name: str) -> ColumnRef:
    return ColumnRef(name)


def lit(value: Any) -> Any:
    """Identity helper for symmetry with pyspark; literals are plain values."""
    return value


# ---------------------------------------------------------------------------
# NOT push-down (sound negation)
# ---------------------------------------------------------------------------

def push_not_down(p: Predicate, negate: bool = False) -> Predicate:
    """Rewrite the tree so no ``Not`` nodes remain above foldable leaves.

    Negation uses SQL filter semantics: a filter keeps rows where the
    predicate is TRUE, so ``NOT (a > v)`` keeps exactly the rows with
    non-null ``a <= v`` — i.e. ``Le``.
    """
    if isinstance(p, Not):
        return push_not_down(p.child, not negate)
    if isinstance(p, NullSafeEq) and not negate:
        # fold-equivalent lowering (the filter keeps the same rows as
        # Eq when v is non-null); the residual still uses the exact
        # to_spark of the ORIGINAL tree, so this only shapes the fold
        return Eq(p.column, p.value)
    if isinstance(p, And):
        kids = tuple(push_not_down(c, negate) for c in p.children)
        return Or(kids) if negate else And(kids)
    if isinstance(p, Or):
        kids = tuple(push_not_down(c, negate) for c in p.children)
        return And(kids) if negate else Or(kids)
    if not negate:
        return p
    if isinstance(p, Eq):
        return Ne(p.column, p.value)
    if isinstance(p, Ne):
        return Eq(p.column, p.value)
    if isinstance(p, In):
        return And(tuple(Ne(p.column, v) for v in p.values)) if p.values else Trivial(True)
    if isinstance(p, IsNull):
        return IsNotNull(p.column)
    if isinstance(p, IsNotNull):
        return IsNull(p.column)
    if isinstance(p, Gt):
        return Le(p.column, p.value)
    if isinstance(p, Ge):
        return Lt(p.column, p.value)
    if isinstance(p, Lt):
        return Ge(p.column, p.value)
    if isinstance(p, Le):
        return Gt(p.column, p.value)
    if isinstance(p, Trivial):
        return Trivial(not p.value)
    if isinstance(p, Unsupported):
        # NOT over an unfoldable leaf: conservatively scan
        return Unsupported(lambda: ~p.builder(), f"not({p.description})")
    if isinstance(p, TermMatch):
        # absence of a term is not provable from membership filters:
        # conservatively scan (residual keeps the exact negation)
        return Unsupported(lambda: ~p.to_spark(),
                           f"not(term_match({p.column}, {p.term!r}))")
    if isinstance(p, StartsWith):
        # NOT (prefix match): a block proven all-prefix by min/max could
        # be pruned, but the may-match fold has no full-match channel —
        # conservatively scan (residual keeps the exact negation)
        return Unsupported(lambda: ~p.to_spark(),
                           f"not(startswith({p.column}, {p.prefix!r}))")
    if isinstance(p, NullSafeEq):
        # exact 3VL complement: NOT (a <=> v) keeps nulls AND mismatches
        return Or((IsNull(p.column), Ne(p.column, p.value)))
    if isinstance(p, TermPrefixMatch):
        # absence of a token prefix is not provable from membership
        # filters: conservatively scan (residual keeps exact negation)
        return Unsupported(lambda: ~p.to_spark(),
                           f"not(term_prefix({p.column}, {p.prefix!r}))")
    raise TypeError(f"cannot negate {p!r}")


def referenced_columns(p: Predicate) -> set:
    if isinstance(p, (Eq, Ne, In, IsNull, IsNotNull, Gt, Ge, Lt, Le,
                      StartsWith, NullSafeEq, InBloom)):
        return {p.column}
    if isinstance(p, (TermMatch, TermPrefixMatch)):
        # folds against whichever term-index generation the table carries
        return {p.column + TERMS_SUFFIX, p.column + TERMS2_SUFFIX}
    if isinstance(p, (And, Or)):
        out: set = set()
        for c in p.children:
            out |= referenced_columns(c)
        return out
    if isinstance(p, Not):
        return referenced_columns(p.child)
    return set()


# ---------------------------------------------------------------------------
# SQL predicate parser (restricted WHERE-clause grammar)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<ts>(?i:TIMESTAMP)\s*'[^']*')
    | (?P<date>(?i:DATE)\s*'[^']*')
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
    | (?P<qident>`(?:[^`]|``)+`)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op><=>|<=|>=|<>|!=|=|<|>|\(|\)|,)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN", "LIKE",
             "TRUE", "FALSE", "DATE", "TIMESTAMP", "CAST", "AS"}

# Column-side casts that are safe to fold through: numeric widening only.
# Catalyst inserts these for type coercion (both sides promoted to the wider
# type), so comparing the column's native stats against the literal is
# value-preserving. Narrowing or cross-family casts (string->int,
# timestamp->date, ...) change comparison semantics and raise instead.
_SAFE_COLUMN_CASTS = {"BIGINT", "LONG", "DOUBLE", "FLOAT", "DECIMAL"}


class SqlParseError(ValueError):
    pass


_INT_TYPES = {"TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT", "LONG"}
_FLOAT_TYPES = {"DOUBLE", "FLOAT", "REAL"}


def _cast_literal(v: Any, ty: str, sql: str) -> Any:
    """Fold CAST(<literal> AS <type>) conservatively; raise when the cast
    could change comparison semantics (then the caller falls back to an
    unpruned scan, which is always sound)."""
    if v is None:
        return None
    if ty in _INT_TYPES:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise SqlParseError(f"cannot fold CAST to {ty} in {sql!r}")
        if isinstance(v, float) and v != int(v):
            raise SqlParseError(f"lossy CAST({v} AS {ty}) in {sql!r}")
        return int(v)
    if ty in _FLOAT_TYPES or ty == "DECIMAL":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise SqlParseError(f"cannot fold CAST to {ty} in {sql!r}")
        return v
    if ty in ("STRING", "VARCHAR", "CHAR"):
        if isinstance(v, str):
            return v
        raise SqlParseError(f"cannot fold CAST to {ty} in {sql!r}")
    if ty == "DATE":
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return v
        if isinstance(v, str):
            return _dt.date.fromisoformat(v)
        raise SqlParseError(f"cannot fold CAST to DATE in {sql!r}")
    if ty == "TIMESTAMP":
        if isinstance(v, _dt.datetime):
            return v
        if isinstance(v, str):
            return _dt.datetime.fromisoformat(v)
        raise SqlParseError(f"cannot fold CAST to TIMESTAMP in {sql!r}")
    raise SqlParseError(f"unsupported cast type {ty} in {sql!r}")


def _tokenize(sql: str) -> list:
    tokens = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise SqlParseError(f"cannot tokenize at: {sql[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup == "ident":
            text = m.group("ident")
            if text.upper() in _KEYWORDS:
                tokens.append(("kw", text.upper()))
            else:
                tokens.append(("ident", text))
        elif m.lastgroup == "qident":
            # backquoted identifier (Spark quoting) — never a keyword;
            # doubled backtick is Spark's escape for a literal ` in the name
            tokens.append(("ident",
                           m.group("qident")[1:-1].replace("``", "`")))
        elif m.lastgroup == "str":
            raw = m.group("str")[1:-1].replace("''", "'")
            tokens.append(("str", raw))
        elif m.lastgroup == "num":
            raw = m.group("num")
            tokens.append(("num", float(raw) if ("." in raw or "e" in raw or "E" in raw) else int(raw)))
        elif m.lastgroup == "date":
            raw = m.group("date")
            inner = raw[raw.index("'") + 1:-1]
            tokens.append(("date", _dt.date.fromisoformat(inner)))
        elif m.lastgroup == "ts":
            raw = m.group("ts")
            inner = raw[raw.index("'") + 1:-1]
            tokens.append(("timestamp", _dt.datetime.fromisoformat(inner)))
        else:
            tokens.append(("op", m.group("op")))
    return tokens


class _Parser:
    def __init__(self, tokens: list, sql: str):
        self.toks = tokens
        self.i = 0
        self.sql = sql

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, ttype: str, value: Any = None):
        t = self.next()
        if t[0] != ttype or (value is not None and t[1] != value):
            raise SqlParseError(f"expected {ttype} {value}, got {t} in {self.sql!r}")
        return t

    def parse(self) -> Predicate:
        p = self.or_expr()
        if self.i != len(self.toks):
            raise SqlParseError(f"trailing tokens {self.toks[self.i:]} in {self.sql!r}")
        return p

    def or_expr(self) -> Predicate:
        parts = [self.and_expr()]
        while self.peek() == ("kw", "OR"):
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self) -> Predicate:
        parts = [self.not_expr()]
        while self.peek() == ("kw", "AND"):
            self.next()
            parts.append(self.not_expr())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def not_expr(self) -> Predicate:
        if self.peek() == ("kw", "NOT"):
            self.next()
            return Not(self.not_expr())
        return self.primary()

    def primary(self) -> Predicate:
        ttype, tval = self.peek()
        if (ttype, tval) == ("op", "("):
            self.next()
            p = self.or_expr()
            self.expect("op", ")")
            return p
        if (ttype, tval) == ("kw", "TRUE"):
            self.next()
            return Trivial(True)
        if (ttype, tval) == ("kw", "FALSE"):
            self.next()
            return Trivial(False)
        return self.comparison()

    def literal(self) -> Any:
        ttype, tval = self.next()
        if ttype in ("num", "str", "date", "timestamp"):
            return tval
        if (ttype, tval) == ("kw", "NULL"):
            return None
        if (ttype, tval) in (("kw", "TRUE"), ("kw", "FALSE")):
            # boolean comparison literal (flag = TRUE). Boolean columns are
            # not indexable (reference's 5 types), so the fold keeps every
            # file for this conjunct — but parsing it means the REST of a
            # conjunction still prunes instead of the whole predicate
            # falling back to a full scan.
            return tval == "TRUE"
        if (ttype, tval) == ("kw", "CAST"):
            # CAST(<literal> AS <type>) — Catalyst renders promoted literals
            # this way in analyzed-plan SQL (e.g. CAST(42 AS BIGINT))
            self.expect("op", "(")
            inner = self.literal()
            self.expect("kw", "AS")
            ty = self.type_name()
            self.expect("op", ")")
            return _cast_literal(inner, ty, self.sql)
        raise SqlParseError(f"expected literal, got {(ttype, tval)} in {self.sql!r}")

    def type_name(self) -> str:
        ttype, tval = self.next()
        if ttype == "ident":
            name = tval.upper()
        elif ttype == "kw" and tval in ("DATE", "TIMESTAMP"):
            name = tval
        else:
            raise SqlParseError(f"expected type name, got {(ttype, tval)} in {self.sql!r}")
        # optional precision/scale: DECIMAL(12,2), VARCHAR(10)
        if self.peek() == ("op", "("):
            self.next()
            self.expect("num")
            if self.peek() == ("op", ","):
                self.next()
                self.expect("num")
            self.expect("op", ")")
        return name

    def column_operand(self) -> str:
        """A bare column name, or a safe numeric-widening cast of one."""
        ttype, tval = self.next()
        if ttype == "ident":
            return tval
        if (ttype, tval) == ("kw", "CAST"):
            self.expect("op", "(")
            t2, name = self.next()
            if t2 != "ident":
                raise SqlParseError(
                    f"expected column inside CAST, got {(t2, name)} in {self.sql!r}")
            self.expect("kw", "AS")
            ty = self.type_name()
            self.expect("op", ")")
            if ty not in _SAFE_COLUMN_CASTS:
                raise SqlParseError(
                    f"unsafe column cast to {ty} in {self.sql!r}")
            return name
        raise SqlParseError(f"expected column name, got {(ttype, tval)} in {self.sql!r}")

    def comparison(self) -> Predicate:
        name = self.column_operand()
        ttype, tval = self.peek()
        if ttype == "op" and tval in ("=", "!=", "<>", "<", "<=", ">", ">=",
                                      "<=>"):
            self.next()
            value = self.literal()
            if tval == "<=>":
                # null-safe equality: <=> NULL is exactly IS NULL
                return IsNull(name) if value is None \
                    else NullSafeEq(name, value)
            if value is None:
                # `a = NULL` is never true; keep Spark semantics via residual
                return Trivial(False) if tval == "=" else Trivial(False)
            table = {"=": Eq, "!=": Ne, "<>": Ne, "<": Lt, "<=": Le, ">": Gt, ">=": Ge}
            return table[tval](name, value)
        if (ttype, tval) == ("kw", "IS"):
            self.next()
            if self.peek() == ("kw", "NOT"):
                self.next()
                self.expect("kw", "NULL")
                return IsNotNull(name)
            self.expect("kw", "NULL")
            return IsNull(name)
        negated = False
        if (ttype, tval) == ("kw", "NOT"):
            self.next()
            negated = True
            ttype, tval = self.peek()
        if (ttype, tval) == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            values = [self.literal()]
            while self.peek() == ("op", ","):
                self.next()
                values.append(self.literal())
            self.expect("op", ")")
            node: Predicate = In(name, tuple(v for v in values if v is not None))
            return Not(node) if negated else node
        if (ttype, tval) == ("kw", "BETWEEN"):
            self.next()
            low = self.literal()
            self.expect("kw", "AND")
            high = self.literal()
            node = And((Ge(name, low), Le(name, high)))
            return Not(node) if negated else node
        if (ttype, tval) == ("kw", "LIKE"):
            self.next()
            pattern = self.literal()
            if not isinstance(pattern, str):
                raise SqlParseError(f"LIKE needs a string pattern in {self.sql!r}")
            node = like_pattern_to_predicate(name, pattern)
            return Not(node) if negated else node
        raise SqlParseError(f"unsupported predicate on {name!r} in {self.sql!r}")


def parse_sql_predicate(sql: str) -> Predicate:
    """Parse a restricted SQL WHERE-clause into the predicate AST.

    Raises SqlParseError for syntax outside the supported grammar; callers
    fall back to an unpruned (but still correct) scan in that case.
    """
    return _Parser(_tokenize(sql), sql).parse()
