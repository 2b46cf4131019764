"""SQL predicate parser unit tests — no Spark session needed for parsing."""

import datetime

import pytest

from parquet_index_spark import predicates as P
from parquet_index_spark.predicates import parse_sql_predicate, SqlParseError


class TestParser:
    def test_eq_number(self):
        assert parse_sql_predicate("a = 5") == P.Eq("a", 5)

    def test_eq_string(self):
        assert parse_sql_predicate("a = 'x''y'") == P.Eq("a", "x'y")

    def test_comparisons(self):
        assert parse_sql_predicate("a <> 5") == P.Ne("a", 5)
        assert parse_sql_predicate("a != 5") == P.Ne("a", 5)
        assert parse_sql_predicate("a < 5") == P.Lt("a", 5)
        assert parse_sql_predicate("a <= 5") == P.Le("a", 5)
        assert parse_sql_predicate("a > 5") == P.Gt("a", 5)
        assert parse_sql_predicate("a >= 5") == P.Ge("a", 5)

    def test_float_literal(self):
        assert parse_sql_predicate("a > 30.5") == P.Gt("a", 30.5)

    def test_negative_number(self):
        assert parse_sql_predicate("a = -42") == P.Eq("a", -42)

    def test_date_literal(self):
        assert parse_sql_predicate("d = DATE '1995-06-01'") == \
            P.Eq("d", datetime.date(1995, 6, 1))

    def test_timestamp_literal(self):
        assert parse_sql_predicate("t > TIMESTAMP '1995-06-01 12:30:00'") == \
            P.Gt("t", datetime.datetime(1995, 6, 1, 12, 30))

    def test_in(self):
        assert parse_sql_predicate("a IN (1, 2, 3)") == P.In("a", (1, 2, 3))

    def test_not_in(self):
        assert parse_sql_predicate("a NOT IN (1, 2)") == P.Not(P.In("a", (1, 2)))

    def test_is_null(self):
        assert parse_sql_predicate("a IS NULL") == P.IsNull("a")
        assert parse_sql_predicate("a IS NOT NULL") == P.IsNotNull("a")

    def test_between(self):
        assert parse_sql_predicate("a BETWEEN 1 AND 5") == \
            P.And((P.Ge("a", 1), P.Le("a", 5)))

    def test_and_or_precedence(self):
        p = parse_sql_predicate("a = 1 OR b = 2 AND c = 3")
        assert p == P.Or((P.Eq("a", 1), P.And((P.Eq("b", 2), P.Eq("c", 3)))))

    def test_parens(self):
        p = parse_sql_predicate("(a = 1 OR b = 2) AND c = 3")
        assert p == P.And((P.Or((P.Eq("a", 1), P.Eq("b", 2))), P.Eq("c", 3)))

    def test_not(self):
        assert parse_sql_predicate("NOT a = 1") == P.Not(P.Eq("a", 1))
        assert parse_sql_predicate("NOT (a = 1 AND b = 2)") == \
            P.Not(P.And((P.Eq("a", 1), P.Eq("b", 2))))

    def test_like_lowering(self):
        # prefix patterns fold (StartsWith); general patterns stay
        # unsupported leaves (sound full scan with LIKE as residual)
        assert parse_sql_predicate("a LIKE 'x%'") == P.StartsWith("a", "x")
        assert parse_sql_predicate("a LIKE 'xyz'") == P.Eq("a", "xyz")
        assert isinstance(parse_sql_predicate("a LIKE '%x%'"), P.Unsupported)
        assert isinstance(parse_sql_predicate("a LIKE 'x_y%'"), P.Unsupported)

    def test_null_safe_equality(self):
        assert parse_sql_predicate("a <=> 5") == P.NullSafeEq("a", 5)
        assert parse_sql_predicate("a <=> NULL") == P.IsNull("a")
        # fold lowering: positive form prunes like Eq; negation keeps
        # nulls (exact 3VL complement), unlike NOT (a = 5)
        assert P.push_not_down(P.NullSafeEq("a", 5)) == P.Eq("a", 5)
        assert P.push_not_down(P.Not(P.NullSafeEq("a", 5))) == \
            P.Or((P.IsNull("a"), P.Ne("a", 5)))

    def test_keywords_case_insensitive(self):
        assert parse_sql_predicate("a in (1) and b is null") == \
            P.And((P.In("a", (1,)), P.IsNull("b")))

    def test_true_false(self):
        assert parse_sql_predicate("TRUE") == P.Trivial(True)
        assert parse_sql_predicate("a = 1 AND FALSE") == \
            P.And((P.Eq("a", 1), P.Trivial(False)))

    @pytest.mark.parametrize("bad", [
        "a ==== 5", "a +", "func(a) = 1", "a = b", "l_quantity * 2 > 5",
        "", "a = ", "(a = 1", "CAST(a AS INT) = 1",
    ])
    def test_rejects_out_of_grammar(self, bad):
        with pytest.raises(SqlParseError):
            parse_sql_predicate(bad)


class TestPushNotDown:
    def test_leaves(self):
        f = P.push_not_down
        assert f(P.Not(P.Eq("a", 1))) == P.Ne("a", 1)
        assert f(P.Not(P.Ne("a", 1))) == P.Eq("a", 1)
        assert f(P.Not(P.Gt("a", 1))) == P.Le("a", 1)
        assert f(P.Not(P.Ge("a", 1))) == P.Lt("a", 1)
        assert f(P.Not(P.Lt("a", 1))) == P.Ge("a", 1)
        assert f(P.Not(P.Le("a", 1))) == P.Gt("a", 1)
        assert f(P.Not(P.IsNull("a"))) == P.IsNotNull("a")
        assert f(P.Not(P.Not(P.Eq("a", 1)))) == P.Eq("a", 1)

    def test_not_in_becomes_conjunction_of_ne(self):
        assert P.push_not_down(P.Not(P.In("a", (1, 2)))) == \
            P.And((P.Ne("a", 1), P.Ne("a", 2)))

    def test_de_morgan(self):
        p = P.Not(P.And((P.Eq("a", 1), P.Gt("b", 2))))
        assert P.push_not_down(p) == P.Or((P.Ne("a", 1), P.Le("b", 2)))

    def test_referenced_columns(self):
        p = P.And((P.Eq("a", 1), P.Or((P.Gt("b", 2), P.IsNull("c")))))
        assert P.referenced_columns(p) == {"a", "b", "c"}


class TestCastFolding:
    """Analyzed-plan SQL wraps literals and coerced columns in CAST(...) —
    the grammar folds the safe forms and rejects semantics-changing ones."""

    def test_cast_int_literal(self):
        assert parse_sql_predicate("a = CAST(42 AS BIGINT)") == P.Eq("a", 42)

    def test_cast_in_list(self):
        assert parse_sql_predicate(
            "a IN (CAST(1 AS BIGINT), CAST(2 AS BIGINT))") == P.In("a", (1, 2))

    def test_cast_column_widening(self):
        assert parse_sql_predicate("CAST(a AS BIGINT) = 5") == P.Eq("a", 5)

    def test_cast_column_double(self):
        assert parse_sql_predicate("CAST(a AS DOUBLE) < 1.5") == P.Lt("a", 1.5)

    def test_cast_decimal_with_precision(self):
        assert parse_sql_predicate(
            "CAST(a AS DECIMAL(12,2)) >= 3") == P.Ge("a", 3)

    def test_cast_string_to_date_literal(self):
        assert parse_sql_predicate("d < CAST('2021-05-01' AS DATE)") == \
            P.Lt("d", datetime.date(2021, 5, 1))

    def test_unsafe_column_cast_rejected(self):
        # string->int on the column changes comparison semantics
        with pytest.raises(SqlParseError):
            parse_sql_predicate("CAST(a AS INT) = 5")

    def test_lossy_literal_cast_rejected(self):
        with pytest.raises(SqlParseError):
            parse_sql_predicate("a = CAST(1.5 AS BIGINT)")

    def test_analyzed_plan_shapes(self):
        # exactly what Catalyst renders for common pyspark Column filters
        got = parse_sql_predicate(
            "(((CAST(l_orderkey AS BIGINT) IN (CAST(42 AS BIGINT), "
            "CAST(4242 AS BIGINT))) OR (l_returnflag = 'R')) AND "
            "(l_linenumber <= 3))")
        assert got == P.And((
            P.Or((P.In("l_orderkey", (42, 4242)), P.Eq("l_returnflag", "R"))),
            P.Le("l_linenumber", 3)))

    def test_ts_literal_space_sep(self):
        assert parse_sql_predicate(
            "ts >= TIMESTAMP '2020-01-01 00:00:00'") == \
            P.Ge("ts", datetime.datetime(2020, 1, 1))


class TestCaseInsensitiveTypedLiterals:
    def test_lowercase_timestamp_and_date_literals(self):
        """Spark SQL is case-insensitive; lowercase typed literals must
        parse (they previously fell back to an unpruned scan)."""
        import datetime
        from parquet_index_spark import predicates as P
        p = P.parse_sql_predicate("ts >= timestamp'2024-01-05 00:00:00'")
        assert p == P.Ge("ts", datetime.datetime(2024, 1, 5))
        p2 = P.parse_sql_predicate("d = date '1995-01-01'")
        assert p2 == P.Eq("d", datetime.date(1995, 1, 1))

    def test_backquoted_identifiers(self):
        from parquet_index_spark import predicates as P
        assert P.parse_sql_predicate("`user_id` = 5") == P.Eq("user_id", 5)

    def test_backquoted_identifier_with_doubled_backtick_escape(self):
        """Spark escapes a literal ` inside a quoted identifier by
        doubling it: `a``b` names the column a`b. Mis-tokenizing it into
        two idents previously broke the parse (unpruned fallback)."""
        from parquet_index_spark import predicates as P
        assert P.parse_sql_predicate("`a``b` = 5") == P.Eq("a`b", 5)
        assert P.parse_sql_predicate("`x```` ``y` = 'v'") == \
            P.Eq("x`` `y", "v")

    def test_boolean_literal_comparison_keeps_conjunction_foldable(self):
        """flag = TRUE is unprunable (bools are not indexable) but must
        PARSE, so the other conjunct still prunes instead of the whole
        predicate falling back to a full scan."""
        from parquet_index_spark import predicates as P
        p = P.parse_sql_predicate("flag = TRUE AND user_id = 5")
        assert p == P.And((P.Eq("flag", True), P.Eq("user_id", 5)))
