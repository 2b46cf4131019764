"""operators/validate.py — declarative data-quality rules.

Exactness on injected defects, NULL-orthogonality of the rule kinds,
and the scale contract: all row-local rules share ONE aggregation pass
(no joins), referential rules add exactly one join each.
"""

import pytest
from pyspark.sql import Row, functions as F

from parquet_index_spark import plans
from parquet_index_spark.operators import validate as V


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame([
        Row(id=1, score=10.0, status="A", code="1-HI", fk=100),
        Row(id=2, score=-3.0, status="B", code="2-LO", fk=101),     # range
        Row(id=2, score=5.0, status="A", code="9-XX", fk=999),      # dup id, regex, fk
        Row(id=None, score=None, status="Z", code=None, fk=None),   # nulls, set
        Row(id=4, score=250.0, status="A", code="3-OK", fk=100),    # hi range
    ])


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame([Row(key=100), Row(key=101), Row(key=102)])


class TestExactCounts:
    def test_full_report(self, spark, dirty, ref):
        report = V.validate(dirty, [
            V.not_null("id"),
            V.unique("id"),
            V.in_range("score", lo=0.0, hi=100.0),
            V.in_set("status", ["A", "B"]),
            V.matches("code", "^[1-5]-"),
            V.foreign_key("fk", ref, "key"),
        ])
        got = {(r["rule"], r["col_name"]): (r["violations"], r["total_rows"],
                                            r["passed"])
               for r in report.collect()}
        assert got == {
            ("not_null", "id"): (1, 5, False),
            ("unique", "id"): (1, 5, False),            # id=2 twice => 1 dup
            ("in_range", "score"): (2, 5, False),       # -3 low, 250 high
            ("in_set", "status"): (1, 5, False),        # Z (null ignored)
            ("matches", "code"): (1, 5, False),         # 9-XX (null ignored)
            ("foreign_key", "fk"): (1, 5, False),       # 999 (null ignored)
        }

    def test_clean_table_passes(self, spark, ref):
        clean = spark.createDataFrame(
            [Row(id=i, fk=100 + (i % 3)) for i in range(10)])
        report = V.validate(clean, [
            V.not_null("id"), V.unique("id"),
            V.foreign_key("fk", ref, "key"),
        ])
        assert all(r["passed"] and r["violations"] == 0
                   for r in report.collect())

    def test_nulls_only_fail_not_null(self, spark):
        df = spark.createDataFrame(
            [Row(x=None), Row(x=None)],
            "x double")
        report = V.validate(df, [V.not_null("x"),
                                 V.in_range("x", lo=0.0)])
        got = {r["rule"]: r["violations"] for r in report.collect()}
        assert got == {"not_null": 2, "in_range": 0}

    def test_one_sided_ranges(self, spark):
        df = spark.createDataFrame([Row(x=-1.0), Row(x=1.0), Row(x=9.0)])
        lo_only = V.validate(df, [V.in_range("x", lo=0.0)]).collect()[0]
        hi_only = V.validate(df, [V.in_range("x", hi=5.0)]).collect()[0]
        assert lo_only["violations"] == 1
        assert hi_only["violations"] == 1


class TestApiContract:
    def test_absent_column_raises(self, spark, dirty):
        with pytest.raises(ValueError, match="absent"):
            V.validate(dirty, [V.not_null("nope")])

    def test_empty_rules_raise(self, spark, dirty):
        with pytest.raises(ValueError):
            V.validate(dirty, [])

    def test_in_range_requires_a_bound(self):
        with pytest.raises(ValueError):
            V.in_range("x")

    def test_report_schema_and_order(self, spark, dirty, ref):
        report = V.validate(dirty, [V.unique("id"), V.not_null("id"),
                                    V.foreign_key("fk", ref, "key")])
        assert report.columns == ["rule", "col_name", "violations",
                                  "total_rows", "passed"]
        rules = [r["rule"] for r in report.collect()]
        assert rules == sorted(rules)


class TestScaleShape:
    def test_row_local_rules_are_one_pass_no_joins(self, spark, dirty):
        report = V.validate(dirty, [
            V.not_null("id"), V.unique("id"),
            V.in_range("score", lo=0.0), V.in_set("status", ["A", "B"]),
            V.matches("code", "^[1-5]-"),
        ])
        s = plans.join_strategies(report)
        assert sum(s.values()) == 0, s

    def test_fk_joins_are_equi_joins_never_cartesian(self, spark, dirty, ref):
        # join_strategies counts the tree+details double-print, so one
        # join node may register twice; the invariants are: at least one
        # real equi-join, zero nested-loop/cartesian
        report = V.validate(dirty, [V.not_null("id"),
                                    V.foreign_key("fk", ref, "key")])
        s = plans.join_strategies(report)
        assert sum(s.values()) >= 1, s
        assert s["nested_loop"] == 0, s


class TestApproxUnique:
    def test_approx_unique_close_to_exact(self, spark):
        from pyspark.sql import Row
        df = spark.createDataFrame(
            [Row(id=i % 800) for i in range(1000)])   # 200 dups
        exact = V.validate(df, [V.unique("id")]).collect()[0]
        approx = V.validate(df, [V.unique("id", approximate=True)]) \
            .collect()[0]
        assert exact["violations"] == 200
        assert approx["rule"] == "unique_approx"
        assert abs(approx["violations"] - 200) <= 25  # rsd 1% envelope
        assert approx["violations"] >= 0

    def test_approx_unique_clean_table_not_negative(self, spark):
        from pyspark.sql import Row
        df = spark.createDataFrame([Row(id=i) for i in range(500)])
        r = V.validate(df, [V.unique("id", approximate=True)]).collect()[0]
        assert r["violations"] >= 0
