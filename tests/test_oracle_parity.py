"""Local replica of the driver's DuckDB-oracle gate.

For every entry in the workload: run the Spark query and the oracle SQL on
the same parquet tables, sort columns by name, compare row multisets
exactly. Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_SF=sf0.01
to mirror the driver's correctness scale.
"""

import datetime
import decimal
import math
import os

import duckdb
import pytest

from parquet_index_spark.workload import QUERIES

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001")
SF_DIR = os.path.join(TESTDATA, SF)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    # sort by repr: a total order even when a column mixes NULLs with
    # tagged/bare values (e.g. gap-fill output); equality stays tuple-exact
    return sorted(
        (tuple(_norm(row[c]) for c in cols) for row in df.collect()),
        key=repr)


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rel.fetchall()),
        key=repr)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(spark, name, ddb):
    fn, oracle = QUERIES[name]
    df = fn(spark, SF_DIR)
    got = _spark_rows(df)
    if oracle is None:
        assert len(got) >= 0  # rows-only check, mirrors driver behavior
        return
    want = _duck_rows(ddb, oracle)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
