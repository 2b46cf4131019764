"""Round-15 optimization profiler: per-query wall clock, Spark job count,
and the formatted physical plan, using the bench's session shape.

Usage:
  python tools/profile_r15.py [--plans-dir DIR] [--reps N] [query ...]

With no query names, profiles every BENCH_QUERIES entry. Writes
<plans-dir>/<query>_<tag>.txt when --plans-dir is given (tag via --tag,
default 'before'). Prints one JSON line per query:
  {"query": ..., "cold_sec": ..., "warm_sec": ..., "n_jobs_warm": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=1,
                    help="extra warm reps (min reported)")
    ap.add_argument("--noop", action="store_true",
                    help="time the noop sink instead of count()")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("pis-profile-r15")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from parquet_index_spark.workload import QUERIES, ensure_session_confs
    ensure_session_confs(spark)

    if args.queries:
        names = args.queries
    else:
        import bench
        names = list(bench.BENCH_QUERIES)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    def run(fn):
        df = fn(spark, SF_DIR)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return df

    for name in names:
        fn, _oracle = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        rec = {"query": name}
        try:
            t0 = time.time()
            run(fn)
            rec["cold_sec"] = round(time.time() - t0, 3)
            # warm rep(s) under a job group so we can count jobs
            warms = []
            n_jobs = None
            for i in range(max(args.reps, 1)):
                group = f"pg_{name}_{i}"
                sc.setJobGroup(group, name)
                t0 = time.time()
                df = run(fn)
                warms.append(round(time.time() - t0, 3))
                try:
                    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                except Exception:  # noqa: BLE001
                    n_jobs = None
                finally:
                    sc.setJobGroup(None, None)
            rec["warm_sec"] = min(warms)
            rec["warm_reps"] = warms
            if n_jobs is not None:
                rec["n_jobs_warm"] = n_jobs
            if args.plans_dir:
                plan = formatted_plan(df)
                path = os.path.join(args.plans_dir,
                                    f"{name}_{args.tag}.txt")
                with open(path, "w") as f:
                    f.write(plan)
                rec["plan_file"] = path
                rec["n_exchanges"] = plan.count("Exchange")
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        finally:
            sc.setJobDescription(None)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
