"""Per-job census for one workload query: job id -> stage names and
task counts, via statusTracker after a warm run under a job group.

Usage: python tools/job_census.py <query> [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("pis-census")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from parquet_index_spark.workload import QUERIES, ensure_session_confs
    ensure_session_confs(spark)
    fn, _ = QUERIES[name]
    fn(spark, SF_DIR).count()  # cold
    for i in range(reps):
        group = f"census_{i}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, SF_DIR).count()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jobs = sorted(st.getJobIdsForGroup(group))
        print(f"== rep {i}: {dt:.3f}s, {len(jobs)} jobs")
        for j in jobs:
            ji = st.getJobInfo(j)
            stages = []
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si:
                    stages.append((s, si.name.split("\n")[0][:60],
                                   si.numTasks))
            print(json.dumps({"job": j, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
