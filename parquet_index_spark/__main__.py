"""Operator CLI: ``python -m parquet_index_spark <cmd> <table_path>``.

A thin wrapper over the diagnostic surface so an operator at a terminal
can inspect an index without writing a script:

- ``describe <path>``   — the describe summary (coverage, filter
  saturation, table/index byte accounting)
- ``recommend <path>``  — the filter-type advisor (measured distincts
  and spans -> dict / bitmap / bloom per column)
- ``explain <path> <predicate>`` — per-leaf pruning diagnosis with
  saturation attached
- ``recommend-ivf <path> [target_cluster_size] [n_centroids]`` — the
  IVF quantizer sizing advisor over the table's ``embedding`` column
  (k from corpus size / target cluster size; warns when the proposal
  implies clusters past semantic_dedup's enumeration cap)
- ``validate <path> <rule> [<rule> ...]`` — the data-quality rules
  engine over a parquet table; rules are ``kind:column[:arg[,arg]]``:
  ``not_null:c``  ``unique:c``  ``unique~:c`` (HLL approximate)
  ``range:c:lo,hi`` (either bound may be empty)  ``set:c:a,b,c``
  ``regex:c:pattern``. Prints one JSON line per rule; exit code 1 when
  any rule fails (pipeline-gate friendly).
- ``vacuum <path>`` — recover from interrupted DML: restore displaced
  originals from stranded ``*_tmp`` staging dirs (sidecar-classified;
  see sources.vacuum_table) and drop recoverable leftovers. Prints one
  JSON line ``{removed, kept, restored}``. Exit 0 when everything was
  classified and cleaned (restores included); exit 3 when any dir was
  KEPT for manual inspection — it may hold the only copy of table data,
  so a 3am pager run must not treat that as success. Exit 4 when the
  table's single-writer lock is HELD by a live writer (vacuum mutates,
  so it refuses to pull staged files out from under one) — the JSON
  error line names the holder; a crashed holder's lock self-expires
  after ``spark.sql.index.writer.lock.ttlSeconds`` (default 600).
- ``lock <path>`` — read-only single-writer lock status: one JSON line
  ``{held, owner, op, age_sec, ttl_sec, stale, uri}``. Exit 0 when the
  table is free (or the lock is stale — the next writer takes over);
  exit 4 when a live writer holds it. Never mutates anything — the
  runbook probe to run BEFORE a manual vacuum or takeover.

Honors ``SPARK_GRAFT_METASTORE`` (falls back to the session default
resolution). Local-mode session; diagnostics are metadata-only except
``recommend-ivf``, which pays one count() of the embedding column.
"""

from __future__ import annotations

import json
import os
import sys


def _usage() -> int:
    print(__doc__)
    return 2


def main(argv) -> int:
    if len(argv) < 2:
        return _usage()
    cmd, path = argv[0], argv[1]
    if cmd not in ("describe", "recommend", "explain", "recommend-ivf",
                   "validate", "vacuum", "lock"):
        return _usage()
    if cmd in ("explain", "validate") and len(argv) < 3:
        return _usage()

    from pyspark.sql import SparkSession

    from parquet_index_spark import QueryContext

    # only stop the session on exit if this invocation created it
    # (getOrCreate inside a host process would otherwise kill the
    # host's session). PySpark's Python API has no getDefaultSession —
    # referencing it crashed every real ``python -m`` invocation while
    # in-process tests short-circuited past it on the active session
    # (round-11, caught by driving the CLI as a subprocess). The
    # _instantiatedSession probe covers the cross-thread case:
    # getActiveSession is thread-local, but getOrCreate returns the
    # process-wide instantiated session, which this invocation must
    # not stop either.
    owns_session = (
        SparkSession.getActiveSession() is None
        and getattr(SparkSession, "_instantiatedSession", None) is None)
    spark = (SparkSession.builder.master("local[4]")
             .appName("parquet-index-spark-cli")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ms = os.environ.get("SPARK_GRAFT_METASTORE")
    if ms:
        spark.conf.set("spark.sql.index.metastore", ms)
    ctx = QueryContext(spark)
    try:
        if cmd == "describe":
            ctx.index.describe.parquet(path).show(100, truncate=False)
        elif cmd == "recommend":
            for rec in ctx.index.parquet(path).recommend_filter_types():
                print(json.dumps(rec))
        elif cmd == "recommend-ivf":
            from parquet_index_spark.operators.similarity import (
                recommend_ivf)
            target = int(argv[2]) if len(argv) > 2 else 10_000
            k = int(argv[3]) if len(argv) > 3 else None
            print(json.dumps(recommend_ivf(
                spark.read.parquet(path), target_cluster_size=target,
                n_centroids=k)))
        elif cmd == "validate":
            from parquet_index_spark.operators import validate as V
            rules = [_parse_rule(spec) for spec in argv[2:]]
            report = V.validate(spark.read.parquet(path), rules).collect()
            failed = False
            for r in report:
                print(json.dumps(r.asDict()))
                failed = failed or not r["passed"]
            if failed:
                return 1
        elif cmd == "vacuum":
            from parquet_index_spark.sources import (ConcurrentWriterError,
                                                     vacuum_table)
            try:
                info = vacuum_table(spark, path)
            except ConcurrentWriterError as e:
                print(json.dumps({"error": "writer_lock_held",
                                  "detail": str(e)}))
                return 4  # a live writer holds the table — do not touch
            print(json.dumps(info))
            if info["kept"]:
                return 3  # dirs held for manual inspection — not clean
        elif cmd == "lock":
            from parquet_index_spark.sources import writer_lock_status
            st = writer_lock_status(spark, path)
            print(json.dumps(st))
            if st["held"] and not st["stale"]:
                return 4  # a live writer holds the table
        else:
            d = ctx.index.parquet(path).explain_pruning(
                argv[2], include_saturation=True)
            print(json.dumps(d, indent=1, default=str))
    finally:
        if owns_session:
            spark.stop()
    return 0


def _parse_rule(spec: str):
    """``kind:column[:arg[,arg]]`` -> a validate.Rule (see module doc)."""
    from parquet_index_spark.operators import validate as V

    parts = spec.split(":", 2)
    if len(parts) < 2:
        raise SystemExit(f"bad rule {spec!r}: expected kind:column[:args]")
    kind, column = parts[0], parts[1]
    arg = parts[2] if len(parts) > 2 else None
    if kind == "not_null":
        return V.not_null(column)
    if kind == "unique":
        return V.unique(column)
    if kind == "unique~":
        return V.unique(column, approximate=True)
    if kind == "range":
        if arg is None or "," not in arg:
            raise SystemExit(f"range rule needs lo,hi in {spec!r}")
        lo_s, hi_s = arg.split(",", 1)
        try:
            lo = float(lo_s) if lo_s else None
            hi = float(hi_s) if hi_s else None
        except ValueError:
            raise SystemExit(f"range bounds must be numeric in {spec!r}")
        if lo is None and hi is None:
            raise SystemExit(f"range rule needs at least one bound "
                             f"in {spec!r}")
        return V.in_range(column, lo=lo, hi=hi)
    if kind == "set":
        if not arg:
            raise SystemExit(f"set rule needs values in {spec!r}")
        return V.in_set(column, arg.split(","))
    if kind == "regex":
        if not arg:
            raise SystemExit(f"regex rule needs a pattern in {spec!r}")
        return V.matches(column, arg)
    raise SystemExit(f"unknown rule kind {kind!r} in {spec!r}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
