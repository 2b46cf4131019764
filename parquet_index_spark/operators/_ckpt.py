"""Materialization helper for corpus-sized intermediates.

Several operators materialize a corpus-sized frame once so downstream
references don't re-plan (and re-scan) the whole upstream subtree per
reference — per-(group, value) drift counts, dedup shingle tables, the
incremental-dedup bloom side. ``localCheckpoint`` is the fast default,
but its blocks are executor-local and NOT fault tolerant: at 100 TB a
single lost executor fails the job instead of recomputing lineage
(round-8 verdict #5 / next-round ask).

``spark.sql.index.checkpoint.reliable=true`` switches those sites to a
fault-tolerant materialization, preferring a reliable ``checkpoint()``
when the session has a checkpoint directory (``spark.sparkContext.
setCheckpointDir(...)`` — replayable from durable storage AND lineage-
truncating, the right choice on a real cluster) and falling back to
``persist(StorageLevel.DISK_ONLY)`` otherwise (keeps lineage, so lost
blocks recompute instead of failing; the frame stays pinned in the
cache manager for the session, the deliberate cost of replayability).

Default unchanged: fast local checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

RELIABLE_CONF = "spark.sql.index.checkpoint.reliable"


def _has_checkpoint_dir(spark) -> bool:
    try:
        d = spark.sparkContext.getCheckpointDir()
        return bool(d)
    except Exception:  # noqa: BLE001 — py4j surface drift
        return False


def checkpoint_corpus(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a corpus-sized intermediate once.

    Mode is read from the session conf ``spark.sql.index.checkpoint.
    reliable`` (default ``false`` => ``localCheckpoint``). Results are
    identical in every mode; only the failure/retention semantics differ
    (see module docstring).
    """
    spark = df.sparkSession
    reliable = (spark.conf.get(RELIABLE_CONF, "false")
                or "false").lower() == "true"
    if not reliable:
        return df.localCheckpoint(eager=eager)
    if _has_checkpoint_dir(spark):
        return df.checkpoint(eager=eager)
    return df.persist(StorageLevel.DISK_ONLY)


def release_corpus(df: DataFrame) -> None:
    """Release a frame materialized by :func:`checkpoint_corpus` once a
    bounded operation (a DML call, one micro-batch) is done with it.

    Only the ``persist(DISK_ONLY)`` fallback registers the frame in the
    CacheManager — and a cached Dataset is pinned for the session, so a
    long-running CDC sink would accumulate one entry per micro-batch
    without bound (round-10 ADVICE). ``localCheckpoint``/``checkpoint``
    frames are not cache-registered; for them this is a no-op. Safe
    after all actions on the frame have run (the persist fallback keeps
    lineage, so even an in-flight task recomputes rather than fails)."""
    try:
        if df.is_cached:
            df.unpersist()
    except Exception:  # noqa: BLE001 — best-effort release
        pass
