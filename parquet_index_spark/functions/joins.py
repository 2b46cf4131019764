"""Join utilities for scale: salting for skewed keys, index-aware
dim-to-fact join pruning (a file-level dynamic-partition-pruning analog).

AQE's skew-join handling splits oversized partitions at runtime, but it
only applies to sort-merge joins and after a shuffle already materialized
the skew. Explicit salting bounds the per-task input *before* the shuffle:
the skewed (large) side gets a random salt in [0, salt); the small side is
replicated salt times. Use when one key dominates (e.g. a null-ish default
key holding 30% of a 100 TB table).
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, functions as F


def broadcast_if_small(df: DataFrame,
                       max_rows: int = 4_000_000,
                       checkpoint: bool = True) -> DataFrame:
    """The repo-standard guarded broadcast: materialize ``df`` once (so
    the probe and the consuming join share ONE materialization instead
    of re-executing the subtree — the count-then-join rule; honors the
    ``spark.sql.index.checkpoint.reliable`` knob like every other
    corpus materialization site), probe its row count with
    ``limit(n+1)``, and return it broadcast-hinted under the cap or
    plain above it (Catalyst's size-based choice then applies — a
    shuffle join instead of an executor OOM). Pass ``checkpoint=False``
    when ``df`` is ALREADY materialized — checkpointing is not
    idempotent, so re-wrapping would pay a second materialization."""
    if checkpoint:
        from parquet_index_spark.operators._ckpt import checkpoint_corpus
        df = checkpoint_corpus(df)
    small = df.limit(max_rows + 1).count() <= max_rows
    return F.broadcast(df) if small else df


def salted_join(large: DataFrame, small: DataFrame,
                on: Union[str, List[str]], salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Join with the large side salted and the small side replicated.

    ``on`` columns must exist on both sides. The salt column is derived
    from a deterministic hash of the large side's whole row (monotonic id
    would break determinism across retries), so results are stable.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        # right/full-outer would emit every unmatched small-side row once
        # per salt replica (round-1 ADVICE). Left-side variants are safe:
        # each large row carries ONE salt and the small side is replicated
        # across all salts, so match/no-match per large row is unchanged.
        raise ValueError(
            f"salted_join supports inner/left/leftsemi/leftanti, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt_col = (F.abs(F.hash(*[F.col(c) for c in large.columns])) % salt)
    salted_large = large.withColumn("__salt", salt_col)
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = salted_large.join(replicated_small, keys + ["__salt"], how)
    return out.drop("__salt")


def _same_key_family(a, b) -> bool:
    """True when both join-key types hash identically in the index's
    filter family: both integral (stat-normalized to the same long) or
    both string. Gates only the BLOOM tier — see
    :func:`_range_fold_sound` for the (looser) range-tier condition."""
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType, StringType)
    integral = (ByteType, ShortType, IntegerType, LongType)
    return (isinstance(a, integral) and isinstance(b, integral)) or (
        isinstance(a, StringType) and isinstance(b, StringType))


def _range_fold_sound(a, b) -> bool:
    """True when the dim's min/max are sound fold bounds for the fact
    column: equal types (date=date, timestamp=timestamp, string=string,
    ...) or both integral (widening int compare). A MISMATCHED pair
    (string dim vs long fact) orders the dim lexicographically while the
    residual compares numerically — the unsound case the round-9 guard
    exists for. Deliberately looser than :func:`_same_key_family`:
    date/timestamp keys have a sound range fold (_norm_literal handles
    their kinds) even though the bloom tier's raw-int64 hash family
    cannot serve them."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType
    integral = (ByteType, ShortType, IntegerType, LongType)
    return a == b or (isinstance(a, integral) and isinstance(b, integral))


def _dim_key_bloom(dim: DataFrame, dim_key: str, n_keys_est: int,
                   fpp: float) -> "bytes | None":
    """Distributed bloom over the dim's distinct join keys, hashed with
    the SAME family the index's dict-value probe uses — the big-dim
    pruning tier of :func:`dpp_join` (``predicates.InBloom``).

    Executor-side partial filters share one (m, k) sizing derived from
    ``n_keys_est`` so they OR-merge; the driver collect is bounded not
    by a merge stage but by choosing the partial COUNT from the blob
    size — the keys are repartitioned to exactly that many build tasks
    (<= 64, fewer for big blobs), so the collected partials fit a fixed
    memory budget by construction. Supported key types: integral (raw
    int64 == stat-normalized value) and string; anything else returns
    None and the caller keeps range-only pruning.

    Sizing: ``fpp`` is the PER-PROBED-VALUE rate, and a fact block
    probes every one of its dict values (up to dict.maxSize = 4096), so
    the per-BLOCK false-keep compounds to ~ d*fpp — the default 1e-5
    keeps it ~4% at the dict cap, where the naive 1% would false-keep
    essentially every block (1 - 0.99^4096 ~= 1). ~2.9 MB per million
    keys; an 8192-bit floor kills the tiny-dim granularity regime and k
    is capped at 24 rounds (fp at the floor is already ~1e-28 — more
    rounds only cost probe time). A false positive only KEEPS a fact
    block — soundness never depends on the sizing.
    """
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType, StringType)

    from parquet_index_spark.statistics import BloomFilter

    dtype = dim.schema[dim_key].dataType
    integral = isinstance(dtype, (ByteType, ShortType, IntegerType,
                                  LongType))
    if not (integral or isinstance(dtype, StringType)):
        return None
    n = max(1, int(n_keys_est))
    m = max(8192, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    # the wire format packs num_bits as uint32: clamp m below 2^32
    # (~179M keys at fpp=1e-5 — a caller raising max_bloom_keys past
    # that would otherwise fail to_bytes executor-side). A smaller m
    # only raises the fpp — more kept files, never unsound.
    m = min(m, (1 << 32) - 64)
    k = min(24, max(1, round(m / n * math.log(2))))

    keys = (dim.select(F.col(dim_key).alias("__k"))
            .where(F.col(dim_key).isNotNull()).distinct())

    def _partials(batches):
        bf = BloomFilter(m, k)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            if integral:
                bf.put_longs_vectorized(
                    pdf["__k"].to_numpy(dtype="int64"))
            else:
                for v in pdf["__k"]:
                    bf.put(str(v), "string")
        if seen:
            yield pd.DataFrame({"bloom": [bf.to_bytes()]})

    def _or_blobs(blobs) -> "bytes | None":
        acc = None
        for blob in blobs:
            b = np.frombuffer(bytes(blob)[16:], dtype=np.uint8)
            acc = b.copy() if acc is None else (acc | b)
        if acc is None:
            return None
        out = BloomFilter(m, k)
        out.bits = bytearray(acc.tobytes())
        return out.to_bytes()

    # one partial per PARTITION means partial count x blob size hits the
    # driver at collect time — at the 20M-key ceiling a blob is ~60 MB,
    # so 64 partials would be ~3.8 GB transient (round-9 review). Bound
    # the collect at ~256 MB by choosing the partial COUNT from the blob
    # size and repartitioning the keys to exactly that many build tasks:
    # per-task memory is one m-bit filter (inserts stream per Arrow
    # batch), the driver holds <= groups blobs, and no merge stage is
    # needed at all. Big dims trade build parallelism for memory safety.
    blob_bytes = (m + 7) // 8 + 16
    # parallelism grows with the key count (a 200-key dim needs ONE
    # build task, not 64 empty ones) but is capped by the driver-memory
    # budget and a sane task ceiling
    groups = max(1, min(64, (256 << 20) // max(1, blob_bytes),
                        1 + n // 250_000))
    partials = keys.repartition(groups).mapInPandas(_partials,
                                                    "bloom binary")
    return _or_blobs(row["bloom"] for row in partials.collect())


def degraded_key_fold(keys_df: DataFrame, key: str, fact_key: str,
                      fact_type, filter_type, lo, hi, n_est: int,
                      bloom_prune: bool = True,
                      max_bloom_keys: int = 20_000_000,
                      bloom_fpp: float = 1e-5):
    """The shared big-key-set pruning fold (round-10 review #5 — one
    maintained copy for dpp_join AND merge_into's guarded delete tier):
    [min, max] range predicates over ``fact_key``, tightened by a
    distributed ``InBloom`` probe over ``keys_df[key]``'s distinct keys
    when every gate holds — the fact index carries exact dict/bitmap
    evidence, the hash families match, and the estimated key count fits
    ``max_bloom_keys`` (past it the blob itself becomes a driver-sized
    object, so the tier stands down to range-only — sound, just
    coarser). ``lo``/``hi`` must come from the FULL key set (a LIMITed
    sample's extremes are not sound bounds). Returns the predicate AST.
    """
    from parquet_index_spark import predicates as P

    preds = [P.Ge(fact_key, lo), P.Le(fact_key, hi)]
    if bloom_prune and n_est <= max_bloom_keys \
            and filter_type in ("dict", "bitmap") \
            and _same_key_family(fact_type, keys_df.schema[key].dataType):
        blob = _dim_key_bloom(keys_df, key, int(n_est * 1.1) + 16,
                              bloom_fpp)
        if blob is not None:
            preds.append(P.InBloom(fact_key, blob))
    return P.And(tuple(preds))


def dpp_join(ctx, fact_path: str, fact_key: str, dim: DataFrame,
             dim_key: str, how: str = "inner",
             max_keys: int = 100_000,
             max_broadcast_rows: int = 4_000_000,
             bloom_prune: bool = True,
             max_bloom_keys: int = 20_000_000,
             bloom_fpp: float = 1e-5) -> DataFrame:
    """Star-schema join with index-driven file pruning of the fact side —
    the file-level analog of Spark's dynamic partition pruning
    (reference parity: the reference prunes only from literal predicates,
    `src/main/scala/.../ParquetIndexFilters.scala:52-137`; deriving them
    from a filtered dim side is the natural index-layer extension).

    The filtered dim's distinct join keys are materialized on the driver
    (bounded by ``max_keys`` — the same "dim side is small" premise Spark's
    own DPP and broadcast joins rest on), folded into the fact's index as
    an IN-set predicate so only fact files whose stats/membership filters
    can contain those keys are scanned, then the dim is joined. Past
    ``max_keys`` the fold degrades to the [min, max] range — still sound,
    still prunes when the fact is clustered on the key — PLUS (when
    ``bloom_prune`` and the estimated key count fits ``max_bloom_keys``)
    a distributed bloom over the dim's keys folded as
    ``predicates.InBloom``: fact blocks whose exact DICT filter values
    all miss the dim bloom are refuted even when key ranges overlap
    everywhere — file-level semi-join pushdown at ANY dim size (the
    range tier alone prunes nothing on an unclustered key). Sound by
    construction: the bloom has no false negatives, dict values are
    exact, and every other evidence shape keeps the block; bloom false
    positives only admit extra files, and the join enforces exact row
    semantics. Costs one extra dim scan (the distributed filter build,
    tree-merged partials — dedup_against_corpus's shape) and ~2.9 MB of
    driver/broadcast bytes per million keys at the default 1e-5
    per-probed-value fpp (sized so the per-BLOCK false-keep stays ~4%
    even when a block probes dict.maxSize = 4096 values — see
    :func:`_dim_key_bloom`).

    The join itself broadcasts the dim only under a ``limit(n+1)`` ROW
    probe against ``max_broadcast_rows`` (the span_dedup /
    dedup_against_corpus contract): distinct-key count under ``max_keys``
    does not bound dim rows or bytes (a wide or key-duplicated dim can
    blow the broadcast budget), so above the cap — and always on the
    ``> max_keys`` degraded branch, whose premise is "dim is big" — the
    forced hint is dropped and the join strategy returns to Catalyst's
    own size-based choice (a shuffle join for a genuinely large dim).
    Identical results; the file-level pruning (this operator's point)
    is unaffected.

    INNER joins only: the whole point is pruning fact files that cannot
    match any dim key, which is unsound for a fact-preserving join (a
    LEFT/FULL/ANTI join must still emit the pruned files' rows) and a
    semi join projects no dim columns. Returns the joined DataFrame
    (all fact columns + non-key dim columns).
    """
    from parquet_index_spark import predicates as P

    if how != "inner":
        raise ValueError(
            f"dpp_join supports how='inner' only, got {how!r}: file "
            "pruning from the dim's key set drops fact rows a "
            "fact-preserving join must keep")
    # one materialization of the (possibly filtered/joined) dim plan:
    # the distinct-key collect, the broadcast row probe, and the join
    # itself all reuse it (the checkpoint-before-count-then-join rule;
    # without it the dim subtree re-executes three times). Honors the
    # spark.sql.index.checkpoint.reliable knob (round-9 verdict nit #3).
    from parquet_index_spark.operators._ckpt import checkpoint_corpus
    dim = checkpoint_corpus(dim)
    sampled = [r[0] for r in
               dim.select(dim_key).distinct().limit(max_keys + 1).collect()]
    # the over-cap check counts the PRE-null-filter sample: a NULL key
    # in the sample would otherwise mask a >max_keys dim and the IN fold
    # below would prune files holding the unsampled keys, silently
    # dropping join rows. NULL itself never equi-joins, so it is safe to
    # drop from the fold VALUES — just not from the size check.
    big_dim = len(sampled) > max_keys
    vals = [v for v in sampled if v is not None]
    fact = ctx.index.parquet(fact_path)
    # vals empty means the dim has no non-NULL keys at all (distinct
    # yields at most one NULL row): nothing can equi-join regardless of
    # dim size, so the zero-file fold is sound even when big_dim
    if not vals:
        # empty dim: nothing can join; In(()) folds to select zero files
        pruned = fact.filter(P.In(fact_key, ()))
    elif big_dim:
        fact_type = fact._metadata.data_schema[fact_key].dataType
        dim_type = dim.schema[dim_key].dataType
        if not _range_fold_sound(fact_type, dim_type):
            # type-mismatched keys (the join leans on Spark's implicit
            # cast): BOTH pruning tiers are unsound here — a string
            # dim's lexicographic min/max is not a numeric bound (the
            # residual `k >= '1005' AND k <= '905'` silently dropped
            # every row — latent since the range tier landed, caught by
            # the round-9 bloom-tier tests), and a bloom built from one
            # hash family probed with the other yields false negatives.
            # Full scan (Trivial keeps every file and still records the
            # prune telemetry); the join itself is exact.
            pruned = fact.filter(P.Trivial(True))
        else:
            # the collected vals are a LIMITed sample — their min/max
            # is not a sound bound; aggregate the full dim for the true
            # range (and an approximate key count to size the bloom
            # tier, same job)
            lo, hi, n_est = dim.agg(
                F.min(dim_key), F.max(dim_key),
                F.approx_count_distinct(dim_key)).head()
            # range + InBloom via the shared fold: the bloom tier
            # additionally requires matching hash families
            # (integral/string — date/timestamp keys keep the range
            # fold but cannot ride the raw-int64 bloom), EXACT filter
            # evidence on the fact index (against the default
            # filter.type=bloom nothing is refutable), and a key count
            # under max_bloom_keys. approx_count_distinct can
            # undercount (~2% stderr): the fold sizes with headroom so
            # the real fpp stays near target — undersizing only raises
            # fpp (keeps more files), never unsound.
            pruned = fact.filter(degraded_key_fold(
                dim, dim_key, fact_key, fact_type,
                fact._metadata.filter_type, lo, hi, int(n_est),
                bloom_prune=bloom_prune, max_bloom_keys=max_bloom_keys,
                bloom_fpp=bloom_fpp))
    else:
        pruned = fact.filter(P.In(fact_key, tuple(vals)))
    if big_dim:
        # >max_keys distinct keys: the dim exceeded the "small side"
        # premise — don't probe, don't broadcast
        broadcastable = False
    else:
        broadcastable = (dim.limit(max_broadcast_rows + 1).count()
                         <= max_broadcast_rows)
    cond = pruned[fact_key] == dim[dim_key]
    out_cols = ([pruned[c] for c in pruned.columns] +
                [dim[c] for c in dim.columns if c != dim_key])
    right = F.broadcast(dim) if broadcastable else dim
    return pruned.join(right, cond, how).select(*out_cols)
