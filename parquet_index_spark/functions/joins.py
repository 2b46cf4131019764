"""Join utilities for scale: salting for skewed keys.

AQE's skew-join handling splits oversized partitions at runtime, but it
only applies to sort-merge joins and after a shuffle already materialized
the skew. Explicit salting bounds the per-task input *before* the shuffle:
the skewed (large) side gets a random salt in [0, salt); the small side is
replicated salt times. Use when one key dominates (e.g. a null-ish default
key holding 30% of a 100 TB table).
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import DataFrame, functions as F


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
