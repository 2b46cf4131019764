"""Membership filter statistics: bloom and dictionary filters.

Mirrors the semantics of the reference's ColumnFilterStatistics
(ColumnFilterStatistics.scala:251-393): a per-(file, block, column)
membership structure consulted only for EqualTo / In after min-max passes.

- bloom: expected items = min(block rows, 2**20), fpp = 0.03
  (ColumnFilterStatistics.scala:256); ours is a deterministic pure-Python
  bloom over blake2b-derived double hashing, serialized to bytes and stored
  as a *binary column in the metadata parquet* rather than side files — one
  metadata read instead of O(files) small reads at prune time.
- dict: exact membership (reference uses a Kryo HashSet,
  ColumnFilterStatistics.scala:313-358); ours stores the distinct values as
  a list column, capped at ``dict_max_size`` (falls back to bloom above the
  cap to bound metadata size — the reference's dict is unbounded, which does
  not survive high-cardinality columns at scale).
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Any, Iterable, Optional

from parquet_index_spark import types as ityp

BLOOM_FPP = 0.03
BLOOM_MAX_ITEMS = 1 << 20
_MAGIC = b"PIBLOOM1"


def _hash_pair(data: bytes) -> tuple:
    """Two independent 64-bit hashes via blake2b (deterministic everywhere)."""
    d = hashlib.blake2b(data, digest_size=16).digest()
    h1, h2 = struct.unpack(">QQ", d)
    return h1, h2 | 1  # make h2 odd so strides cover the bit space


class BloomFilter:
    """Fixed-size bloom filter with k rounds of double hashing."""

    __slots__ = ("num_bits", "num_hashes", "bits")

    def __init__(self, num_bits: int, num_hashes: int, bits: Optional[bytearray] = None):
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.bits = bits if bits is not None else bytearray((num_bits + 7) // 8)

    @classmethod
    def create(cls, expected_items: int, fpp: float = BLOOM_FPP) -> "BloomFilter":
        n = max(1, min(int(expected_items), BLOOM_MAX_ITEMS))
        m = max(8, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def put_bytes(self, data: bytes) -> None:
        h1, h2 = _hash_pair(data)
        m = self.num_bits
        for i in range(self.num_hashes):
            idx = (h1 + i * h2) % m
            self.bits[idx >> 3] |= 1 << (idx & 7)

    def might_contain_bytes(self, data: bytes) -> bool:
        h1, h2 = _hash_pair(data)
        m = self.num_bits
        for i in range(self.num_hashes):
            idx = (h1 + i * h2) % m
            if not (self.bits[idx >> 3] >> (idx & 7)) & 1:
                return False
        return True

    def put(self, value: Any, kind: str) -> None:
        self.put_bytes(ityp.membership_bytes(value, kind))

    def might_contain(self, value: Any, kind: str) -> bool:
        return self.might_contain_bytes(ityp.membership_bytes(value, kind))

    def to_bytes(self) -> bytes:
        header = _MAGIC + struct.pack(">II", self.num_bits, self.num_hashes)
        return header + bytes(self.bits)

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if data[:8] != _MAGIC:
            raise ValueError("not a serialized BloomFilter")
        num_bits, num_hashes = struct.unpack(">II", data[8:16])
        return cls(num_bits, num_hashes, bytearray(data[16:]))


class DictFilter:
    """Exact membership over a set of normalized values (long-space or str)."""

    __slots__ = ("values",)

    def __init__(self, values: set):
        self.values = values

    def might_contain(self, value: Any, kind: str) -> bool:
        return ityp.literal_to_stat_value(value, kind) in self.values


class MembershipFilter:
    """Uniform wrapper the pruner consults: dict if present, else bloom."""

    __slots__ = ("dict_filter", "bloom_filter")

    def __init__(self, dict_filter: Optional[DictFilter], bloom_filter: Optional[BloomFilter]):
        self.dict_filter = dict_filter
        self.bloom_filter = bloom_filter

    def might_contain(self, value: Any, kind: str) -> bool:
        if self.dict_filter is not None:
            return self.dict_filter.might_contain(value, kind)
        if self.bloom_filter is not None:
            return self.bloom_filter.might_contain(value, kind)
        return True


def build_filters(unique_values: Iterable[Any], kind: str, filter_type: str,
                  dict_max_size: int, block_rows: int) -> tuple:
    """Build (dict_values_list | None, bloom_bytes | None) for one block x column.

    ``unique_values`` are already-normalized (long-space int or str), nulls
    excluded. Chooses dict when requested and small enough, else bloom.
    """
    values = list(unique_values)
    if filter_type == "dict" and len(values) <= dict_max_size:
        return values, None
    bloom = BloomFilter.create(max(len(values), 1) if values else 1)
    for v in values:
        bloom.put_bytes(ityp.membership_bytes(v, kind))
    return None, bloom.to_bytes()
