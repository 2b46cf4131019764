"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star): exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal column plumbing — each expressed as pure DataFrame transformations
designed scale-out-first (no driver-side loops, no row-at-a-time Python in
the hot path).
"""

from parquet_index_spark.operators import (dedup, profile, similarity, text,
                                           multimodal, validate)

__all__ = ["dedup", "profile", "similarity", "text", "multimodal",
           "validate"]
