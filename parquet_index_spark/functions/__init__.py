"""Public column-function namespace: the engine-portable building blocks
used by the operators, re-exported for direct pipeline use.

    from parquet_index_spark import functions as PF
    df.select(PF.tokens("text"), PF.cosine(a, b), ...)

Everything here is a pure ``pyspark.sql.functions`` composition (codegen'd,
no UDFs) with an exact ANSI-SQL equivalent.
"""

from parquet_index_spark.operators.dedup import (  # noqa: F401
    tokens, shingles,
)
from parquet_index_spark.operators.similarity import (  # noqa: F401
    dot, norm, cosine, lsh_bucket, plane_value,
)
from parquet_index_spark.operators.text import (  # noqa: F401
    token_count, char_count, stopword_ratio, avg_token_len,
    quality_score, predict_lang, document_fingerprint,
)

__all__ = [
    "tokens", "shingles",
    "dot", "norm", "cosine", "lsh_bucket", "plane_value",
    "token_count", "char_count", "stopword_ratio", "avg_token_len",
    "quality_score", "predict_lang", "document_fingerprint",
]
