"""Similarity search over embedding columns (array<float>).

Two tiers, both pure DataFrame logic:

- brute-force cosine top-k: exact baseline; one scan + one top-k. Element
  arithmetic runs in double precision via higher-order functions (zip_with /
  aggregate) inside codegen — no UDF, no collect of the corpus.
- sign-LSH bucketing: the scale path. Random hyperplanes come from a
  *closed-form* integer formula (LCG-style), so bucket assignment is
  deterministic and portable to any SQL engine — at 100 TB you search only
  the query's bucket (and neighbors) instead of the corpus.

Near-duplicate detection by embedding cosine reuses the same pieces:
bucket first, verify cosine within buckets.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _query_lit(query_vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: Sequence[int] = ()) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    Returns (id, sim rounded to 4, rank). Ties break by id so the result is
    deterministic. The plan is scan -> project -> global top-k (Spark's
    TakeOrderedAndProject — no full sort)."""
    q = _query_lit(query_vec)
    emb = _as_double(F.col(vec_col))
    sim = F.round(cosine(emb, q), 4)
    out = df.select(F.col(id_col), sim.alias("sim"))
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(list(exclude_ids)))
    return (out.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
            .select(id_col, "sim",
                    F.row_number().over(
                        Window.orderBy(F.desc("sim"), F.asc(id_col))
                    ).alias("rank")))


def plane_value(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    ((plane*73856093 + dim*19349663) mod 10007) / 10007 - 0.5.

    Closed-form so any engine reproduces the same planes (the DuckDB
    oracle embeds the identical formula)."""
    return ((F.lit(plane) * 73856093 + F.lit(dim) * 19349663) % 10007
            ).cast("double") / 10007.0 - 0.5


def lsh_bucket(vec_col: str = "embedding", num_planes: int = 8) -> Column:
    """Sign-LSH bucket id: bit p = 1 iff dot(vec, plane_p) > 0.

    Unrolled over planes (python ints) so shift amounts are literals; the
    per-plane dot stays a codegen'd zip_with/aggregate over the vector."""
    emb = _as_double(F.col(vec_col))
    dims = F.sequence(F.lit(0), F.size(emb) - 1)

    # NB: single-arg lambdas only — pyspark binds a second lambda parameter
    # (even a defaulted one) to the array index column
    def coeff_fn(p: int):
        return lambda d: ((F.lit(p) * 73856093 + d * 19349663) % 10007
                          ).cast("double") / 10007.0 - 0.5

    # long arithmetic: up to 63 planes, and the output dtype matches the
    # BIGINT the SQL oracle emits (int32 vs int64 hashes differently)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        coeffs = F.transform(dims, coeff_fn(p))
        bucket = bucket + F.when(dot(emb, coeffs) > 0,
                                 F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_histogram(df: DataFrame, vec_col: str = "embedding",
                         num_planes: int = 8) -> DataFrame:
    """Bucket occupancy — the operational view of LSH quality."""
    return (df.select(lsh_bucket(vec_col, num_planes).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_vectors"))
            .orderBy("bucket"))


def query_probe_buckets(query_vec: Sequence[float], num_planes: int = 8,
                        num_probes: int = 1) -> List[int]:
    """The query's bucket plus multi-probe neighbors.

    Multi-probe LSH: the buckets most likely to hold missed neighbors are
    those differing in the planes where the query's dot product is closest
    to zero. Probing them raises recall without more planes (i.e. without
    shrinking buckets for everyone)."""
    dots = []
    for p in range(num_planes):
        d = 0.0
        for j, v in enumerate(query_vec):
            coeff = ((p * 73856093 + j * 19349663) % 10007) / 10007.0 - 0.5
            d += float(v) * coeff
        dots.append(d)
    base = 0
    for p, d in enumerate(dots):
        if d > 0:
            base |= 1 << p
    # flip the lowest-confidence bits, one at a time, most marginal first
    order = sorted(range(num_planes), key=lambda p: abs(dots[p]))
    buckets = [base]
    for p in order[:max(0, num_probes - 1)]:
        buckets.append(base ^ (1 << p))
    return buckets


def ann_topk_lsh(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 num_planes: int = 8, num_probes: int = 1) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's bucket
    (plus multi-probe neighbor buckets).

    At scale the bucket predicate prunes the scan by ~2^num_planes /
    num_probes; recall rises with num_probes at linear extra cost."""
    buckets = query_probe_buckets(query_vec, num_planes, num_probes)
    bucketed = df.filter(lsh_bucket(vec_col, num_planes).isin(buckets))
    return cosine_topk(bucketed, query_vec, k, id_col, vec_col)


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            num_planes: int = 4) -> DataFrame:
    """Near-duplicate vectors: bucket by sign-LSH, verify cosine within
    buckets. Join key is the bucket, so no cross join; few planes keep
    recall high for the near-dup (cos ~ 1) regime."""
    with_b = df.select(F.col(id_col), F.col(vec_col),
                       lsh_bucket(vec_col, num_planes).alias("bucket"))
    a, b = with_b.alias("a"), with_b.alias("b")
    sim = F.round(cosine(_as_double(F.col(f"a.{vec_col}")),
                         _as_double(F.col(f"b.{vec_col}"))), 4)
    return (a.join(b, "bucket")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    sim.alias("sim"))
            .filter(F.col("sim") >= threshold))
