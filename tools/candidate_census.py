"""Candidate-generation census for the two round-14 at-scale findings
(r14 verdict #6 done-criterion: "no entry whose candidate census grows
faster than corpus size").

For a given SF dir, reports:
- n-gram Jaccard: the preflight shared-shingle candidate estimate
  (Σ df·(df-1)/2 over capped-df shingles — what the old exact path
  would have enumerated), the routing decision at the default 20M
  budget, and the ACTUAL candidate count of the path taken.
- embedding near-dup: corpus size, derived planes_per_band, and the
  banded-LSH candidate count (vs the count the old hardcoded 4-plane
  setting would generate).

Usage: python tools/candidate_census.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .appName("candidate_census").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_index_spark.operators import dedup as D
    from parquet_index_spark.operators import similarity as S

    out: dict = {"sf_dir": sf_dir}

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out["n_docs"] = docs.count()
    # the preflight estimate, computed exactly as the operator does
    sh = docs.select("doc_id",
                     F.array_distinct(D.shingles("text", 3)).alias("sh"))
    dfreq = (sh.select("doc_id", F.explode("sh").alias("s"))
             .groupBy("s").agg(F.count("*").alias("df")))
    out["jaccard_exact_estimate"] = int(
        (dfreq.filter(F.col("df") <= 500)
         .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2)
              .cast("long").alias("e")).collect()[0]["e"]) or 0)
    out["jaccard_routed_to_lsh"] = out["jaccard_exact_estimate"] > 20_000_000
    sigs = D.minhash_signatures(docs, num_hashes=16, shingle_k=3)
    out["jaccard_lsh_candidates"] = D.lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=4).count()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    ppb = S.derived_planes_per_band(n, 16)
    out["n_vectors"] = n
    out["derived_planes_per_band"] = ppb

    def _cand_count(planes: int) -> int:
        bucketed = emb.select(
            "vec_id",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         S._banded_bucket("embedding", b, planes)
                         .alias("bucket"))
                for b in range(4)])).alias("bk"))
        sizes = (bucketed.select("vec_id", "bk.band", "bk.bucket")
                 .groupBy("band", "bucket")
                 .agg(F.count("*").alias("c")))
        return int(sizes.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long")
            .alias("p")).collect()[0]["p"] or 0)

    out["embedding_candidates_derived"] = _cand_count(ppb)
    out["embedding_candidates_hardcoded4"] = _cand_count(4)
    warnings.filterwarnings("ignore")
    print("CENSUS:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
