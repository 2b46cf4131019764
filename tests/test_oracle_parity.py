"""Local replica of the driver's DuckDB-oracle gate.

For every entry in the workload: run the Spark query and the oracle SQL on
the same parquet tables, sort columns by name, compare row multisets
exactly. Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_SF=sf0.01
to mirror the driver's correctness scale.

The value compare is the DRIVER-STYLE stringify (tools/parity_diag
semantics): both sides pass through pandas and cells compare as strings,
so type-level drift — DuckDB HUGEINT -> float64 "N.0" vs Spark int64 "N"
(round-3's only red row) — fails here instead of only on the driver's
board. The old fetchall-based compare was type-insensitive and missed
exactly that class.
"""

import os

import duckdb
import pytest

from parquet_index_spark.workload import QUERIES
from tools.parity_diag import frame_rows

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001")
SF_DIR = os.path.join(TESTDATA, SF)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


# Always-on core: at least one query per component family (index layer,
# TPC-H joins/aggs, windows, set ops, streaming, dedup/text/sampling/ANN/
# multimodal, asof/range/gap-fill, merge). The long tail is `slow` so the
# default suite stays bounded; `-m ""` runs the full sweep.
_CORE = {
    # index layer — ONE representative per sub-family (round-13 budget
    # trim, r12 verdict #4: proven siblings — hilbert, phrase,
    # time-range, refresh-rewrite — moved to the `-m ""` long tail)
    "idx_point_lookup", "idx_zorder_range",
    "idx_join_dpp", "idx_fast_count", "idx_refresh_append",
    "idx_term_search",
    # relational (TPC-H joins/aggs, windows, set ops, merge)
    "q1_pricing_summary", "top3_orders_per_customer",
    "setop_active_building_buyers", "merge_upsert_orders",
    # streaming (one window rep + the two lease-changed merge sinks)
    "stream_windowed_counts", "stream_merge_upsert",
    "stream_merge_cdc_ops",
    # LLM-pipeline / text / similarity / multimodal
    "dedup_exact_stats", "text_profile_by_lang",
    "ann_cosine_topk", "multimodal_pipeline",
    # time-series / events
    "asof_join_events",
    # the ROUND'S CHANGED SURFACE stays fast until driver-proven
    # (ADVICE r3): the failure class it carries (oracle typing under
    # stringify-hash) must be visible by default. Round 15: the
    # saturation-routed Jaccard (dual-branch gated oracle), the
    # derived-planes embedding pairs, and the lease/fence DML
    # consumers (heartbeat lock-scope + fence synchronization change).
    # Earlier rounds' additions rotate to `slow` once proven —
    # `-m ""` still sweeps all 144.
    "jaccard_neardup_pairs", "embedding_similar_pairs",
    "merge_delete_orders", "idx_delete_range", "idx_update_range",
    "idx_delete_partitioned", "idx_compact_roundtrip",
}


def _above_graded_sf() -> bool:
    """True when the sweep runs past the shipped/graded scale factors
    (locally generated sf1.0+ data) — the regime where the
    SCALE_SAMPLED_ORACLES substitution applies."""
    try:
        return float(SF.removeprefix("sf")) > 0.1
    except ValueError:
        return False


@pytest.mark.parametrize(
    "name",
    [n if n in _CORE else pytest.param(n, marks=pytest.mark.slow)
     for n in QUERIES])
def test_query_matches_oracle(spark, name, ddb):
    fn, oracle = QUERIES[name]
    df = fn(spark, SF_DIR)
    # at-scale sampled oracles (round 15, r14 verdict #4): queries whose
    # FULL DuckDB verification side is infeasible past the graded SFs
    # (all-pairs cosine spilling >78 GB at sf1.0) certify a
    # deterministic subset instead of skipping — the Spark side runs
    # unrestricted, only its result is filtered for the compare.
    from parquet_index_spark.workload import SCALE_SAMPLED_ORACLES
    if name in SCALE_SAMPLED_ORACLES and _above_graded_sf():
        result_filter, oracle = SCALE_SAMPLED_ORACLES[name]
        df = result_filter(df)
    spdf = df.toPandas()
    if oracle is None:
        assert len(spdf) >= 0  # rows-only check, mirrors driver behavior
        return
    opdf = ddb.sql(oracle).df()
    got, gcols = frame_rows(spdf)
    want, wcols = frame_rows(opdf)
    assert gcols == wcols, f"{name}: columns {gcols} vs {wcols}"
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
