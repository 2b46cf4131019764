"""Generate a larger scale factor of the driver's synthetic star schema
for LOCAL scale-replication runs (round-14, r13 verdict ask #4: replay
the bench board at sf1.0 = 10x the graded sf0.1).

The driver ships sf{0.001,0.01,0.1} only, and /root/testdata is
read-only — so the 10x board needs a locally generated sibling. This
generator reproduces the SAME schema, key domains, and per-column
distributions as the shipped data (measured from sf0.1 with DuckDB:
uniform key/date/price domains, 1-7 uniform linenumbers, exp(50) event
values, the 41/15/15/15/15 lang split, the ~54-word Spark-vocabulary
documents, iid-normal 64-dim embeddings) and scales ONLY the
cardinalities, TPC-H style: fixed region/nation are copied verbatim;
every other table grows linearly in sf. It is a distribution-preserving
regeneration, not the shifted-key union replication tools/stress.py
uses — join fan-ins and selectivities stay constant while volume grows,
which is exactly what a sf1/sf0.1 per-query ratio study needs.

Usage: python tools/gen_sf.py [sf] [outdir]
Defaults: sf=1.0, outdir=/tmp/spark_graft_sf{sf}.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC01 = "/root/testdata/sf0.1"
SEED = 4242

#: sf0.1 cardinalities (measured); scaled by sf/0.1
BASE = {"customer": 15_000, "supplier": 1_000, "part": 20_000,
        "orders": 150_000, "lineitem": 600_000, "events": 100_000,
        "documents": 5_000, "embeddings": 2_000}

VOCAB = ("batch part spark line column order small sort fast value scan "
         "hash slow group agg filter query big key window row table "
         "stream merge data a vector").split()
LANGS = (["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15
         + ["de"] * 14)


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name:10s} {table.num_rows:>9,} rows")


def generate(sf: float, outdir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)
    mult = sf / 0.1
    n = {t: int(round(c * mult)) for t, c in BASE.items()}
    for fixed in ("region", "nation"):
        shutil.copyfile(os.path.join(SRC01, f"{fixed}.parquet"),
                        os.path.join(outdir, f"{fixed}.parquet"))
        print(f"  {fixed:10s} copied (fixed-size dim)")

    nc, ns, npart = n["customer"], n["supplier"], n["part"]
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_name": pa.array(f"Customer#{i:09d}" for i in range(nc)),
        "c_nationkey": rng.integers(0, 25, nc).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, nc), 2),
        "c_mktsegment": pa.array(rng.choice(
            ["HOUSEHOLD", "MACHINERY", "FURNITURE", "AUTOMOBILE",
             "BUILDING"], nc)),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(ns, dtype=np.int64),
        "s_name": pa.array(f"Supplier#{i:09d}" for i in range(ns)),
        "s_nationkey": rng.integers(0, 25, ns).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, ns), 2),
    }))
    sizes = ["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD",
             "PROMO"]
    adjs = ["hot", "cold", "blue", "red", "old", "new", "big", "small"]
    nouns = ["ring", "bolt", "plate", "case", "box", "pipe", "disk"]
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(npart, dtype=np.int64),
        "p_name": pa.array(
            f"{adjs[i % len(adjs)]} {nouns[(i // 7) % len(nouns)]}"
            for i in range(npart)),
        "p_brand": pa.array("Brand#" + str(b) for b in
                            rng.integers(1, 26, npart)),
        "p_type": pa.array(rng.choice(sizes, npart)),
        "p_size": rng.integers(1, 51, npart).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, npart), 2),
    }))

    no = n["orders"]
    day_ms = 86_400_000
    d0 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(
        np.int64)
    span_days = int((np.datetime64("2001-08-02")
                     - np.datetime64("1995-01-01")).astype(int))
    odate = d0 + rng.integers(0, span_days, no) * day_ms
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": rng.integers(0, nc, no),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], no)),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, no), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], no)),
    }))

    nl = n["lineitem"]
    # independent l_orderkey / l_linenumber draws are DELIBERATE
    # (round-15 ADVICE adjudication): the SHIPPED sf0.1 lineitem is
    # itself independent-draw, not TPC-H per-order clustered — measured
    # with DuckDB: 456,861 distinct (l_orderkey, l_linenumber) pairs
    # over 600,000 rows (composite-key collisions present), per-order
    # counts 1..17 distributed ~Poisson(4) (not uniform 1-7), 2,764
    # orders with ZERO lineitems (= e^-4 * 150k, the Poisson zero
    # class), and only 13,079/147,236 orders with sequential
    # linenumbers starting at 1. A TPC-H-style repeat-each-order-1-7
    # generation would BREAK scale replication fidelity, not improve it.
    qty = rng.integers(1, 51, nl).astype(np.float64)
    sdate = d0 + rng.integers(1, span_days + 94, nl) * day_ms
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, no, nl),
        "l_partkey": rng.integers(0, npart, nl),
        "l_suppkey": rng.integers(0, ns, nl),
        "l_linenumber": rng.integers(1, 8, nl).astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(
            qty * rng.uniform(900, 2100, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], nl)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], nl)),
        "l_shipdate": pa.array(sdate, pa.timestamp("ms")),
    }))

    ne = n["events"]
    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(
        np.int64)
    espan = 30 * 86_400_000_000
    _write(outdir, "events", pa.table({
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": pa.array(np.sort(e0 + rng.integers(0, espan, ne)),
                       pa.timestamp("us")),
        # measured domain: users = customers/10 at every shipped sf
        # (sf0.1: 1,500 distinct over 15,000 customers), ~67 events
        # per user — the state-key count of the stateful streaming ops
        # must scale at the driver's rate, not the customer count's
        "user_id": rng.integers(0, max(nc // 10, 1), ne),
        "event_type": pa.array(rng.choice(
            ["click", "view", "purchase", "signup", "error"], ne)),
        "value": np.round(rng.exponential(50.0, ne), 2),
        "props": pa.array('{"k": %d}' % k for k in
                          rng.integers(0, 100, ne)),
    }))

    nd = n["documents"]
    lens = rng.integers(8, 101, nd)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in
                              words[pos:pos + ln]))
        pos += ln
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, nd)),
        "source": pa.array("src%d" % s for s in
                           rng.integers(0, 20, nd)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    nv = n["embeddings"]
    vecs = rng.normal(0.0, 1.0, (nv, 64)).astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(nv, dtype=np.int64),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": rng.integers(0, 10, nv).astype(np.int32),
    }))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = (sys.argv[2] if len(sys.argv) > 2
              else f"/tmp/spark_graft_sf{sf:g}")
    print(f"generating sf={sf:g} at {outdir}")
    generate(sf, outdir)


if __name__ == "__main__":
    main()
