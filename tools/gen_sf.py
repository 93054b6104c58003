#!/usr/bin/env python3
"""Local scale-factor generator for the bench's scaling probe.

The driver ships read-only corpora at sf0.001/0.01/0.1 (TESTDATA.md).
The scaling probe (bench.py: bench_scaling) needs one more decade to
measure how wall time grows with data — so this regenerates the SAME
distributional shapes at an arbitrary sf, derived by profiling sf0.1:

* uniform 31-word vocabulary documents, 10-100 words/doc, ~0.2%
  planted exact duplicates, en-heavy language mix, 20 uniform sources;
* 30 days of uniform events over 5 event types, value ~ U(0, 560);
* TPC-H-ish orders/lineitem/customer with uniform foreign keys
  (lineitem:orders 4:1, orders:customer 10:1, keys scale with sf).

IMPORTANT: this is a BENCH fixture, not an oracle corpus — correctness
runs stay on the driver's read-only data.  Determinism: one fixed seed
per sf, so repeated bench runs see byte-identical inputs.  region and
nation are dimension tables (fixed 5/25 rows) and are copied verbatim
from the profile dir.  Only the tables the scaling queries touch are
generated (events, documents, embeddings, customer, orders, lineitem +
the two dims); part/supplier are not.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PROFILE_SF_DIR = "/root/testdata/sf0.1"
PROFILE_SF = 0.1

# sf0.1 row counts (TESTDATA.md shapes, verified by profiling)
ROWS_AT_PROFILE = {
    "customer": 15_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "part": 20_000,
    "supplier": 1_000,
}

EVENT_TYPES = np.array(["click", "view", "purchase", "signup", "error"])
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.4, 0.15, 0.15, 0.15, 0.15])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
US_PER_DAY = 86_400_000_000


def _vocab() -> list[str]:
    """The profile corpus's word list (31 uniform words) — derived, not
    hardcoded, so a regenerated driver corpus keeps us faithful."""
    tbl = pq.read_table(f"{PROFILE_SF_DIR}/documents.parquet", columns=["text"])
    words = set()
    for t in tbl.column("text").to_pylist():
        words.update(t.split())
    return sorted(words)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def generate(sf: float, out_dir: str, seed: int = 4242) -> str:
    """Generate the scaling corpus at ``sf`` into ``out_dir`` (skips
    work if the marker file says it's already there)."""
    marker = os.path.join(out_dir, f".complete_sf{sf}_seed{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / PROFILE_SF
    n = {t: int(r * scale) for t, r in ROWS_AT_PROFILE.items()}
    rng = np.random.default_rng(seed)

    for dim in ("region", "nation"):
        shutil.copyfile(
            f"{PROFILE_SF_DIR}/{dim}.parquet", os.path.join(out_dir, f"{dim}.parquet")
        )

    # -- customer ------------------------------------------------------
    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, nc), 2)),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, len(SEGMENTS), nc)]),
    }))

    # -- orders --------------------------------------------------------
    no = n["orders"]
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, no)]),
        "o_totalprice": pa.array(np.round(rng.uniform(100.0, 50_000.0, no), 2)),
        "o_orderdate": pa.array(
            t0 + (rng.integers(0, 365, no) * US_PER_DAY).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, len(PRIORITIES), no)]),
    }))

    # -- lineitem ------------------------------------------------------
    nl = n["lineitem"]
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, int(20_000 * scale), nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, int(1_000 * scale), nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, nl).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 100_000.0, nl), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0.0, 0.1, nl), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, nl), 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, nl)]),
        "l_shipdate": pa.array(
            t0 + (rng.integers(0, 365, nl) * US_PER_DAY).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
    }))

    # -- events (30 uniform days, 2024-01) -----------------------------
    ne = n["events"]
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(
            t0 + rng.integers(0, 30 * US_PER_DAY, ne).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.integers(0, int(1_500 * scale), ne), pa.int64()),
        "event_type": pa.array(EVENT_TYPES[rng.integers(0, len(EVENT_TYPES), ne)]),
        "value": pa.array(np.round(rng.uniform(0.0, 560.0, ne), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)]),
    }))

    # -- documents -----------------------------------------------------
    nd = n["documents"]
    vocab = np.array(_vocab())
    wc = rng.integers(10, 101, nd)
    flat = vocab[rng.integers(0, len(vocab), int(wc.sum()))]
    bounds = np.concatenate([[0], np.cumsum(wc)])
    texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(nd)]
    # ~0.2% planted exact duplicates (the profile corpus has 8/5000)
    for i in rng.integers(0, nd, max(1, nd // 500)):
        texts[i] = texts[(i + 1) % nd]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(LANGS[rng.choice(len(LANGS), nd, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, nd)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # -- part / supplier (r11: the SQL-facade scaling queries register
    # every view, so the corpus must be table-complete) ----------------
    npart = n["part"]
    colors = np.array(["blue", "green", "red", "white", "yellow",
                       "black", "pink", "gray"])
    nouns = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring",
                      "sprocket", "widget"])
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": pa.array([
            f"{colors[i % 8]} {nouns[(i // 8) % 8]}"
            for i in rng.integers(0, 64, npart)
        ]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, npart)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + rng.random(npart) * 99.9, 2), pa.float64()),
    }))
    nsupp = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(nsupp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(nsupp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, nsupp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(
            np.round(-999.0 + rng.random(nsupp) * 10998.0, 2), pa.float64()),
    }))

    # -- embeddings (r11: the full-headline scaling set needs q25) -----
    ne = n["embeddings"]
    vecs = rng.normal(size=(ne, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(ne), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, ne).astype(np.int32), pa.int32()),
    }))

    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scratch/sf{sf}"
    generate(sf, out)
    print(out)
