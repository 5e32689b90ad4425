#!/usr/bin/env python
"""Deterministic synthetic-table generator for scale factors beyond the
driver-provided /root/testdata (read-only, sf<=0.1). Replicates the
driver tables' SCHEMAS and value distributions (TESTDATA.md shapes,
measured from sf0.1) at any sf so the bench suite can run 10x+ scale
evidence (r4 verdict item 3) without touching driver data. NOT
oracle-gated data — correctness stays on the driver's sf0.01; this is
for throughput/robustness runs only.

Usage: python tools/gen_sf.py 1.0 /tmp/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    scale = sf / 0.1  # counts measured at sf0.1

    # --- region / nation (fixed dims, same at every sf)
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # --- customer / supplier / part
    n_cust = int(15000 * scale)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                      "MACHINERY"])[rng.integers(0, 5, n_cust)]),
    }))
    n_supp = int(1000 * scale)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    n_part = int(20000 * scale)
    types = [f"{a} {b}" for a in ("STANDARD", "SMALL", "LARGE", "ECONOMY")
             for b in ("BRASS", "COPPER", "NICKEL", "STEEL", "TIN")]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"part {VOCAB[i % 31]} {VOCAB[(i * 7) % 31]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{(i % 5) + 1}{(i % 9) + 1}"
                    for i in range(n_part)],
        "p_type": pa.array(np.array(types)[rng.integers(0, 20, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))

    # --- orders / lineitem (1-7 lines per order, keys referentially sound)
    n_ord = int(150000 * scale)
    odate = EPOCH_2024 + rng.integers(0, 365, n_ord) * 86_400_000_000
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, n_ord)]),
    }))
    lines_per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    sdate = np.repeat(odate, lines_per) + rng.integers(
        1, 120, n_li) * 86_400_000_000
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(lnum.astype(np.int32)),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # --- events (30-day span, exp-ish gaps, 5 types)
    n_ev = int(100000 * scale)
    gaps = rng.exponential(30 * 86_400_000_000 / n_ev, n_ev)
    ts = EPOCH_2024 + np.cumsum(gaps).astype("int64")
    n_users = int(1500 * scale)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev)),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0, 561, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # --- documents (31-word vocab, 10-100 words, ~3% near-dup mutations)
    n_doc = int(5000 * scale)
    lang_p = np.array([0.41, 0.14, 0.15, 0.15, 0.15])
    vocab = np.array(VOCAB)
    texts: list[str] = []
    lens = rng.integers(10, 101, n_doc)
    dup_of = rng.integers(0, max(n_doc - 1, 1), n_doc)
    is_dup = rng.random(n_doc) < 0.03
    for i in range(n_doc):
        if is_dup[i] and dup_of[i] < i:
            words = texts[dup_of[i]].split(" ")
            j = int(rng.integers(0, len(words)))
            words[j] = str(vocab[int(rng.integers(0, 31))])
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[rng.integers(0, 31, lens[i])]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=lang_p)]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings (unit-norm 64-dim, 10 label clusters)
    n_emb = int(2000 * scale)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 2.0 * centers[labels] + rng.normal(size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels.astype(np.int32)),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
