#!/usr/bin/env python
"""Round-6 measurement sidecar: regenerate a driver-shaped dataset at an
arbitrary scale factor so optimizations can be measured at the scale the
driver actually benched round 5 at (BENCH_r05.json: "sf": 1.0 — a dataset
the driver generates itself and which does not persist in the sandbox).

NOT used by bench.py, oracle_check, or any declared query: the correctness
oracles run on the driver's own read-only /root/testdata/sf* tables. This
exists only so `bench_extra.py --sf-dir /root/sfwork/sf1.0` measures the
same row counts / distributions the driver's sf1.0 run sees.

Distributions are matched to the measured empirical shape of the driver's
sf0.1 tables (single-row-group snappy parquet, same schemas via pyarrow
schema copy; documents: 30-word uniform vocab + Uniform[10,100] word
lengths + ~5%% near-dup copies with inserted 'dup' tokens + ~0.16%% exact
dups; embeddings: uniform random unit float32 vectors, labels 0..9;
events: sorted-uniform timestamps over 30 days, exponential(50) values,
100 distinct props; TPC-H-ish tables: uniform keys, Poisson(4) lineitems
per order). Deterministic: numpy default_rng seeded per table.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_SF = 0.1

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJS = ["large", "hot", "new", "red", "cold", "blue", "old", "small"]
NOUNS = ["widget", "anvil", "ring", "gear", "bolt", "plate", "rod", "gizmo"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "SMALL", "PROMO"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    ref = pq.read_schema(f"{BASE}/{name}.parquet")
    cols = [table.column(f.name).cast(f.type) for f in ref]
    table = pa.Table.from_arrays(cols, schema=pa.schema(list(ref)))
    # single row group + snappy: the driver's files are unsplittable
    # single-group parquet; keep that worst-case property at every sf.
    pq.write_table(
        table, f"{out_dir}/{name}.parquet",
        row_group_size=max(table.num_rows, 1), compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows", flush=True)


def gen_documents(out_dir: str, sf: float) -> None:
    rng = np.random.default_rng(4201)
    n = int(50_000 * sf)
    lengths = rng.integers(10, 101, size=n)
    kind = rng.random(n)  # <0.05 near-dup, <0.0516 exact dup
    texts: list[str] = []
    for i in range(n):
        if kind[i] < 0.05 and i > 10:
            base = texts[int(rng.integers(0, i))]
            words = base.split(" ")
            words.insert(int(rng.integers(0, len(words) + 1)), "dup")
            texts.append(" ".join(words))
        elif kind[i] < 0.0516 and i > 10:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            idx = rng.integers(0, len(VOCAB), size=int(lengths[i]))
            texts.append(" ".join(VOCAB[j] for j in idx))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n)]
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs.tolist(),
        "source": sources,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))


def gen_embeddings(out_dir: str, sf: float) -> None:
    rng = np.random.default_rng(4202)
    n = int(20_000 * sf)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, size=n).astype(np.int32),
    }))


def gen_events(out_dir: str, sf: float) -> None:
    rng = np.random.default_rng(4203)
    n = int(1_000_000 * sf)
    span_us = 30 * 86_400 * 1_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = t0 + np.sort(rng.integers(0, span_us, size=n)).astype("timedelta64[us]")
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, int(15_000 * sf), size=n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup", "error"], size=n).tolist(),
        "value": np.round(np.minimum(rng.exponential(50.0, size=n), 560.0), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
    }))


def gen_tpch(out_dir: str, sf: float) -> None:
    rng = np.random.default_rng(4204)
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)

    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, size=n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            size=n_cust).tolist(),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, size=n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{ADJS[int(a)]} {NOUNS[int(b)]}" for a, b in zip(
            rng.integers(0, 8, size=n_part), rng.integers(0, 8, size=n_part))],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(0, 25, size=n_part)],
        "p_type": rng.choice(PTYPES, size=n_part).tolist(),
        "p_size": rng.integers(1, 51, size=n_part).astype(np.int32),
        "p_retailprice": np.round(
            900.0 + rng.integers(0, 1000, size=n_part) * 0.1, 2),
    }))

    day_us = 86_400 * 1_000_000
    o0 = np.datetime64("1995-01-01T00:00:00", "us")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, size=n_orders).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "F", "P"], size=n_orders).tolist(),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, size=n_orders), 2),
        "o_orderdate": o0 + (rng.integers(0, 2404, size=n_orders)
                             * day_us).astype("timedelta64[us]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            size=n_orders).tolist(),
    }))

    per_order = rng.poisson(4.0, size=n_orders)
    keep = per_order > 0
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64)[keep],
                      per_order[keep])
    n_li = len(okeys)
    linenumber = np.concatenate(
        [np.arange(1, c + 1, dtype=np.int32) for c in per_order[keep]])
    l0 = np.datetime64("1995-01-02T00:00:00", "us")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": okeys,
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
        "l_linenumber": np.minimum(linenumber, 7).astype(np.int32),
        "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
        "l_extendedprice": np.round(
            rng.uniform(900, 105_000, size=n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, size=n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, size=n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], size=n_li).tolist(),
        "l_linestatus": rng.choice(["O", "F"], size=n_li).tolist(),
        "l_shipdate": l0 + (rng.integers(0, 2498, size=n_li)
                            * day_us).astype("timedelta64[us]"),
    }))

    for name in ("nation", "region"):  # tiny dimension tables: copy as-is
        _write(out_dir, name, pq.read_table(f"{BASE}/{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_dir = args.out or f"/root/sfwork/sf{args.sf}"
    os.makedirs(out_dir, exist_ok=True)
    gen_documents(out_dir, args.sf)
    gen_embeddings(out_dir, args.sf)
    gen_events(out_dir, args.sf)
    gen_tpch(out_dir, args.sf)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        json.dump({"sf": args.sf, "generator": "bench_sfgen.py"}, f)
    print(f"wrote {out_dir}", flush=True)


if __name__ == "__main__":
    main()
