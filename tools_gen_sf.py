"""Deterministic scale-factor generator for scaling measurements.

Materializes a synthetic corpus with the SAME schema and marginal
distributions as the driver-provided `/root/testdata/sf*` tables
(TESTDATA.md; profiled from sf0.1 with DuckDB), at any scale factor —
used by the round-9 sf1 scaling study (VERDICT r8 directive 1):
`python tools_gen_sf.py 1 /root/repo/.scratch/sf1`.

Faithfulness notes (vs the profiled sf0.1):
- row counts scale linearly: lineitem 6M/sf-unit ... embeddings 8k at
  sf1 (the driver's own embeddings step is 500 -> 500 -> 2000, a 4x
  jump at sf0.1; 4x again keeps the trend).
- events keep the SAME 30-day window (Jan 2024) with 10x users and 10x
  rows — exactly how the driver scales 0.001 -> 0.1 — sorted by ts,
  value ~ Exp(mean 50), props a one-key JSON.
- customer/supplier names follow the `%09d` key format (the ER entries'
  blocking depends on it); region/nation are copied verbatim (fixed).
- documents: 10-100 words over the same 31-token vocabulary, same lang
  mix (en ~41%, 4 others ~15% each), 20 sources, and the same tiny
  exact-duplicate rate (~8 pairs per 5k docs).
- embeddings: 64-dim L2-normalized gaussians, labels 0..9.

NOT intended for oracle-correctness runs (the driver's generator owns
byte-level truth); this exists so scaling exponents are measured on a
distributionally honest 10x corpus. Seeded, byte-stable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"  # marginals profiled from here


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), compression="snappy"
    )
    print(f"{name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    scale = sf / 0.1  # sizes below are the profiled sf0.1 counts

    n_cust = int(15_000 * scale)
    n_supp = int(1_000 * scale)
    n_part = int(20_000 * scale)
    n_ord = int(150_000 * scale)
    n_li = int(600_000 * scale)
    n_ev = int(100_000 * scale)
    n_doc = int(5_000 * scale)
    # driver trend: 500 (sf0.001/0.01) -> 2000 (sf0.1); 4x again at sf1
    n_emb = 8_000 if scale >= 10 else max(500, int(2_000 * scale))

    # region / nation: fixed dimensions, copied verbatim
    for t in ("region", "nation"):
        _write(out_dir, t, pq.read_table(os.path.join(SF01, f"{t}.parquet")))

    segs = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    adjs = ["large", "hot", "blue", "red", "small", "green", "cold", "dim"]
    nouns = ["ring", "bolt", "case", "disk", "gear", "pipe", "cone", "plug"]
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
    a_i = rng.integers(0, len(adjs), n_part)
    n_i = rng.integers(0, len(nouns), n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(a_i, n_i)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(types)[rng.integers(0, len(types), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2),
    }))

    day_us = 86_400_000_000
    o_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_hi = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    odate = (o_lo + (rng.integers(0, (o_hi - o_lo) // day_us + 1, n_ord)) * day_us)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "F", "O"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(prios)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: ~4 lines/order via a uniform order draw (matches the
    # profiled 1..17 per-order spread), shipdate over the same window
    lo = np.sort(rng.integers(0, n_ord, n_li))
    ln = np.ones(n_li, np.int32)
    # linenumber = running index within equal orderkeys
    ln[1:] = np.where(lo[1:] == lo[:-1], 0, 1)
    idx = np.arange(n_li)
    starts = np.maximum.accumulate(np.where(ln == 1, idx, 0))
    ln = (idx - starts + 1).astype(np.int32)
    sdate = (o_lo + (rng.integers(0, (o_hi - o_lo) // day_us + 1, n_li)) * day_us)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # events: same 30-day window, sorted by ts, Exp(50) values
    e_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * day_us
    ets = np.sort(e_lo + rng.integers(0, span, n_ev))
    etypes = ["signup", "click", "error", "view", "purchase"]
    n_users = int(1_500 * scale)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(etypes)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    vocab = np.array(
        "batch part spark line column order small sort fast value scan a "
        "hash slow group agg filter query big key window row table stream "
        "merge data vector join index read write".split()
    )
    assert len(vocab) == 31
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    lens = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, 31, L)]) for L in lens]
    # exact-duplicate rate ~8 pairs / 5k docs (profiled)
    for j in range(int(8 * scale)):
        texts[(j * 577 + 101) % n_doc] = texts[(j * 331) % n_doc]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(langs[rng.choice(5, n_doc, p=lang_p)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    emb = rng.normal(size=(n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scratch/sf{sf:g}"
    generate(sf, out)
    print(f"wrote sf{sf:g} -> {out}")
