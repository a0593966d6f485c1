#!/usr/bin/env python
"""Deterministic sf1 testdata builder (round-3 verdict item 1).

Replicates /root/testdata/sf0.1 10x into /tmp/graft_sf1 with
referential-integrity-preserving key shifts, so every queries() entry
AND its DuckDB oracle run unchanged over a 10x input:

- region/nation: fixed dimensions, copied once
- customer/supplier/part/orders/lineitem: replica r shifts every key of
  entity E by ``r * stride(E)`` (stride = max key + 1), so FK joins land
  exactly on the shifted copy of their parent row
- events: event_id/user_id shifted (10x users over the SAME time span —
  volume grows, the hour-grid/day censuses stay time-bounded, which is
  precisely the scaling the engine's driver-side bounds assume)
- documents: doc_id shifted; replica text carries a short replica tag so
  exact/near-dup pair structure grows ~10x, not 100x (identical texts
  would square the duplicate-pair count); n_chars recomputed
- embeddings: vec_id shifted; replicas > 0 get small deterministic
  per-replica noise so cosine-pair structure also stays ~linear

Everything is derived from the sf0.1 parquet + a fixed seed — no
external data, rebuildable bit-identically.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(os.environ.get("GRAFT_SF1_REPLICAS", "10"))


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _stride(t: pa.Table, col: str) -> int:
    return int(pc.max(t[col]).as_py()) + 1


def _shift(t: pa.Table, col: str, amount: int) -> pa.Table:
    i = t.column_names.index(col)
    return t.set_column(
        i, col, pc.add(pc.cast(t[col], pa.int64()), amount))


def _replicate(t: pa.Table, shifts: dict[str, int], r: int) -> pa.Table:
    out = t
    for col, stride in shifts.items():
        out = _shift(out, col, r * stride)
    return out


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, "_COMPLETE")
    if os.path.exists(marker):
        print(f"{DST} already built")
        return

    for name in ("region", "nation"):
        pq.write_table(_read(name), f"{DST}/{name}.parquet")

    cust = _read("customer")
    supp = _read("supplier")
    part = _read("part")
    orders = _read("orders")
    li = _read("lineitem")
    events = _read("events")
    docs = _read("documents")
    emb = _read("embeddings")

    k_c = _stride(cust, "c_custkey")
    k_s = _stride(supp, "s_suppkey")
    k_p = _stride(part, "p_partkey")
    k_o = _stride(orders, "o_orderkey")
    k_e = _stride(events, "event_id")
    k_u = _stride(events, "user_id")
    k_d = _stride(docs, "doc_id")
    k_v = _stride(emb, "vec_id")

    plans = {
        "customer": (cust, {"c_custkey": k_c}),
        "supplier": (supp, {"s_suppkey": k_s}),
        "part": (part, {"p_partkey": k_p}),
        "orders": (orders, {"o_orderkey": k_o, "o_custkey": k_c}),
        "lineitem": (li, {"l_orderkey": k_o, "l_partkey": k_p,
                          "l_suppkey": k_s}),
        "events": (events, {"event_id": k_e, "user_id": k_u}),
    }
    for name, (t, shifts) in plans.items():
        parts = [_replicate(t, shifts, r) for r in range(REPLICAS)]
        pq.write_table(pa.concat_tables(parts), f"{DST}/{name}.parquet")
        print(name, "x", REPLICAS, "->", sum(p.num_rows for p in parts))

    # documents: tag replica texts so dup-pair structure stays ~linear
    doc_parts = []
    base_text = docs["text"].to_pylist()
    for r in range(REPLICAS):
        t = _shift(docs, "doc_id", r * k_d)
        if r > 0:
            texts = [x + f" rep{r}" if x else x for x in base_text]
            t = t.set_column(t.column_names.index("text"), "text",
                             pa.array(texts, pa.string()))
            t = t.set_column(
                t.column_names.index("n_chars"), "n_chars",
                pa.array([len(x) if x else 0 for x in texts], pa.int64()))
        doc_parts.append(t)
    pq.write_table(pa.concat_tables(doc_parts), f"{DST}/documents.parquet")
    print("documents x", REPLICAS)

    # embeddings: per-replica deterministic noise keeps cosine pairs ~linear
    emb_parts = []
    mat = np.asarray(emb["embedding"].to_pylist(), np.float32)
    for r in range(REPLICAS):
        t = _shift(emb, "vec_id", r * k_v)
        if r > 0:
            rng = np.random.default_rng(1_000 + r)
            noisy = mat + rng.normal(0, 0.05, mat.shape).astype(np.float32)
            t = t.set_column(
                t.column_names.index("embedding"), "embedding",
                pa.array(list(noisy), pa.list_(pa.float32())))
        emb_parts.append(t)
    pq.write_table(pa.concat_tables(emb_parts), f"{DST}/embeddings.parquet")
    print("embeddings x", REPLICAS)

    open(marker, "w").close()
    print("sf1 testdata complete at", DST)


if __name__ == "__main__":
    main()
