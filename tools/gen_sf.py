"""Regenerate a larger measurement tier (default sf1.0) statistically matched
to the driver's deterministic synthetic testdata.

The driver's own large-sf dir is not retained between sessions; this replica
reproduces the same schema, row-count scaling (sf0.001/0.01/0.1 ratios
extrapolated), key ranges, and value distributions observed in
/root/testdata/sf0.1 so that timing measurements at the driver's MEASUREMENT
scale are representative. It is NOT used for correctness grading (that stays
on the driver's own sf0.001/0.01 dirs) and is never read by any declared
query unless $SPARK_GRAFT_SF_DIR points at it.

Usage: python tools/gen_sf.py [out_dir] [scale_mult]
Defaults: /root/sfgen/sf1.0, 10 (x sf0.1 row counts).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
VOCAB = None  # filled from sf0.1 documents

# The driver's testdata files are each ONE parquet row group (observed at
# every retained tier) — scans of them serialize into one task unless the
# query widens. The replica must reproduce that layout or measurements
# overstate scan parallelism.
def _write(out_dir, name, table, row_group_size=None):
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=row_group_size or max(table.num_rows, 1),
    )
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng, n):
    src = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    words = sorted({w for t in src.text for w in t.split()})
    langs = ["en", "zh", "es", "fr", "de"]
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    lang_p = lang_p / lang_p.sum()
    lang_idx = rng.choice(len(langs), size=n, p=lang_p)
    lens = rng.integers(10, 101, size=n)
    wi = rng.integers(0, len(words), size=int(lens.sum()))
    texts = []
    off = 0
    warr = np.array(words)
    for L in lens:
        texts.append(" ".join(warr[wi[off : off + L]]))
        off += L
    # exact-duplicate injection at the sf0.1 rate (8/5000)
    n_dup = max(1, round(n * 8 / 5000))
    dup_to = rng.choice(n, size=n_dup, replace=False)
    dup_from = rng.choice(n, size=n_dup, replace=False)
    for a, b in zip(dup_to, dup_from):
        if a != b:
            texts[a] = texts[b]
    texts = np.array(texts, dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(np.array(langs)[lang_idx], pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng, n, dim=64, k=10):
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    # cluster spread calibrated to the driver's near-pair density: sf0.1
    # (2000 vecs) emits 783 pairs at threshold 0.4 / rings 2 -> pair
    # fraction ~4e-4; center weight 0.12 reproduces ~5e-4 (the 0.55 of
    # the first replica gave 9e-2 -> 16.8M pairs at sf1.0, 200x the
    # driver's 83k, drowning the timing in survivor handling)
    v = centers[labels] * 0.12 + rng.normal(size=(n, dim)) * 0.55 / np.sqrt(dim)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row for row in v.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def gen_events(rng, n, n_users):
    types = np.array(["view", "click", "purchase", "signup", "error"])
    ts0 = np.datetime64("2024-01-01T00:00:00")
    ts = ts0 + (rng.integers(0, 30 * 86400 * 10**6, size=n)).astype(
        "timedelta64[us]"
    )
    ts = np.sort(ts) if False else ts
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            "value": pa.array(
                np.round(
                    np.abs(rng.exponential(50.0, size=n)).clip(0, 560), 2
                ),
                pa.float64(),
            ),
            "props": pa.array(
                [f'{{"k": {v}}}' for v in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def gen_customer(rng, n):
    segs = np.array(
        ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    )
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n), 2), pa.float64()
            ),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, size=n)], pa.string()),
        }
    )


def gen_supplier(rng, n):
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n)], pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32), pa.int32()
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n), 2), pa.float64()
            ),
        }
    )


def gen_part(rng, n):
    src = pq.read_table(os.path.join(SRC, "part.parquet")).to_pandas()
    name_words = sorted({w for t in src.p_name for w in t.split()})
    types = sorted(src.p_type.unique())
    nw = np.array(name_words)
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n), pa.int64()),
            "p_name": pa.array(
                [
                    " ".join(nw[rng.integers(0, len(nw), size=2)])
                    for _ in range(n)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{v}" for v in rng.integers(1, 26, size=n)], pa.string()
            ),
            "p_type": pa.array(
                np.array(types)[rng.integers(0, len(types), size=n)], pa.string()
            ),
            "p_size": pa.array(
                rng.integers(1, 51, size=n).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900, 2000, size=n), 2), pa.float64()
            ),
        }
    )


def gen_orders_lineitem(rng, n_orders, n_cust, n_part, n_supp):
    statuses = np.array(["P", "O", "F"])
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    d0 = np.datetime64("1995-01-01")
    odate = d0 + rng.integers(0, 2404, size=n_orders).astype("timedelta64[D]")
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, size=n_orders), pa.int64()
            ),
            "o_orderstatus": pa.array(
                statuses[rng.integers(0, 3, size=n_orders)], pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, size=n_orders), 2),
                pa.float64(),
            ),
            "o_orderdate": pa.array(
                odate.astype("datetime64[us]"), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                prios[rng.integers(0, 5, size=n_orders)], pa.string()
            ),
        }
    )
    # ~4 lineitems/order, 1..17
    per = rng.poisson(3.07, size=n_orders) + 1
    per = per.clip(1, 17)
    n_li = int(per.sum())
    okey = np.repeat(np.arange(n_orders), per)
    linenum = np.concatenate([np.arange(1, c + 1) for c in per]).astype(np.int32)
    sdate = np.repeat(odate, per) + rng.integers(
        1, 95, size=n_li
    ).astype("timedelta64[D]")
    rf = np.array(["N", "R", "A"])
    ls = np.array(["F", "O"])
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
            "l_linenumber": pa.array(linenum, pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n_li).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, size=n_li), 2), pa.float64()
            ),
            "l_discount": pa.array(
                rng.integers(0, 11, size=n_li) / 100.0, pa.float64()
            ),
            "l_tax": pa.array(
                rng.integers(0, 9, size=n_li) / 100.0, pa.float64()
            ),
            "l_returnflag": pa.array(rf[rng.integers(0, 3, size=n_li)], pa.string()),
            "l_linestatus": pa.array(ls[rng.integers(0, 2, size=n_li)], pa.string()),
            "l_shipdate": pa.array(
                sdate.astype("datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    return orders, lineitem


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfgen/sf1.0"
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(15000 * mult)
    n_supp = int(1000 * mult)
    n_part = int(20000 * mult)
    n_orders = int(150000 * mult)
    print(f"generating into {out_dir} (x{mult})")
    # small dims copied verbatim
    for t in ("region", "nation"):
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        _write(out_dir, t, tbl, row_group_size=max(tbl.num_rows, 1))
    _write(out_dir, "documents", gen_documents(rng, int(5000 * mult)))
    _write(out_dir, "embeddings", gen_embeddings(rng, int(2000 * mult)))
    _write(out_dir, "events", gen_events(rng, int(100000 * mult), n_cust))
    _write(out_dir, "customer", gen_customer(rng, n_cust))
    _write(out_dir, "supplier", gen_supplier(rng, n_supp))
    _write(out_dir, "part", gen_part(rng, n_part))
    o, li = gen_orders_lineitem(rng, n_orders, n_cust, n_part, n_supp)
    _write(out_dir, "orders", o)
    _write(out_dir, "lineitem", li)
    print("done")


if __name__ == "__main__":
    main()
