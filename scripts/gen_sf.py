"""Deterministic scale-factor generator for the bench scaling study.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). Scaling
exponents need a SECOND measured point, so this script synthesizes
larger SFs with the SAME schema (parquet physical types verified
against the driver files) and the same marginal distributions,
measured from sf0.1:

- lineitem: orderkey uniform over orders (lines/order emerges
  Poisson(4), ~1.8% orders empty — matches the driver histogram),
  linenumber ~ U{1..7}, qty ~ U{1..50}, extendedprice ~ U(900, 105000)
  2dp, discount/tax = round(U(0,.1)/U(0,.08), 2), flag/status uniform
  over {A,N,R}x{O,F}, shipdate = orderdate + U{1..95} days.
- orders: dense keys, custkey uniform, status uniform {O,F,P},
  totalprice ~ U(1000, 500000) 2dp, whole-day orderdate
  U[1995-01-01, 2001-08-01], 5 TPC-H priorities.
- part/customer/supplier: TPC-H-style names, p_retailprice =
  900 + 0.1*(partkey % 1000) (exact driver relation), brands 1..25,
  6 types, sizes 1..50, acctbal ~ U(-1000, 10000).
- events: one month of sorted timestamps (exponential inter-arrival),
  users/values/types matching the driver marginals, props {"k": 0..99}.
- documents: the driver's 31-word vocabulary (recovered from sf0.1),
  U{10..100} words/doc, driver lang/source mixture, ~0.16% exact
  duplicates injected.
- embeddings: unit-norm float32 64-dim with the driver's weak label
  cohesion (~0.07 mean dot with the label centroid direction).
- region/nation: copied verbatim (fixed dimensions).

Row counts scale linearly from sf0.1 = (600k lineitem, 150k orders,
15k customer, 1k supplier, 20k part, 100k events, 5k documents, 2k
embeddings). Seeded numpy throughout -> byte-stable reruns.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "sort", "scan", "hash", "join", "query", "agg", "group",
    "filter", "order", "line", "part", "batch", "fast", "slow", "big",
    "small", "key", "data", "customer", "the", "a", "grid", "row",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dark"]
NOUN = ["ring", "bolt", "screw", "nut", "washer", "gear", "plate", "rod"]
TYPES = ["ECONOMY", "SMALL", "LARGE", "STANDARD", "PROMO", "MEDIUM"]
SEGS = ["AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENTS = ["click", "view", "purchase", "signup", "error"]

US_DAY = 86_400_000_000


def _write(out_dir, name, table):
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(name, table.num_rows)


def generate(
    sf: float,
    out_dir: str,
    src_dir: str = "/root/testdata/sf0.1",
    skew: bool = False,
):
    """``skew=True`` (round 10, VERDICT r9 #6) injects the three
    classic skew shapes the uniform generator cannot exercise:

    - documents: Zipf(1.5) source popularity (src0 takes ~55% of docs)
      and HEAVY-TAIL doc lengths (Pareto(1.3), median ~#uniform but a
      1% tail out to ~30x the uniform max, capped at 2000 words) — the
      shapes that break shingle-bucket and per-doc-quadratic text ops,
    - events: one HOT user (20% of all events on user 0) — the skewed
      aggregation/sessionization key,
    - lineitem: one HOT order (5% of all lines on orderkey 0) — the
      skewed join key AQE's skew-split exists for."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    k = sf / 0.1
    rng = np.random.default_rng(42)
    n_li = int(600_000 * k)
    n_ord = int(150_000 * k)
    n_cust = int(15_000 * k)
    n_supp = int(1_000 * k)
    n_part = int(20_000 * k)
    n_ev = int(100_000 * k)
    n_doc = int(5_000 * k)
    n_emb = int(2_000 * k)
    n_user = int(1_500 * k)

    for t in ("region", "nation"):
        _write(out_dir, t, pq.read_table(f"{src_dir}/{t}.parquet"))

    ts = pa.timestamp("us")
    epoch95 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
                 ).astype("timedelta64[D]").astype(int)

    # orders
    odate_day = rng.integers(0, span_days + 1, n_ord)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": pa.array(epoch95 + odate_day * US_DAY, type=ts),
        "o_orderpriority": pa.array(
            np.array(PRIOS)[rng.integers(0, 5, n_ord)]),
    })
    _write(out_dir, "orders", orders)

    # lineitem
    lok = rng.integers(0, n_ord, n_li)
    if skew:
        lok[rng.random(n_li) < 0.05] = 0  # one hot join key
    ship = epoch95 + (odate_day[lok] + rng.integers(1, 96, n_li)) * US_DAY
    lineitem = pa.table({
        "l_orderkey": pa.array(lok.astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship, type=ts),
    })
    _write(out_dir, "lineitem", lineitem)

    # customer / supplier / part
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))
    pk = np.arange(n_part, dtype=np.int64)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array([
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + 0.1 * (pk % 1000), 2)),
    }))

    # events: sorted timestamps over one month
    epoch24 = np.datetime64("2024-01-01", "us").astype("int64")
    gaps = rng.exponential(30.0 * US_DAY / n_ev, n_ev)
    tsv = epoch24 + np.cumsum(gaps).astype("int64")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(tsv, type=ts),
        "user_id": pa.array(
            np.where(rng.random(n_ev) < 0.2, 0,
                     rng.integers(0, n_user, n_ev)) if skew
            else rng.integers(0, n_user, n_ev)),
        "event_type": pa.array(np.array(EVENTS)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array(
            [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)]),
    }))

    # documents
    vocab = np.array(VOCAB)
    if skew:
        lens = np.minimum(
            10 + (20.0 * rng.pareto(1.3, n_doc)).astype(np.int64), 2000
        )
    else:
        lens = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    dup_at = rng.random(n_doc) < 0.0016
    for i in np.nonzero(dup_at)[0]:
        if i > 0:
            texts[i] = texts[rng.integers(0, i)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)]),
        "source": pa.array([
            f"src{v}" for v in (
                np.minimum(rng.zipf(1.5, n_doc) - 1, 19) if skew
                else rng.integers(0, 20, n_doc)
            )
        ]),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: weak label clusters, unit-norm float32
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    lab = rng.integers(0, 10, n_emb)
    x = rng.standard_normal((n_emb, 64)) + 0.57 * cents[lab]
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x32 = x.astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(x32), type=pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int32)),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    sf = float(args[0]) if args else 1.0
    default = f"/root/repo/testdata_sf{args[0] if args else '1'}" + (
        "_skew" if skew else ""
    )
    out = args[1] if len(args) > 1 else default
    generate(sf, out, skew=skew)
