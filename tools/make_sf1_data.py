"""Synthesize a full sf1 star schema (10x sf0.1) for benchmarking
(VERDICT r06 'Next round' #3: at sf0.1 half the catalog is
overhead-dominated; sf1 makes per-query regressions signal).

The driver's testdata tops out at sf0.1 and is read-only, so sf1 is
generated here by ROW BOOTSTRAP from sf0.1's empirical tables: sample
whole rows with replacement (every marginal distribution and intra-row
correlation is the empirical one by construction), then re-key
identities so relational structure stays exact and no key collides:

- customer/supplier/part: resampled rows, new sequential keys, names
  re-derived from the key pattern; foreign keys re-drawn uniformly over
  the scaled dimension (their sf0.1 relationship).
- orders: resampled rows (status/priority/price/date correlations
  kept), sequential o_orderkey, o_custkey over the scaled customers.
- lineitem: for each new order, the ENTIRE lineitem group of a sampled
  original order is copied and re-keyed — lines-per-order distribution
  and within-order structure are preserved exactly, part/supp keys
  re-drawn over the scaled dimensions.
- events: resampled rows; user population scaled by sharding (original
  user + 1500*shard keeps each synthetic user's event-type/value mix
  empirical); fresh uniform timestamps in the same 30-day window (10x
  arrival rate, same horizon — the streaming-window cardinality axis).
- documents/embeddings: the self-similar x10 corpora from
  make_scale_data.py (same 10x), copied in.
- region/nation: fixed dimensions, copied.

Row-group size 200k so Spark gets natural input splits.

Usage: python tools/make_sf1_data.py [OUT_DIR] [K]
  defaults: /root/scale_data/sf1, K=10
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
SEED = 20260814
ROW_GROUP = 200_000


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet", row_group_size=ROW_GROUP)
    print(f"  {name}: {table.num_rows} rows")


def _resample(t: pa.Table, n: int, rng) -> dict[str, np.ndarray | list]:
    idx = rng.integers(t.num_rows, size=n)
    return {c: t.column(c).take(pa.array(idx)) for c in t.column_names}, idx


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/scale_data/sf1")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(SEED + 7)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    # fixed dims
    for name in ("region", "nation"):
        shutil.copy(SRC / f"{name}.parquet", out / f"{name}.parquet")
        print(f"  {name}: copied")

    # --- customer ---------------------------------------------------------
    cust = pq.read_table(SRC / "customer.parquet")
    n_cust = cust.num_rows * k
    cols, _ = _resample(cust, n_cust, rng)
    keys = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(keys),
        "c_name": pa.array([f"Customer#{i:09d}" for i in keys]),
        "c_nationkey": cols["c_nationkey"],
        "c_acctbal": cols["c_acctbal"],
        "c_mktsegment": cols["c_mktsegment"],
    }))

    # --- supplier ---------------------------------------------------------
    supp = pq.read_table(SRC / "supplier.parquet")
    n_supp = supp.num_rows * k
    cols, _ = _resample(supp, n_supp, rng)
    keys = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(keys),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in keys]),
        "s_nationkey": cols["s_nationkey"],
        "s_acctbal": cols["s_acctbal"],
    }))

    # --- part -------------------------------------------------------------
    part = pq.read_table(SRC / "part.parquet")
    n_part = part.num_rows * k
    cols, _ = _resample(part, n_part, rng)
    keys = np.arange(n_part, dtype=np.int64)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(keys),
        "p_name": cols["p_name"],        # the 64-name pool — the fuzzy
        "p_brand": cols["p_brand"],       # reference join's dictionary
        "p_type": cols["p_type"],
        "p_size": cols["p_size"],
        # keep the sf0.1 retailprice pattern (900 + key/10)
        "p_retailprice": pa.array(np.round(900.0 + keys * 0.1, 1)),
    }))

    # --- orders -----------------------------------------------------------
    orders = pq.read_table(SRC / "orders.parquet")
    n_ord = orders.num_rows * k
    ocols, oidx = _resample(orders, n_ord, rng)
    okeys = np.arange(n_ord, dtype=np.int64)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(okeys),
        "o_custkey": pa.array(rng.integers(n_cust, size=n_ord).astype(np.int64)),
        "o_orderstatus": ocols["o_orderstatus"],
        "o_totalprice": ocols["o_totalprice"],
        "o_orderdate": ocols["o_orderdate"],
        "o_orderpriority": ocols["o_orderpriority"],
    }))

    # --- lineitem: copy each sampled original order's WHOLE line group ---
    li = pq.read_table(SRC / "lineitem.parquet").sort_by("l_orderkey")
    lkeys = li.column("l_orderkey").to_numpy()
    omax = int(orders.column("o_orderkey").to_numpy().max())
    starts = np.searchsorted(lkeys, np.arange(omax + 2))  # order -> slice
    src_orders = orders.column("o_orderkey").to_numpy()[oidx]
    counts = starts[src_orders + 1] - starts[src_orders]
    # vectorized gather of every sampled order's contiguous line block
    total = int(counts.sum())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    take = (
        np.arange(total)
        - np.repeat(offsets, counts)
        + np.repeat(starts[src_orders], counts)
    )
    g = {c: li.column(c).take(pa.array(take)) for c in li.column_names}
    n_li = len(take)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(np.repeat(okeys, counts)),
        "l_partkey": pa.array(rng.integers(n_part, size=n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(n_supp, size=n_li).astype(np.int64)),
        "l_linenumber": g["l_linenumber"],
        "l_quantity": g["l_quantity"],
        "l_extendedprice": g["l_extendedprice"],
        "l_discount": g["l_discount"],
        "l_tax": g["l_tax"],
        "l_returnflag": g["l_returnflag"],
        "l_linestatus": g["l_linestatus"],
        "l_shipdate": g["l_shipdate"],
    }))

    # --- events -----------------------------------------------------------
    ev = pq.read_table(SRC / "events.parquet")
    n_ev = ev.num_rows * k
    ecols, _ = _resample(ev, n_ev, rng)
    users = ecols["user_id"].to_numpy() + 1500 * rng.integers(k, size=n_ev)
    ts0 = ev.column("ts").cast(pa.int64()).to_numpy()
    lo, hi = ts0.min(), ts0.max()
    ts = np.sort(rng.integers(lo, hi, size=n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": ecols["event_type"],
        "value": ecols["value"],
        "props": ecols["props"],
    }))

    # --- documents / embeddings: the matching self-similar x{K} family ---
    xk = Path(f"/root/scale_data/x{k}")
    if xk.exists():
        for name in ("documents.parquet", "embeddings.parquet"):
            src = xk / name
            dst = out / name
            if src.is_dir():
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
            print(f"  {name}: copied from x{k}")
    else:
        print(f"  WARNING: /root/scale_data/x{k} missing — run make_scale_data.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
