"""TPC-H-shaped query surface, part 2 (Q3/Q6/Q10/Q14 and friends).

Continues the inventory in stages/relational.py (q1/q5/q17/q18/q21/q22
live there) and shares its contracts: the integer-cents money fold
(order-invariant sums, one divide at the end), the DIM_BROADCAST_ROWS
gate for dimension attaches (broadcast a sorted key array below the
gate, co-partitioned bucket_join above it), per-batch partial
aggregation before any exchange, and column-pruned parquet scans.

Schema adaptations (the driver tables are TPC-H-ish, not TPC-H): no
partsupp / l_commitdate / l_receiptdate / l_shipmode / o_shippriority
columns exist, so queries needing them substitute the nearest available
column and say so in their docstring.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ssufid_ray.stages.relational import (DIM_BROADCAST_ROWS, _cents,
                                          _dim_num_rows, bucket_join, read)

# ------------------------------------------------------------------ Q3


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cut: datetime = datetime(1997, 3, 15), k: int = 10,
                         broadcast_rows: int = DIM_BROADCAST_ROWS
                         ) -> pd.DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment,
    top-k orders. o_orderpriority stands in for the missing
    o_shippriority column.

    Plan: the segment's custkeys gate-attach to the filtered orders scan
    (broadcast sorted custkey array below the gate, bucket_join above);
    lineitem pre-aggregates (orderkey, rev-cents) per batch; the big-big
    orderkey join buckets both sides, each bucket's groupby is FINAL for
    its orderkeys (buckets partition the key space), so a per-bucket
    top-k + a <=64*k driver merge gives the exact global top-k with no
    global sort."""
    import pyarrow.parquet as pq

    od = (read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
          .map_batches(lambda t: t.filter(
              pc.less(t["o_orderdate"], pa.scalar(cut))),
              batch_format="pyarrow"))

    if _dim_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_rows:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        keys = cust["c_custkey"].to_numpy()[
            np.asarray(pc.equal(cust["c_mktsegment"], segment))]
        cref = ray.put(np.sort(keys.astype(np.int64)))

        def keep_segment(t: pa.Table) -> pa.Table:
            keys = ray.get(cref)
            ck = t["o_custkey"].to_numpy()
            idx = np.searchsorted(keys, ck)
            idx[idx >= keys.size] = 0
            return t.filter(pa.array(keys[idx] == ck)).drop(["o_custkey"])

        orders = od.map_batches(keep_segment, batch_format="pyarrow")
    else:
        def seg_keys(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["c_mktsegment"], segment))
            return pa.table({"custkey": f["c_custkey"],
                             "seg": pa.array([1] * len(f), pa.int64())})

        cust = (read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
                .map_batches(seg_keys, batch_format="pyarrow"))

        def post_seg(df: pd.DataFrame) -> pa.Table:
            return pa.table({
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "o_orderdate": pa.array(
                    df["o_orderdate"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(df["o_orderpriority"], pa.string())})

        orders = bucket_join(
            od.map_batches(lambda t: pa.table({
                "custkey": t["o_custkey"], "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_orderpriority": t["o_orderpriority"]}),
                batch_format="pyarrow"),
            cust, key="custkey",
            left_cols={"o_orderkey": pa.int64(),
                       "o_orderdate": pa.timestamp("us"),
                       "o_orderpriority": pa.string()},
            right_cols={"seg": pa.int64()},
            post=post_seg,
            out_schema=pa.schema([("o_orderkey", pa.int64()),
                                  ("o_orderdate", pa.timestamp("us")),
                                  ("o_orderpriority", pa.string())]))

    li = (read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])
          .map_batches(lambda t: t.filter(
              pc.greater(t["l_shipdate"], pa.scalar(cut))),
              batch_format="pyarrow"))

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _cents(t["l_extendedprice"].to_numpy()
                     * (1.0 - t["l_discount"].to_numpy()))
        df = pd.DataFrame({"orderkey": t["l_orderkey"].to_numpy(), "rev": rev})
        g = df.groupby("orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def post_topk(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["k", "o_orderdate", "o_orderpriority"],
                        as_index=False)["rev"].sum()
             .sort_values(["rev", "o_orderdate", "k"],
                          ascending=[False, True, True]).head(k))
        return pa.table({
            "orderkey": pa.array(g["k"].to_numpy(), pa.int64()),
            "rev": pa.array(g["rev"].to_numpy(), pa.int64()),
            "o_orderdate": pa.array(
                g["o_orderdate"].to_numpy().astype("datetime64[us]"),
                pa.timestamp("us")),
            "o_orderpriority": pa.array(g["o_orderpriority"], pa.string())})

    joined = bucket_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(lambda t: pa.table({
            "orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"]}),
            batch_format="pyarrow"),
        key="orderkey",
        left_cols={"rev": pa.int64()},
        right_cols={"o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()},
        post=post_topk,
        out_schema=pa.schema([("orderkey", pa.int64()), ("rev", pa.int64()),
                              ("o_orderdate", pa.timestamp("us")),
                              ("o_orderpriority", pa.string())]))

    out = joined.to_pandas()  # <= 64*k candidate rows
    out = (out.sort_values(["rev", "o_orderdate", "orderkey"],
                           ascending=[False, True, True]).head(k)
           .reset_index(drop=True))
    out["revenue"] = out["rev"] / 100.0
    return out[["orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


Q3_SQL = """
SELECT l_orderkey AS orderkey,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, orderkey LIMIT 10
"""


# ------------------------------------------------------------------ Q6


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: single filtered scan-aggregate, no exchange at all
    — the predicate and the cents product vectorize per batch and
    Dataset.sum folds the per-block partials in a tree."""
    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    ds = read(sf_dir, "lineitem",
              ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_discount"].to_numpy()
        sd = t["l_shipdate"].to_numpy()
        keep = ((sd >= np.datetime64(lo)) & (sd < np.datetime64(hi))
                & (d >= 0.05) & (d <= 0.07)
                & (t["l_quantity"].to_numpy() < 24))
        rev = _cents(t["l_extendedprice"].to_numpy()[keep] * d[keep])
        return pa.table({"rev": pa.array([int(rev.sum())], pa.int64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("rev")
    return pd.DataFrame({"revenue": [total / 100.0]})


Q6_SQL = """
SELECT SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
               AS BIGINT)) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ----------------------------------------------------------------- Q10


def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 shape: lost-revenue per customer from returned items in
    one quarter, top-k customers. The orderkey join is big-big
    (bucket_join with lineitem pre-aggregated per batch); per-bucket
    output collapses to (custkey, rev) partials, a Sum groupby folds
    them, per-batch partial top-k bounds the driver merge, and the
    name/acctbal/nation decoration reads only the k winning customer
    rows (a 20-key filtered dimension read, never the whole table)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = datetime(1996, 10, 1), datetime(1997, 1, 1)
    def od_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        return pa.table({"orderkey": f["o_orderkey"],
                         "custkey": f["o_custkey"]})

    od = (read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
          .map_batches(od_filter, batch_format="pyarrow"))

    li = (read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
          .map_batches(lambda t: t.filter(
              pc.equal(t["l_returnflag"], "R")), batch_format="pyarrow"))

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _cents(t["l_extendedprice"].to_numpy()
                     * (1.0 - t["l_discount"].to_numpy()))
        df = pd.DataFrame({"orderkey": t["l_orderkey"].to_numpy(), "rev": rev})
        g = df.groupby("orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def post(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("custkey", as_index=False)["rev"].sum()
        return pa.table({"custkey": pa.array(g["custkey"].to_numpy(), pa.int64()),
                         "rev": pa.array(g["rev"].to_numpy(), pa.int64())})

    per_cust = (bucket_join(
        li.map_batches(li_partial, batch_format="pyarrow"), od,
        key="orderkey",
        left_cols={"rev": pa.int64()},
        right_cols={"custkey": pa.int64()},
        post=post,
        out_schema=pa.schema([("custkey", pa.int64()), ("rev", pa.int64())]))
        .groupby("custkey").aggregate(Sum("rev", alias_name="rev")))

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("rev", "descending"),
                                            ("custkey", "ascending")])
        return t.take(idx[:k])

    out = per_cust.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (out.sort_values(["rev", "custkey"], ascending=[False, True])
           .head(k).reset_index(drop=True))

    # decorate the k winners only: filtered dimension reads
    winners = out["custkey"].to_numpy()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", winners.tolist())]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    cust = cust.merge(nat[["n_nationkey", "n_name"]],
                      left_on="c_nationkey", right_on="n_nationkey")
    out = out.merge(cust[["c_custkey", "c_name", "c_acctbal", "n_name"]],
                    left_on="custkey", right_on="c_custkey")
    out["revenue"] = out["rev"] / 100.0
    out = out[["custkey", "c_name", "revenue", "c_acctbal", "n_name"]]
    return (out.sort_values(["revenue", "custkey"], ascending=[False, True])
            .reset_index(drop=True))


Q10_SQL = """
SELECT c_custkey AS custkey, c_name,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, custkey LIMIT 20
"""


# ----------------------------------------------------------------- Q14


def q14_promo_revenue(sf_dir: str,
                      broadcast_rows: int = DIM_BROADCAST_ROWS
                      ) -> pd.DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one ship month.
    Part attach is gated: below the gate a broadcast sorted
    (partkey, is_promo) pair of arrays resolves per batch with
    searchsorted; above it the partkey bucket_join runs with lineitem
    pre-aggregated per (partkey, batch). Both sides of the percentage
    are exact int64 cents; the single double divide happens once."""
    import pyarrow.parquet as pq

    lo, hi = datetime(1996, 9, 1), datetime(1996, 10, 1)
    li = (read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
          .map_batches(lambda t: t.filter(pc.and_(
              pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
              pc.less(t["l_shipdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))

    if _dim_num_rows(f"{sf_dir}/part.parquet") <= broadcast_rows:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        pk = part["p_partkey"].to_numpy().astype(np.int64)
        promo = np.asarray(pc.equal(part["p_type"], "PROMO")).astype(np.int64)
        order = np.argsort(pk)
        pref = ray.put((pk[order], promo[order]))

        def partial(t: pa.Table) -> pa.Table:
            keys, is_promo = ray.get(pref)
            rev = _cents(t["l_extendedprice"].to_numpy()
                         * (1.0 - t["l_discount"].to_numpy()))
            idx = np.searchsorted(keys, t["l_partkey"].to_numpy())
            idx[idx >= keys.size] = 0
            flag = np.where(keys[idx] == t["l_partkey"].to_numpy(),
                            is_promo[idx], 0)
            return pa.table({
                "promo": pa.array([int(rev[flag == 1].sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64())})

        partials = li.map_batches(partial, batch_format="pyarrow")
    else:
        def li_partial(t: pa.Table) -> pa.Table:
            rev = _cents(t["l_extendedprice"].to_numpy()
                         * (1.0 - t["l_discount"].to_numpy()))
            df = pd.DataFrame({"partkey": t["l_partkey"].to_numpy(),
                               "rev": rev})
            g = df.groupby("partkey", as_index=False)["rev"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        def post(df: pd.DataFrame) -> pa.Table:
            rev = df["rev"].to_numpy()
            flag = df["is_promo"].to_numpy()
            return pa.table({
                "promo": pa.array([int(rev[flag == 1].sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64())})

        partials = bucket_join(
            li.map_batches(li_partial, batch_format="pyarrow"),
            read(sf_dir, "part", ["p_partkey", "p_type"])
            .map_batches(lambda t: pa.table({
                "partkey": t["p_partkey"],
                "is_promo": pc.cast(pc.equal(t["p_type"], "PROMO"),
                                    pa.int64())}), batch_format="pyarrow"),
            key="partkey",
            left_cols={"rev": pa.int64()},
            right_cols={"is_promo": pa.int64()},
            post=post,
            out_schema=pa.schema([("promo", pa.int64()),
                                  ("total", pa.int64())]))

    agg = partials.sum(["promo", "total"])
    promo, total = agg["sum(promo)"], agg["sum(total)"]
    return pd.DataFrame({"promo_pct": [100.0 * promo / total]})


Q14_SQL = """
SELECT 100.0 * SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT) ELSE 0 END)
     / SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS promo_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""
