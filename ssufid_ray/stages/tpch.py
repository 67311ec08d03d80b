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
    if not agg or agg.get("sum(total)") in (None, 0):
        # no matching lineitem rows: SQL SUM() is NULL -> NULL ratio
        return pd.DataFrame({"promo_pct": [float("nan")]})
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


# ------------------------------------------------------------------ Q4


def q4_order_priority(sf_dir: str, late_days: int = 90) -> pd.DataFrame:
    """TPC-H Q4 shape: priority histogram of orders with at least one
    late lineitem (EXISTS). The missing l_commitdate/l_receiptdate pair
    is adapted to "shipped more than `late_days` after the order date".

    The EXISTS collapses before the exchange: lineitem pre-aggregates
    max(l_shipdate) per orderkey per batch, the orderkey bucket_join
    folds the partials against each order row, and only (priority,
    count) partials leave each bucket."""
    from ray.data.aggregate import Sum

    lo, hi = datetime(1996, 7, 1), datetime(1996, 10, 1)

    def od_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        return pa.table({"orderkey": f["o_orderkey"],
                         "o_orderdate": f["o_orderdate"],
                         "o_orderpriority": f["o_orderpriority"]})

    od = (read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])
          .map_batches(od_filter, batch_format="pyarrow"))

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"orderkey": t["l_orderkey"].to_numpy(),
                           "max_ship": t["l_shipdate"].to_numpy()})
        g = df.groupby("orderkey", as_index=False)["max_ship"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = (read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
          .map_batches(li_partial, batch_format="pyarrow"))

    margin = np.timedelta64(late_days, "D")

    def post(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", as_index=False).agg(
            max_ship=("max_ship", "max"),
            o_orderdate=("o_orderdate", "first"),
            o_orderpriority=("o_orderpriority", "first"))
        late = g[g["max_ship"].to_numpy()
                 > g["o_orderdate"].to_numpy() + margin]
        c = late.groupby("o_orderpriority", as_index=False).size()
        return pa.table({
            "o_orderpriority": pa.array(c["o_orderpriority"], pa.string()),
            "order_count": pa.array(c["size"].to_numpy(), pa.int64())})

    out = (bucket_join(
        li, od, key="orderkey",
        left_cols={"max_ship": pa.timestamp("us")},
        right_cols={"o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()},
        post=post,
        out_schema=pa.schema([("o_orderpriority", pa.string()),
                              ("order_count", pa.int64())]))
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                             "order_count": pd.Series(dtype="int64")})
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------------------------------------ Q7


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       broadcast_rows: int = DIM_BROADCAST_ROWS
                       ) -> pd.DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Supplier and customer attaches are gated (sorted-array
    broadcast vs bucket_join); the lineitem-orders hop is always the
    big-big orderkey bucket_join with lineitem collapsed to
    (orderkey, snat, year, rev) partials first."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    nkey = {n["n_name"]: n["n_nationkey"] for n in nat}
    ka, kb = nkey[nation_a], nkey[nation_b]
    names = {ka: nation_a, kb: nation_b}

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    li = (read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])
          .map_batches(lambda t: t.filter(pc.and_(
              pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
              pc.less(t["l_shipdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))

    # supplier attach -> (orderkey, snat, year, rev) partials
    if _dim_num_rows(f"{sf_dir}/supplier.parquet") <= broadcast_rows:
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sk = sup["s_suppkey"].to_numpy().astype(np.int64)
        sn = sup["s_nationkey"].to_numpy().astype(np.int64)
        order = np.argsort(sk)
        sref = ray.put((sk[order], sn[order]))

        def attach_s(t: pa.Table) -> pa.Table:
            keys, nats = ray.get(sref)
            skv = t["l_suppkey"].to_numpy()
            idx = np.searchsorted(keys, skv)
            idx[idx >= keys.size] = 0
            snat = np.where(keys[idx] == skv, nats[idx], -1)
            keep = (snat == ka) | (snat == kb)
            rev = _cents(t["l_extendedprice"].to_numpy()[keep]
                         * (1.0 - t["l_discount"].to_numpy()[keep]))
            df = pd.DataFrame({
                "orderkey": t["l_orderkey"].to_numpy()[keep],
                "snat": snat[keep],
                "l_year": t["l_shipdate"].to_numpy()[keep]
                .astype("datetime64[Y]").astype(np.int64) + 1970,
                "rev": rev})
            g = df.groupby(["orderkey", "snat", "l_year"],
                           as_index=False)["rev"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        li_sn = li.map_batches(attach_s, batch_format="pyarrow")
    else:
        def li_thin(t: pa.Table) -> pa.Table:
            rev = _cents(t["l_extendedprice"].to_numpy()
                         * (1.0 - t["l_discount"].to_numpy()))
            return pa.table({
                "suppkey": t["l_suppkey"],
                "orderkey": t["l_orderkey"],
                "l_year": pa.array(
                    t["l_shipdate"].to_numpy().astype("datetime64[Y]")
                    .astype(np.int64) + 1970, pa.int64()),
                "rev": pa.array(rev, pa.int64())})

        def sup_thin(t: pa.Table) -> pa.Table:
            f = t.filter(pc.or_(pc.equal(t["s_nationkey"], ka),
                                pc.equal(t["s_nationkey"], kb)))
            return pa.table({"suppkey": f["s_suppkey"],
                             "snat": pc.cast(f["s_nationkey"], pa.int64())})

        def post_s(df: pd.DataFrame) -> pa.Table:
            g = df.groupby(["orderkey", "snat", "l_year"],
                           as_index=False)["rev"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        li_sn = bucket_join(
            li.map_batches(li_thin, batch_format="pyarrow"),
            read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
            .map_batches(sup_thin, batch_format="pyarrow"),
            key="suppkey",
            left_cols={"orderkey": pa.int64(), "l_year": pa.int64(),
                       "rev": pa.int64()},
            right_cols={"snat": pa.int64()},
            post=post_s,
            out_schema=pa.schema([("orderkey", pa.int64()),
                                  ("snat", pa.int64()),
                                  ("l_year", pa.int64()),
                                  ("rev", pa.int64())]))

    # orders -> custkey -> cnat (gated), pre-filtered to the two nations
    if _dim_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_rows:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        ck = cust["c_custkey"].to_numpy().astype(np.int64)
        cn = cust["c_nationkey"].to_numpy().astype(np.int64)
        order = np.argsort(ck)
        cref = ray.put((ck[order], cn[order]))

        def od_attach(t: pa.Table) -> pa.Table:
            keys, nats = ray.get(cref)
            ckv = t["o_custkey"].to_numpy()
            idx = np.searchsorted(keys, ckv)
            idx[idx >= keys.size] = 0
            cnat = np.where(keys[idx] == ckv, nats[idx], -1)
            keep = (cnat == ka) | (cnat == kb)
            return pa.table({
                "orderkey": pa.array(t["o_orderkey"].to_numpy()[keep],
                                     pa.int64()),
                "cnat": pa.array(cnat[keep], pa.int64())})

        od = (read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
              .map_batches(od_attach, batch_format="pyarrow"))
    else:
        def cust_thin(t: pa.Table) -> pa.Table:
            f = t.filter(pc.or_(pc.equal(t["c_nationkey"], ka),
                                pc.equal(t["c_nationkey"], kb)))
            return pa.table({"custkey": f["c_custkey"],
                             "cnat": pc.cast(f["c_nationkey"], pa.int64())})

        def post_c(df: pd.DataFrame) -> pa.Table:
            return pa.table({
                "orderkey": pa.array(df["orderkey"].to_numpy(), pa.int64()),
                "cnat": pa.array(df["cnat"].to_numpy(), pa.int64())})

        od = bucket_join(
            read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
            .map_batches(lambda t: pa.table(
                {"custkey": t["o_custkey"], "orderkey": t["o_orderkey"]}),
                batch_format="pyarrow"),
            read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .map_batches(cust_thin, batch_format="pyarrow"),
            key="custkey",
            left_cols={"orderkey": pa.int64()},
            right_cols={"cnat": pa.int64()},
            post=post_c,
            out_schema=pa.schema([("orderkey", pa.int64()),
                                  ("cnat", pa.int64())]))

    def post_j(df: pd.DataFrame) -> pa.Table:
        # keep only cross-nation flows (a->b or b->a)
        keep = df["snat"].to_numpy() != df["cnat"].to_numpy()
        g = (df[keep].groupby(["snat", "cnat", "l_year"], as_index=False)
             ["rev"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (bucket_join(
        li_sn, od, key="orderkey",
        left_cols={"snat": pa.int64(), "l_year": pa.int64(),
                   "rev": pa.int64()},
        right_cols={"cnat": pa.int64()},
        post=post_j,
        out_schema=pa.schema([("snat", pa.int64()), ("cnat", pa.int64()),
                              ("l_year", pa.int64()), ("rev", pa.int64())]))
        .groupby(["snat", "cnat", "l_year"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"supp_nation": pd.Series(dtype="object"),
                             "cust_nation": pd.Series(dtype="object"),
                             "l_year": pd.Series(dtype="int64"),
                             "revenue": pd.Series(dtype="float64")})
    out["supp_nation"] = out["snat"].map(names)
    out["cust_nation"] = out["cnat"].map(names)
    out["revenue"] = out["rev"] / 100.0
    out = out[["supp_nation", "cust_nation", "l_year", "revenue"]]
    return (out.sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ------------------------------------------------------------------ Q9


def q9_product_profit(sf_dir: str, name_word: str = "red",
                      broadcast_rows: int = DIM_BROADCAST_ROWS
                      ) -> pd.DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts whose
    name contains one word. Adaptations: profit = revenue minus
    p_retailprice*quantity (no partsupp/ps_supplycost exists), and the
    year is the ship year (saves the third join; orders carries nothing
    else we need).

    Both dimension attaches are gated; the part attach also carries the
    retail price so the profit is computed inside the lineitem batch and
    only (suppkey, year, profit) partials cross the exchange."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    li = read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
               "l_extendedprice", "l_discount"])

    # part attach: keep matching parts, compute profit cents per row
    if _dim_num_rows(f"{sf_dir}/part.parquet") <= broadcast_rows:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_name", "p_retailprice"])
        m = np.asarray(pc.match_substring(part["p_name"], name_word))
        pk = part["p_partkey"].to_numpy().astype(np.int64)[m]
        price = part["p_retailprice"].to_numpy()[m]
        order = np.argsort(pk)
        pref = ray.put((pk[order], price[order]))

        def attach_p(t: pa.Table) -> pa.Table:
            keys, price = ray.get(pref)
            pkv = t["l_partkey"].to_numpy()
            if keys.size == 0:
                return pa.table({"suppkey": pa.array([], pa.int64()),
                                 "l_year": pa.array([], pa.int64()),
                                 "profit": pa.array([], pa.int64())})
            idx = np.searchsorted(keys, pkv)
            idx[idx >= keys.size] = 0
            keep = keys[idx] == pkv
            profit = (_cents(t["l_extendedprice"].to_numpy()[keep]
                             * (1.0 - t["l_discount"].to_numpy()[keep]))
                      - _cents(price[idx[keep]]
                               * t["l_quantity"].to_numpy()[keep]))
            df = pd.DataFrame({
                "suppkey": t["l_suppkey"].to_numpy()[keep],
                "l_year": t["l_shipdate"].to_numpy()[keep]
                .astype("datetime64[Y]").astype(np.int64) + 1970,
                "profit": profit})
            g = df.groupby(["suppkey", "l_year"], as_index=False)["profit"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        li_p = li.map_batches(attach_p, batch_format="pyarrow")
    else:
        def li_thin(t: pa.Table) -> pa.Table:
            return pa.table({
                "partkey": t["l_partkey"],
                "suppkey": t["l_suppkey"],
                "l_year": pa.array(
                    t["l_shipdate"].to_numpy().astype("datetime64[Y]")
                    .astype(np.int64) + 1970, pa.int64()),
                "rev": pa.array(_cents(
                    t["l_extendedprice"].to_numpy()
                    * (1.0 - t["l_discount"].to_numpy())), pa.int64()),
                "qty": pa.array(t["l_quantity"].to_numpy(), pa.float64())})

        def part_thin(t: pa.Table) -> pa.Table:
            f = t.filter(pc.match_substring(t["p_name"], name_word))
            return pa.table({"partkey": f["p_partkey"],
                             "price": pc.cast(f["p_retailprice"],
                                              pa.float64())})

        def post_p(df: pd.DataFrame) -> pa.Table:
            profit = (df["rev"].to_numpy()
                      - _cents(df["price"].to_numpy() * df["qty"].to_numpy()))
            g = (pd.DataFrame({"suppkey": df["suppkey"].to_numpy(),
                               "l_year": df["l_year"].to_numpy(),
                               "profit": profit})
                 .groupby(["suppkey", "l_year"], as_index=False)["profit"].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

        li_p = bucket_join(
            li.map_batches(li_thin, batch_format="pyarrow"),
            read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
            .map_batches(part_thin, batch_format="pyarrow"),
            key="partkey",
            left_cols={"suppkey": pa.int64(), "l_year": pa.int64(),
                       "rev": pa.int64(), "qty": pa.float64()},
            right_cols={"price": pa.float64()},
            post=post_p,
            out_schema=pa.schema([("suppkey", pa.int64()),
                                  ("l_year", pa.int64()),
                                  ("profit", pa.int64())]))

    # supplier attach -> nation
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    if _dim_num_rows(f"{sf_dir}/supplier.parquet") <= broadcast_rows:
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sk = sup["s_suppkey"].to_numpy().astype(np.int64)
        sn = sup["s_nationkey"].to_numpy().astype(np.int64)
        order = np.argsort(sk)
        sref = ray.put((sk[order], sn[order]))

        def attach_n(t: pa.Table) -> pa.Table:
            keys, nats = ray.get(sref)
            skv = t["suppkey"].to_numpy()
            idx = np.searchsorted(keys, skv)
            idx[idx >= keys.size] = 0
            snat = np.where(keys[idx] == skv, nats[idx], -1)
            df = pd.DataFrame({"snat": snat, "l_year": t["l_year"].to_numpy(),
                               "profit": t["profit"].to_numpy()})
            g = df.groupby(["snat", "l_year"], as_index=False)["profit"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = li_p.map_batches(attach_n, batch_format="pyarrow")
    else:
        def post_n(df: pd.DataFrame) -> pa.Table:
            g = (df.rename(columns={"s_nationkey": "snat"})
                 .groupby(["snat", "l_year"], as_index=False)["profit"].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = bucket_join(
            li_p, read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
            .map_batches(lambda t: pa.table(
                {"suppkey": t["s_suppkey"],
                 "s_nationkey": pc.cast(t["s_nationkey"], pa.int64())}),
                batch_format="pyarrow"),
            key="suppkey",
            left_cols={"l_year": pa.int64(), "profit": pa.int64()},
            right_cols={"s_nationkey": pa.int64()},
            post=post_n,
            out_schema=pa.schema([("snat", pa.int64()),
                                  ("l_year", pa.int64()),
                                  ("profit", pa.int64())]))

    out = (partials.groupby(["snat", "l_year"])
           .aggregate(Sum("profit", alias_name="profit")).to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "l_year": pd.Series(dtype="int64"),
                             "profit": pd.Series(dtype="float64")})
    out["n_name"] = out["snat"].map(names)
    out["profit"] = out["profit"] / 100.0
    out = out[["n_name", "l_year", "profit"]]
    return out.sort_values(["n_name", "l_year"]).reset_index(drop=True)


Q9_SQL = """
SELECT n_name,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
         - CAST(floor(p_retailprice * l_quantity * 100 + 0.5) AS BIGINT))
       / 100.0 AS profit
FROM lineitem, part, supplier, nation
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
GROUP BY n_name, l_year ORDER BY n_name, l_year
"""


# ----------------------------------------------------------------- Q15


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter — a scalar-subquery max against a derived aggregate. The
    per-supplier fold is partial-then-groupby; the global max folds as a
    Dataset.max over the (small) per-supplier result, and only the
    winning suppkeys decorate via a filtered dimension read."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    li = (read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
          .map_batches(lambda t: t.filter(pc.and_(
              pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
              pc.less(t["l_shipdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(t["l_extendedprice"].to_numpy()
                     * (1.0 - t["l_discount"].to_numpy()))
        df = pd.DataFrame({"suppkey": t["l_suppkey"].to_numpy(), "rev": rev})
        g = df.groupby("suppkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("suppkey").aggregate(Sum("rev", alias_name="rev"))
                .materialize())
    best = per_supp.max("rev")
    if best is None:  # empty revenue window: no winners
        return pd.DataFrame({"suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series([], dtype="float64")})
    winners = (per_supp.filter(expr=f"rev == {best}").to_pandas()
               .sort_values("suppkey").reset_index(drop=True))

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", winners["suppkey"].tolist())]).to_pandas()
    out = winners.merge(sup, left_on="suppkey", right_on="s_suppkey")
    out["total_revenue"] = out["rev"] / 100.0
    return (out[["suppkey", "s_name", "total_revenue"]]
            .sort_values("suppkey").reset_index(drop=True))


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey AS suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY suppkey
"""


# =================================================================== part 3
# Q2/Q8/Q12/Q16/Q19/Q20 shapes. These share ONE gated dimension-attach
# helper so the broadcast and co-partitioned paths feed the same
# post(df) partial — threshold-0 parity holds by construction.


def gated_attach(fact: "ray.data.Dataset", fact_key: str, fact_cols: dict,
                 sf_dir: str, dim_table: str, dim_key: str, payload: dict,
                 post, out_schema: pa.Schema,
                 broadcast_rows: int = DIM_BROADCAST_ROWS,
                 dim_filter=None) -> "ray.data.Dataset":
    """Shared gated INNER dimension attach. Below `broadcast_rows` the
    dim's (filtered) key->payload columns broadcast once via ray.put and
    each fact batch attaches with a sorted-array searchsorted; above it
    the same attach runs as a co-partitioned `bucket_join`. Both paths
    hand the SAME frame shape to post: columns ("k", *fact_cols,
    *payload) with only matched fact rows — so post must be a
    merge-invariant partial (sum / count / dedupe / min), and forcing
    broadcast_rows=0 is an exact parity probe.

    fact: Dataset whose batches are already thin (fact_key + fact_cols).
    payload: {dim_col: arrow type} attached from the dim (first one is
    bucket_join's side marker: must be non-null on every dim row).
    dim_filter: optional pa.Table -> BooleanArray row filter on the dim.
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{dim_table}.parquet"
    if _dim_num_rows(path) <= broadcast_rows:
        dim = pq.read_table(path, columns=[dim_key, *payload])
        if dim_filter is not None:
            dim = dim.filter(dim_filter(dim))
        keys = dim[dim_key].to_numpy().astype(np.int64)
        order = np.argsort(keys)
        pay = {c: dim[c].to_numpy(zero_copy_only=False)[order]
               for c in payload}
        ref = ray.put((keys[order], pay))

        def attach(t: pa.Table) -> pa.Table:
            keys, pay = ray.get(ref)
            kv = pc.cast(t[fact_key], pa.int64()).to_numpy()
            if keys.size == 0 or len(kv) == 0:
                return out_schema.empty_table()
            idx = np.searchsorted(keys, kv)
            idx[idx >= keys.size] = 0
            found = keys[idx] == kv
            if not found.any():
                return out_schema.empty_table()
            sel = idx[found]
            cols = {"k": kv[found]}
            for c in fact_cols:
                cols[c] = t[c].to_numpy(zero_copy_only=False)[found]
            for c in payload:
                cols[c] = pay[c][sel]
            return post(pd.DataFrame(cols))

        return fact.map_batches(attach, batch_format="pyarrow")

    dim_ds = read(sf_dir, dim_table, [dim_key, *payload])

    def dim_thin(t: pa.Table) -> pa.Table:
        if dim_filter is not None:
            t = t.filter(dim_filter(t))
        return t.rename_columns([fact_key, *payload])

    return bucket_join(
        fact, dim_ds.map_batches(dim_thin, batch_format="pyarrow"),
        key=fact_key, left_cols=fact_cols, right_cols=payload,
        post=post, out_schema=out_schema)


# ------------------------------------------------------------------ Q2


def q2_min_acctbal_supplier(sf_dir: str,
                            broadcast_rows: int = DIM_BROADCAST_ROWS
                            ) -> pd.DataFrame:
    """TPC-H Q2 shape: for each part type, the supplier with the minimum
    account balance among suppliers that shipped that type (no partsupp
    table exists, so shipped-it-per-lineitem stands in for supplies-it,
    and s_acctbal for ps_supplycost; ties break on s_suppkey).

    Plan: per-batch-distinct (partkey, suppkey) pairs -> gated p_type
    attach (dedupe partial) -> gated s_acctbal attach whose partial is an
    argmin per type, so the driver folds <= |types| x buckets candidate
    rows; only the winners' supplier rows are read back for decoration."""
    import pyarrow.parquet as pq

    li = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"partkey": t["l_partkey"].to_numpy(),
                            "suppkey": t["l_suppkey"].to_numpy()})
              .drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    def post_type(df: pd.DataFrame) -> pa.Table:
        g = df[["suppkey", "p_type"]].drop_duplicates()
        return pa.table({"suppkey": pa.array(g["suppkey"].to_numpy(), pa.int64()),
                         "p_type": pa.array(g["p_type"], pa.string())})

    typed = gated_attach(
        li.map_batches(pairs, batch_format="pyarrow"),
        "partkey", {"suppkey": pa.int64()},
        sf_dir, "part", "p_partkey", {"p_type": pa.string()},
        post_type,
        pa.schema([("suppkey", pa.int64()), ("p_type", pa.string())]),
        broadcast_rows)

    def post_argmin(df: pd.DataFrame) -> pa.Table:
        g = (df.sort_values(["p_type", "s_acctbal", "k"])
             .drop_duplicates("p_type"))
        return pa.table({"p_type": pa.array(g["p_type"], pa.string()),
                         "s_acctbal": pa.array(g["s_acctbal"].to_numpy(),
                                               pa.float64()),
                         "suppkey": pa.array(g["k"].to_numpy(), pa.int64())})

    cand = gated_attach(
        typed, "suppkey", {"p_type": pa.string()},
        sf_dir, "supplier", "s_suppkey", {"s_acctbal": pa.float64()},
        post_argmin,
        pa.schema([("p_type", pa.string()), ("s_acctbal", pa.float64()),
                   ("suppkey", pa.int64())]),
        broadcast_rows)

    out = cand.to_pandas()  # <= |types| x buckets rows
    if out.empty:  # empty fold loses its schema; rebuild typed
        return pd.DataFrame({"p_type": pd.Series(dtype="object"),
                             "s_name": pd.Series(dtype="object"),
                             "s_acctbal": pd.Series(dtype="float64"),
                             "n_name": pd.Series(dtype="object")})
    out = (out.sort_values(["p_type", "s_acctbal", "suppkey"])
           .drop_duplicates("p_type").reset_index(drop=True))
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filters=[("s_suppkey", "in", out["suppkey"].tolist())]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    out = out.merge(sup, left_on="suppkey", right_on="s_suppkey")
    out["n_name"] = out["s_nationkey"].map(names)
    return (out[["p_type", "s_name", "s_acctbal", "n_name"]]
            .sort_values("p_type").reset_index(drop=True))


Q2_SQL = """
SELECT p_type, s_name, s_acctbal, n_name
FROM (SELECT DISTINCT p_type, l_suppkey
      FROM lineitem, part WHERE l_partkey = p_partkey) pairs,
     supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
QUALIFY row_number() OVER (PARTITION BY p_type
                           ORDER BY s_acctbal, s_suppkey) = 1
ORDER BY p_type
"""


# ------------------------------------------------------------------ Q8


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    target_nation: str = "NATION_2", ptype: str = "PROMO",
                    broadcast_rows: int = DIM_BROADCAST_ROWS
                    ) -> pd.DataFrame:
    """TPC-H Q8 shape: the target nation's share of supply revenue for
    one part type sold to one region's customers, by order year.

    Plan: lineitem gate-attaches the part-type filter, pre-aggregates
    (orderkey, suppkey, rev) per batch, gate-attaches supplier nation;
    orders filter to the date window and gate-attach the customer-nation
    filter (region membership via the tiny nation/region driver read);
    ONE big-big orderkey bucket_join emits per-year (total, target)
    cent partials; the final groupby is |years| rows and the share is a
    single int/int divide."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = datetime(1996, 1, 1), datetime(1999, 1, 1)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    rkey = {r["r_regionkey"]: r["r_name"] for r in reg}
    region_nats = np.array(sorted(
        n["n_nationkey"] for n in nat if rkey[n["n_regionkey"]] == region),
        dtype=np.int64)
    target_key = next(n["n_nationkey"] for n in nat
                      if n["n_name"] == target_nation)

    li = read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_orderkey",
               "l_extendedprice", "l_discount"])

    def li_thin(t: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": t["l_partkey"], "suppkey": t["l_suppkey"],
            "orderkey": t["l_orderkey"],
            "rev": pa.array(_cents(t["l_extendedprice"].to_numpy()
                                   * (1.0 - t["l_discount"].to_numpy())),
                            pa.int64())})

    def post_part(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["orderkey", "suppkey"], as_index=False)["rev"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li_p = gated_attach(
        li.map_batches(li_thin, batch_format="pyarrow"),
        "partkey", {"suppkey": pa.int64(), "orderkey": pa.int64(),
                    "rev": pa.int64()},
        sf_dir, "part", "p_partkey", {"p_type": pa.string()},
        post_part,
        pa.schema([("orderkey", pa.int64()), ("suppkey", pa.int64()),
                   ("rev", pa.int64())]),
        broadcast_rows,
        dim_filter=lambda t: pc.equal(t["p_type"], ptype))

    def post_snat(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["orderkey", "s_nationkey"], as_index=False)["rev"]
             .sum().rename(columns={"s_nationkey": "snat"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    li_n = gated_attach(
        li_p, "suppkey", {"orderkey": pa.int64(), "rev": pa.int64()},
        sf_dir, "supplier", "s_suppkey", {"s_nationkey": pa.int64()},
        post_snat,
        pa.schema([("orderkey", pa.int64()), ("snat", pa.int64()),
                   ("rev", pa.int64())]),
        broadcast_rows)

    od = (read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
          .map_batches(lambda t: t.filter(pc.and_(
              pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
              pc.less(t["o_orderdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))

    def post_cust(df: pd.DataFrame) -> pa.Table:
        keep = df[np.isin(df["c_nationkey"].to_numpy(), region_nats)]
        yr = (keep["o_orderdate"].to_numpy().astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        return pa.table({"orderkey": pa.array(keep["o_orderkey"].to_numpy(),
                                              pa.int64()),
                         "o_year": pa.array(yr, pa.int64())})

    od_r = gated_attach(
        od.map_batches(lambda t: pa.table(
            {"custkey": t["o_custkey"], "o_orderkey": t["o_orderkey"],
             "o_orderdate": t["o_orderdate"]}), batch_format="pyarrow"),
        "custkey", {"o_orderkey": pa.int64(),
                    "o_orderdate": pa.timestamp("us")},
        sf_dir, "customer", "c_custkey", {"c_nationkey": pa.int64()},
        post_cust,
        pa.schema([("orderkey", pa.int64()), ("o_year", pa.int64())]),
        broadcast_rows)

    def post_share(df: pd.DataFrame) -> pa.Table:
        tgt = np.where(df["snat"].to_numpy() == target_key,
                       df["rev"].to_numpy(), 0)
        g = (pd.DataFrame({"o_year": df["o_year"].to_numpy(),
                           "tot": df["rev"].to_numpy(), "tgt": tgt})
             .groupby("o_year", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = bucket_join(
        li_n, od_r, key="orderkey",
        left_cols={"snat": pa.int64(), "rev": pa.int64()},
        right_cols={"o_year": pa.int64()},
        post=post_share,
        out_schema=pa.schema([("o_year", pa.int64()), ("tot", pa.int64()),
                              ("tgt", pa.int64())]))

    out = (parts.groupby("o_year")
           .aggregate(Sum("tot", alias_name="tot"),
                      Sum("tgt", alias_name="tgt")).to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                             "mkt_share": pd.Series(dtype="float64")})
    out["mkt_share"] = out["tgt"] / out["tot"]
    return (out[["o_year", "mkt_share"]].sort_values("o_year")
            .reset_index(drop=True))


Q8_SQL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev,
         s_nationkey AS snat
  FROM lineitem, part, supplier
  WHERE l_partkey = p_partkey AND p_type = 'PROMO'
    AND l_suppkey = s_suppkey),
od AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders, customer, nation, region
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1999-01-01')
SELECT o_year,
       SUM(CASE WHEN snat = (SELECT n_nationkey FROM nation
                             WHERE n_name = 'NATION_2')
                THEN rev ELSE 0 END) * 1.0 / SUM(rev) AS mkt_share
FROM li, od WHERE l_orderkey = o_orderkey
GROUP BY o_year ORDER BY o_year
"""


# ----------------------------------------------------------------- Q12


def q12_late_lines(sf_dir: str, days_late: int = 90) -> pd.DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts among late
    shipments, by category. Adaptations: no l_shipmode / l_commitdate /
    l_receiptdate exist, so l_returnflag stands in for the shipmode
    grouping and "late" means l_shipdate > o_orderdate + days_late.

    Plan: the orderkey join is inherently big-big, so both sides thin to
    (orderkey, payload) and bucket_join; each bucket emits per-flag
    (high, low) count partials and the final groupby is |flags| rows."""
    from ray.data.aggregate import Sum

    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    li = (read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_returnflag"])
          .map_batches(lambda t: pa.table(
              {"orderkey": t["l_orderkey"], "l_shipdate": t["l_shipdate"],
               "l_returnflag": t["l_returnflag"]}).filter(pc.and_(
                  pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                  pc.less(t["l_shipdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))
    od = read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "o_orderdate": t["o_orderdate"],
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")

    def post_counts(df: pd.DataFrame) -> pa.Table:
        ship = df["l_shipdate"].to_numpy().astype("datetime64[us]")
        odate = df["o_orderdate"].to_numpy().astype("datetime64[us]")
        late = ship > odate + np.timedelta64(days_late, "D")
        d = df[late]
        high = np.isin(d["o_orderpriority"].to_numpy(),
                       np.array(["1-URGENT", "2-HIGH"]))
        g = (pd.DataFrame({"l_returnflag": d["l_returnflag"].to_numpy(),
                           "high_line_count": high.astype(np.int64),
                           "low_line_count": (~high).astype(np.int64)})
             .groupby("l_returnflag", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = bucket_join(
        li, od, key="orderkey",
        left_cols={"l_shipdate": pa.timestamp("us"),
                   "l_returnflag": pa.string()},
        right_cols={"o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()},
        post=post_counts,
        out_schema=pa.schema([("l_returnflag", pa.string()),
                              ("high_line_count", pa.int64()),
                              ("low_line_count", pa.int64())]))
    out = (parts.groupby("l_returnflag")
           .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                      Sum("low_line_count", alias_name="low_line_count"))
           .to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                             "high_line_count": pd.Series(dtype="int64"),
                             "low_line_count": pd.Series(dtype="int64")})
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q12_SQL = """
SELECT l_returnflag,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ----------------------------------------------------------------- Q16


Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def q16_supplier_counts(sf_dir: str, excl_brand: str = "Brand#9",
                        broadcast_rows: int = DIM_BROADCAST_ROWS
                        ) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for a size set, excluding one brand and a supplier blacklist.
    Adaptations: shipped-it-per-lineitem stands in for partsupp, and
    s_acctbal < 0 stands in for the complaints-comment blacklist.

    Plan: per-batch-distinct (partkey, suppkey) pairs with the (tiny)
    blacklist filtered out -> gated part-attrs attach whose partial
    dedupes and buckets by suppkey hash -> per-suppkey-bucket groups
    dedupe globally (a combo x suppkey lands in exactly ONE bucket, so
    per-bucket distinct counts sum to the exact global count-distinct)
    -> a |combos|-row groupby folds the partials."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    bad = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"],
                        filters=[("s_acctbal", "<", 0.0)])
    bad_keys = np.sort(bad["s_suppkey"].to_numpy().astype(np.int64))
    sizes = np.array(Q16_SIZES, dtype=np.int64)

    li = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy()
        keep = ~np.isin(sk, bad_keys)
        df = (pd.DataFrame({"partkey": t["l_partkey"].to_numpy()[keep],
                            "suppkey": sk[keep]}).drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    def dim_filter(t: pa.Table) -> pa.Array:
        return pc.and_(pc.not_equal(t["p_brand"], excl_brand),
                       pc.is_in(t["p_size"],
                                value_set=pa.array(sizes, pa.int64())))

    def post_attrs(df: pd.DataFrame) -> pa.Table:
        g = df[["suppkey", "p_brand", "p_type", "p_size"]].drop_duplicates()
        sb = (g["suppkey"].to_numpy() & 63).astype(np.int32)
        return pa.table({"sb": pa.array(sb),
                         "suppkey": pa.array(g["suppkey"].to_numpy(), pa.int64()),
                         "p_brand": pa.array(g["p_brand"], pa.string()),
                         "p_type": pa.array(g["p_type"], pa.string()),
                         "p_size": pa.array(g["p_size"].to_numpy(), pa.int64())})

    tagged = gated_attach(
        li.map_batches(pairs, batch_format="pyarrow"),
        "partkey", {"suppkey": pa.int64()},
        sf_dir, "part", "p_partkey",
        {"p_brand": pa.string(), "p_type": pa.string(),
         "p_size": pa.int64()},
        post_attrs,
        pa.schema([("sb", pa.int32()), ("suppkey", pa.int64()),
                   ("p_brand", pa.string()), ("p_type", pa.string()),
                   ("p_size", pa.int64())]),
        broadcast_rows, dim_filter=dim_filter)

    def bucket_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(
            ["suppkey", "p_brand", "p_type", "p_size"])
        g = (df.groupby(["p_brand", "p_type", "p_size"], as_index=False)
             .size().rename(columns={"size": "supplier_cnt"}))
        g["supplier_cnt"] = g["supplier_cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (tagged.groupby("sb")
           .map_groups(bucket_distinct, batch_format="pyarrow")
           .groupby(["p_brand", "p_type", "p_size"])
           .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
           .to_pandas())
    if out.empty:  # empty aggregate loses its schema; rebuild typed
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "p_type": pd.Series(dtype="object"),
                             "p_size": pd.Series(dtype="int64"),
                             "supplier_cnt": pd.Series(dtype="int64")})
    return (out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True))


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey AND p_brand <> 'Brand#9'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ----------------------------------------------------------------- Q19


Q19_TERMS = (("Brand#1", 1, 10, 1, 20),
             ("Brand#5", 1, 20, 10, 30),
             ("Brand#13", 1, 30, 20, 50))


def q19_disjunctive_revenue(sf_dir: str,
                            broadcast_rows: int = DIM_BROADCAST_ROWS
                            ) -> pd.DataFrame:
    """TPC-H Q19 shape: one scalar revenue under a disjunction of
    (brand, size range, quantity range) conjuncts — the classic
    pushdown-hostile OR predicate. p_size stands in for the missing
    p_container dimension.

    Plan: the dim side pre-filters to the brands the disjunction can
    ever accept, the gated attach lands (brand, size) next to each
    lineitem row, the three conjuncts evaluate as one vectorized mask,
    and each batch emits a single cent-sum partial — Dataset.sum folds
    them in a tree; no exchange beyond the (gated) attach."""
    brands = np.array([b for b, *_ in Q19_TERMS])

    li = read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def li_thin(t: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": t["l_partkey"],
            "qty": pc.cast(t["l_quantity"], pa.float64()),
            "rev": pa.array(_cents(t["l_extendedprice"].to_numpy()
                                   * (1.0 - t["l_discount"].to_numpy())),
                            pa.int64())})

    def post_sum(df: pd.DataFrame) -> pa.Table:
        brand = df["p_brand"].to_numpy()
        size = df["p_size"].to_numpy()
        qty = df["qty"].to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for b, slo, shi, qlo, qhi in Q19_TERMS:
            keep |= ((brand == b) & (size >= slo) & (size <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        return pa.table({"rev": pa.array(
            [int(df["rev"].to_numpy()[keep].sum())], pa.int64())})

    parts = gated_attach(
        li.map_batches(li_thin, batch_format="pyarrow"),
        "partkey", {"qty": pa.float64(), "rev": pa.int64()},
        sf_dir, "part", "p_partkey",
        {"p_brand": pa.string(), "p_size": pa.int64()},
        post_sum, pa.schema([("rev", pa.int64())]),
        broadcast_rows,
        dim_filter=lambda t: pc.is_in(
            t["p_brand"], value_set=pa.array(brands, pa.string())))

    rev = parts.sum("rev")  # None when no lineitem matches any term
    return pd.DataFrame(
        {"revenue": [float("nan") if rev is None else rev / 100.0]})


Q19_SQL = """
SELECT SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
               AS BIGINT)) / 100.0 AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 20
      AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 30
      AND l_quantity BETWEEN 20 AND 50))
"""


# ----------------------------------------------------------------- Q20


def q20_excess_suppliers(sf_dir: str, name_prefix: str = "small",
                         qty_floor: float = 60.0,
                         broadcast_rows: int = DIM_BROADCAST_ROWS
                         ) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers who shipped an excess quantity of any
    one part from a name family in one year. Adaptation: the shipped
    (suppkey, partkey) year-sum stands in for partsupp availqty and the
    0.5*avail threshold becomes an absolute qty floor.

    Plan: gated part-name filter attach -> per-batch (suppkey, partkey)
    qty partials -> ONE two-key groupby -> threshold filter -> the
    surviving suppkey set is <= |supplier| rows, so the name/nation
    decoration is a filtered driver read."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    li = (read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity",
                                    "l_shipdate"])
          .map_batches(lambda t: t.filter(pc.and_(
              pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
              pc.less(t["l_shipdate"], pa.scalar(hi)))),
              batch_format="pyarrow"))

    def li_thin(t: pa.Table) -> pa.Table:
        return pa.table({"partkey": t["l_partkey"],
                         "suppkey": t["l_suppkey"],
                         "qty": pc.cast(t["l_quantity"], pa.float64())})

    def post_qty(df: pd.DataFrame) -> pa.Table:
        g = (df.rename(columns={"k": "partkey"})
             .groupby(["suppkey", "partkey"], as_index=False)["qty"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = gated_attach(
        li.map_batches(li_thin, batch_format="pyarrow"),
        "partkey", {"suppkey": pa.int64(), "qty": pa.float64()},
        sf_dir, "part", "p_partkey", {"p_name": pa.string()},
        post_qty,
        pa.schema([("suppkey", pa.int64()), ("partkey", pa.int64()),
                   ("qty", pa.float64())]),
        broadcast_rows,
        dim_filter=lambda t: pc.starts_with(t["p_name"], name_prefix))

    hot = (sums.groupby(["suppkey", "partkey"])
           .aggregate(Sum("qty", alias_name="qty"))
           .filter(expr=f"qty > {qty_floor}").to_pandas())
    winners = [] if hot.empty else sorted(set(hot["suppkey"].tolist()))
    if not winners:
        return pd.DataFrame({"s_name": pd.Series(dtype="object"),
                             "n_name": pd.Series(dtype="object")})
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filters=[("s_suppkey", "in", winners)]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    sup["n_name"] = sup["s_nationkey"].map(names)
    return (sup[["s_name", "n_name"]].sort_values("s_name")
            .reset_index(drop=True))


Q20_SQL = """
SELECT s_name, n_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND s_suppkey IN (
  SELECT l_suppkey FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 60)
ORDER BY s_name
"""
