"""Distributed connected components over near-duplicate pair lists — the
clustering/canonicalization step a dedup pipeline runs after pair
discovery (keep the minimum doc_id of every component, drop the rest).

Algorithm: iterative min-label propagation. Labels start as each node's
own id; every round each node broadcasts its current label to its
neighbors through ONE co-partitioned exchange (labels and adjacency rows
union'd, grouped by node), then a groupby().min() folds incoming labels.
Labels decrease monotonically, so a fixpoint (sum of labels unchanged) is
reached within graph-diameter rounds — near-dup components are shallow
(pairs come from banding buckets), so 2-4 rounds in practice. Everything
that crosses an exchange is two int64 columns; per-round label state is
materialized so the lineage stays O(1) deep instead of re-executing all
prior rounds each iteration.

The registered query clusters the ngram_jaccard_pairs output (the exact,
oracled pair baseline). At 100 TB the edge list streams out of the
minhash/LSH band stage as a Dataset — pass it straight in; the iteration
never materializes nodes or edges on the driver.

Oracle: recursive-CTE reachability closure over the same pair SQL
(tractable because the oracled pair domain is bounded).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ssufid_ray.stages.dedup import NGRAM_JACCARD_SQL, ngram_jaccard_pairs

CC_MAX_ITER = 50

_LBL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components(edges: ray.data.Dataset,
                         max_iter: int = CC_MAX_ITER) -> ray.data.Dataset:
    """Min-label connected components. `edges` has int64 columns (a, b),
    one row per undirected edge; returns a Dataset of (node, label) where
    label is the minimum node id in the component. Isolated nodes (absent
    from `edges`) are absent from the output — union them in as
    self-labeled rows if needed."""
    from ray.data.aggregate import Min, Sum

    def both_dir(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64())})
        a, b = pc_cast(t["a"]), pc_cast(t["b"])
        return pa.table({"node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                         "nbr": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})

    import pyarrow.compute as _pc

    def pc_cast(col):
        return _pc.cast(col, pa.int64())

    adj = edges.map_batches(both_dir, batch_format="pyarrow").materialize()

    def self_label(t: pa.Table) -> pa.Table:
        import numpy as np

        if len(t) == 0 or "node" not in t.column_names:
            return _LBL_SCHEMA.empty_table()
        u = np.unique(t["node"].to_numpy())
        return pa.table({"node": pa.array(u, pa.int64()),
                         "label": pa.array(u, pa.int64())})

    labels = (adj.map_batches(self_label, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())
    if labels.count() == 0:  # no edges: empty result, don't aggregate None
        return ray.data.from_arrow(_LBL_SCHEMA.empty_table())
    prev_sum = None
    for _ in range(max_iter):
        def tag_lbl(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64()),
                                 "kind": pa.array([], pa.int64())})
            return pa.table({"node": t["node"],
                             "val": pc_cast(t["label"]),
                             "kind": pa.nulls(len(t), pa.int64()).fill_null(0)})

        def tag_edge(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64()),
                                 "kind": pa.array([], pa.int64())})
            return pa.table({"node": t["node"], "val": t["nbr"],
                             "kind": pa.nulls(len(t), pa.int64()).fill_null(1)})

        def propagate(t: pa.Table) -> pa.Table:
            import numpy as np

            if len(t) == 0 or "kind" not in t.column_names:
                return _LBL_SCHEMA.empty_table()
            kind = t["kind"].to_numpy()
            val = t["val"].to_numpy()
            node = int(t["node"][0].as_py())
            lab = int(val[kind == 0].min())
            nbrs = val[kind == 1]
            out_nodes = np.concatenate([[node], nbrs])
            return pa.table({"node": pa.array(out_nodes, pa.int64()),
                             "label": pa.array(np.full(len(out_nodes), lab),
                                               pa.int64())})

        labels = (labels.map_batches(tag_lbl, batch_format="pyarrow")
                  .union(adj.map_batches(tag_edge, batch_format="pyarrow"))
                  .groupby("node").map_groups(propagate, batch_format="pyarrow")
                  .groupby("node").aggregate(Min("label", alias_name="label"))
                  .materialize())
        cur_sum = int(labels.aggregate(Sum("label", alias_name="s"))["s"])
        if cur_sum == prev_sum:  # monotone-decreasing ints: equal => fixpoint
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return labels


def dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup clusters over the oracled ngram-Jaccard pair baseline:
    (doc_id, cluster_id) where cluster_id is the component's minimum
    doc_id (the canonical survivor)."""
    pairs = ngram_jaccard_pairs(sf_dir)[["a", "b"]]
    labels = connected_components(ray.data.from_pandas(pairs))
    df = labels.to_pandas()
    if df.empty:  # Ray to_pandas drops columns on empty datasets
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster_id": pd.Series(dtype="int64")})
    df = df.rename(columns={"node": "doc_id", "label": "cluster_id"})
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({NGRAM_JACCARD_SQL}),
e AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
)
SELECT u AS doc_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS cluster_id
FROM reach GROUP BY u ORDER BY doc_id
"""
