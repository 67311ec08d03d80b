"""Unit tests for the global-ordering operators (stages/ranking.py):
the NTILE formula vs DuckDB's, and global_rank's degenerate paths
(all-equal sort values -> one bin, ties broken bin-locally)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ssufid_ray.stages.ranking import _ntile, global_rank


@pytest.mark.parametrize("total,n", [(1, 10), (9, 10), (10, 10), (11, 10),
                                     (15000, 10), (97, 7), (7, 7), (3, 4)])
def test_ntile_matches_duckdb(total, n):
    ranks = np.arange(1, total + 1, dtype=np.int64)
    got = _ntile(ranks, total, n)
    want = duckdb.sql(
        f"SELECT NTILE({n}) OVER (ORDER BY r) FROM range(1, {total + 1}) t(r)"
    ).fetchnumpy()
    key = next(iter(want))
    assert np.array_equal(got, want[key].astype(np.int64))


def test_global_rank_constant_values(ray_session, tmp_path):
    # every o_totalprice equal -> bin width guard (0 -> 1.0), one bin,
    # rank must fall back to the o_orderkey tie-break and stay exact
    n = 500
    pq.write_table(
        pa.table({"o_orderkey": pa.array(np.arange(n)[::-1], pa.int64()),
                  "o_totalprice": pa.array(np.full(n, 42.0), pa.float64())}),
        str(tmp_path / "orders.parquet"))
    out = global_rank(str(tmp_path))
    assert len(out) == n
    # keys written in reverse but rank ordered by (price, key): rnk == key+1
    assert np.array_equal(out["rnk"].to_numpy(),
                          out["o_orderkey"].to_numpy() + 1)
    assert out["decile"].min() == 1 and out["decile"].max() == 10
