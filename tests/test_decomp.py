"""Pins for stages/decomp.py: pca_project must be BIT-EXACT equal to the
sequential reference (the fixed-point run-invariance contract), and
ddsketch_quantiles must hit the DDSketch relative-error bound against the
exact quantile."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from ssufid_ray.stages.decomp import (DD_ALPHA, DD_QS, ddsketch_quantiles,
                                      pca_project, pca_reference)

SF = "/root/testdata/sf0.01"


def test_pca_bit_exact_vs_reference(ray_session):
    got = pca_project(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
    want = pca_reference(vecs)
    assert np.array_equal(got["vec_id"].to_numpy(), want["vec_id"].to_numpy())
    # integer-arithmetic projection: equality is exact, not approximate
    assert np.array_equal(got["pc1"].to_numpy(), want["pc1"].to_numpy())
    assert np.array_equal(got["pc2"].to_numpy(), want["pc2"].to_numpy())
    # sanity: components are not degenerate
    assert got["pc1"].std() > 0 and got["pc2"].std() > 0


def test_pca_captures_more_variance_than_raw_axis(ray_session):
    got = pca_project(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    assert got["pc1"].var() >= X.var(axis=0).max() * 0.999


def test_ddsketch_relative_error(ray_session):
    got = ddsketch_quantiles(SF)
    con = duckdb.connect()
    for (table, col), grp in got.groupby(["table", "column"]):
        exact = con.sql(
            f"SELECT {', '.join(f'quantile_disc({col}, {q})' for q in DD_QS)} "
            f"FROM '{SF}/{table}.parquet' WHERE {col} > 0").fetchone()
        for (_, row), want in zip(grp.sort_values("q").iterrows(), exact):
            rel = abs(row["estimate"] - float(want)) / float(want)
            # alpha bound + discrete-data slack (quantile_disc snaps to a
            # sample; the sketch returns the bucket midpoint)
            assert rel <= 2 * DD_ALPHA, (table, col, row["q"], rel)


def test_group_ddsketch_error_bound(ray_session):
    """Per-group DDSketch estimates stay within the relative-error bound
    (2.5*alpha incl. discrete-bucket slack) of the exact per-group
    quantile for every (lang, q)."""
    import duckdb

    from ssufid_ray.stages.decomp import DD_ALPHA, group_ddsketch_quantiles

    sf = "/root/testdata/sf0.01"
    out = group_ddsketch_quantiles(sf)
    assert len(out) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for r in out.itertuples():
        exact = con.sql(
            f"SELECT quantile_disc(n_chars, {r.q}) FROM documents "
            f"WHERE lang = '{r.lang}'").fetchone()[0]
        assert abs(r.estimate - exact) / exact <= 2.5 * DD_ALPHA
