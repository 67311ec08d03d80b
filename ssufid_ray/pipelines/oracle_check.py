"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side on the same parquet tables, compare
row-count + schema + order-insensitive values. Used by tests and by bench
iteration; the real gate is the driver's CORRECTNESS_r{N}.json."""

from __future__ import annotations

from typing import Any

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _to_df(result: Any) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def compare_one(name: str, query_fn, sql: str, sf_dir: str,
                con: duckdb.DuckDBPyConnection) -> dict:
    got = _normalize(_to_df(query_fn(sf_dir)))
    want = _normalize(con.sql(sql).df())
    rep = {"name": name, "rows": len(got), "oracle_rows": len(want), "ok": True,
           "detail": ""}
    if list(got.columns) != list(want.columns):
        rep["ok"] = False
        rep["detail"] = f"columns {list(got.columns)} vs {list(want.columns)}"
        return rep
    if len(got) != len(want):
        rep["ok"] = False
        rep["detail"] = "row count"
        return rep
    # dtype-strict: the driver hashes values WITH dtype, so a value-equal
    # Int64-vs-float64 result still hash-fails there. Catch it here first.
    dt_diff = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
               if str(got[c].dtype) != str(want[c].dtype)]
    if dt_diff:
        rep["ok"] = False
        rep["detail"] = f"dtype mismatch {dt_diff}"
        return rep
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            an, bn = a.astype("float64"), b.astype("float64")
            eq = (an.isna() & bn.isna()) | (an == bn)
        elif str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
            an, bn = pd.to_datetime(a), pd.to_datetime(b)
            eq = (an.isna() & bn.isna()) | an.eq(bn)  # NaT == NaT counts
        else:
            a2 = a.where(~a.isna(), None)
            b2 = b.where(~b.isna(), None)
            eq = pd.Series([x == y or (x is None and y is None)
                            for x, y in zip(a2, b2)])
        if not bool(eq.all()):
            i = int(np.argmin(eq.to_numpy()))
            rep["ok"] = False
            rep["detail"] = f"col {c} first diff @{i}: {got[c].iloc[i]!r} vs {want[c].iloc[i]!r}"
            return rep
    return rep


def run_all(sf_dir: str, only: list[str] | None = None) -> list[dict]:
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)
    out = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                df = _to_df(fn(sf_dir))
                out.append({"name": name, "rows": len(df), "oracle_rows": None,
                            "ok": len(df) > 0, "detail": "rows-only"})
            except Exception as e:  # noqa: BLE001
                out.append({"name": name, "rows": -1, "oracle_rows": None,
                            "ok": False, "detail": f"EXC {type(e).__name__}: {e}"})
            continue
        try:
            out.append(compare_one(name, fn, oracles[name], sf_dir, con))
        except Exception as e:  # noqa: BLE001
            out.append({"name": name, "rows": -1, "oracle_rows": -1, "ok": False,
                        "detail": f"EXC {type(e).__name__}: {e}"})
    return out
