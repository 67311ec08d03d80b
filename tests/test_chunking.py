"""chunk_windows multi-window path: the sf tables' documents are shorter
than one window, so this pins the overlap/stride arithmetic on long docs
against the same generate_series SQL oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ssufid_ray.stages.text import CHUNK_S, CHUNK_W, CHUNK_WINDOWS_SQL, chunk_windows


def test_chunk_windows_long_docs(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    texts = []
    # lengths straddling every boundary case: empty, short, == W, == W+1,
    # mid-stride, exact multi-stride end
    for n in (0, 5, CHUNK_W, CHUNK_W + 1, CHUNK_W + CHUNK_S,
              CHUNK_W + CHUNK_S + 17, 3 * CHUNK_S + CHUNK_W, 1000):
        texts.append(" ".join(f"w{int(x)}" for x in rng.integers(0, 50, n)))
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "documents.parquet"))

    got = chunk_windows(str(tmp_path))
    assert got["win_id"].max() >= 9  # the 1000-token doc spans many windows

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(CHUNK_WINDOWS_SQL).df()
    for c in ("doc_id", "win_id", "tok_start", "n_toks"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
