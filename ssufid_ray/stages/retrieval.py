"""Sparse text retrieval over the documents table: inverted-index posting
lists and BM25 ranking (Robertson/Sparck Jones; the Lucene idf variant
ln(1 + (N - df + 0.5)/(df + 0.5))).

Distributed shape: pass 1 folds per-batch partials (doc count, total
length, per-term document frequency) into a handful of driver scalars —
nothing corpus-sized moves. Pass 2 scores each batch independently against
those closure constants and emits a per-batch partial top-k, so at most
`n_blocks x K` candidate rows reach the driver merge. A full-corpus
inverted index at 100 TB is the same pipeline without the term filter,
written term-partitioned instead of collected.

Token contract: ASCII `[^\\s]+` runs — identical to DuckDB RE2
`regexp_extract_all(text, '[^\\s]+')` (see text.py token_stats for why
str.split() is NOT RE2-parity). Scores cross the oracle as BIGINT
micro-units (round(score * 1e6)) so the comparison is integer-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ssufid_ray.stages.relational import read
from ssufid_ray.stages.text import WS_TOKEN_RE as _WS_RE

BM25_TERMS = ("join", "hash", "filter")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15


def _corpus_stats(ds) -> tuple[int, float, dict[str, int]]:
    """(N docs, avgdl, df per query term) via per-batch partial rows folded
    by one tiny aggregate."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = [_WS_RE.findall(x) for x in t["text"].to_pylist()]
        row = {"n_docs": len(toks), "sum_dl": sum(len(tk) for tk in toks)}
        for q in BM25_TERMS:
            row[f"df_{q}"] = sum(1 for tk in toks if q in tk)
        return pa.Table.from_pylist([row])

    aggs = [Sum(c, alias_name=c) for c in
            ["n_docs", "sum_dl", *[f"df_{q}" for q in BM25_TERMS]]]
    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    n = int(s["n_docs"])
    return n, s["sum_dl"] / n, {q: int(s[f"df_{q}"]) for q in BM25_TERMS}


def bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Top-K documents by BM25 for the fixed query BM25_TERMS."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n, avgdl, df = _corpus_stats(ds)
    idf = {q: float(np.log(1.0 + (n - d + 0.5) / (d + 0.5)))
           for q, d in df.items()}

    def score_batch(t: pa.Table) -> pa.Table:
        out_id, out_u = [], []
        cand = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tk = _WS_RE.findall(text)
            dl = len(tk)
            score = 0.0
            for q in BM25_TERMS:
                tf = tk.count(q)
                if tf:
                    score += idf[q] * tf * (BM25_K1 + 1) / (
                        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
            if score > 0:
                cand.append((int(round(score * 1e6)), doc_id))
        cand.sort(key=lambda p: (-p[0], p[1]))  # partial top-k per batch
        for u, d in cand[:BM25_TOPK]:
            out_id.append(d)
            out_u.append(u)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score_u": pa.array(out_u, pa.int64())})

    parts = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["score_u", "doc_id"], ascending=[False, True])
    return parts.head(BM25_TOPK).reset_index(drop=True)


_TERMS_SQL = "SELECT unnest([" + ", ".join(f"'{q}'" for q in BM25_TERMS) + "]) AS term"
BM25_TOPK_SQL = f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(CAST(len(toks) AS DOUBLE)) / COUNT(*) AS avgdl FROM d),
q AS ({_TERMS_SQL}),
tf AS (SELECT doc_id, term,
              CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf,
              CAST(len(toks) AS DOUBLE) AS dl
       FROM d CROSS JOIN q),
df AS (SELECT term, CAST(COUNT(*) FILTER (WHERE tf > 0) AS DOUBLE) AS df
       FROM tf GROUP BY term),
sc AS (SELECT doc_id,
              SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * ({BM25_K1} + 1)
                  / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl)))
                AS score
       FROM tf JOIN df USING (term) CROSS JOIN s
       WHERE tf.tf > 0 GROUP BY doc_id)
SELECT doc_id, CAST(ROUND(score * 1e6) AS BIGINT) AS score_u
FROM sc ORDER BY score_u DESC, doc_id LIMIT {BM25_TOPK}
"""


def inverted_postings(sf_dir: str) -> pd.DataFrame:
    """Posting lists (term, doc_id, tf) for the query terms — the bounded
    lookup slice of the inverted index (drop the term filter and write
    term-partitioned parquet for the full index)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        terms, ids, tfs = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tk = _WS_RE.findall(text)
            for q in BM25_TERMS:
                tf = tk.count(q)
                if tf:
                    terms.append(q)
                    ids.append(doc_id)
                    tfs.append(tf)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "tf": pa.array(tfs, pa.int64())})

    df = ds.map_batches(postings, batch_format="pyarrow").to_pandas()
    return df.sort_values(["term", "doc_id"]).reset_index(drop=True)


INVERTED_POSTINGS_SQL = f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
q AS ({_TERMS_SQL})
SELECT term, doc_id, CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
FROM d CROSS JOIN q
WHERE len(list_filter(toks, x -> x = term)) > 0
ORDER BY term, doc_id
"""
