"""Text analysis operators for training-data pipelines: span segmentation,
language-ID heuristic, quality scoring, token counting, fingerprinting.

Tokenization contract (shared with the DuckDB oracles): tokens = whitespace
runs on trimmed text, i.e. Python `text.split()` ≡ DuckDB
`regexp_split_to_array(trim(text), '\\s+')`.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ssufid_ray.functions.segment import SPAN_WORDS, segment_text
from ssufid_ray.stages.relational import read


def span_docs(sf_dir: str) -> pd.DataFrame:
    """Flagship mapping of the driver's flat documents to the interleaved
    span schema: fixed 10-token text spans with dense offsets (the
    `input_hint` layout, flattened to one row per span)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def segment(t: pa.Table) -> pa.Table:
        out_id, out_off, out_text = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for off, chunk in enumerate(segment_text(text)):
                out_id.append(doc_id)
                out_off.append(off)
                out_text.append(chunk)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "span_offset": pa.array(out_off, pa.int32()),
                         "span_text": pa.array(out_text, pa.string())})

    df = ds.map_batches(segment, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "span_offset"]).reset_index(drop=True)


SPAN_DOCS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / {SPAN_WORDS}.0) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, n)) AS INT) AS span_offset,
       unnest(list_transform(range(0, n),
              i -> array_to_string(toks[i*{SPAN_WORDS}+1 : i*{SPAN_WORDS}+{SPAN_WORDS}], ' '))) AS span_text
FROM t
ORDER BY doc_id, span_offset
"""


# THE token contract shared by every operator that must agree with a
# DuckDB oracle on token boundaries: ASCII [^\s]+ runs, identical to RE2
# regexp_extract_all(text, '[^\s]+') (str.split() is NOT RE2-parity —
# it splits U+00A0/U+3000). retrieval.py and sampling.py import this;
# change it in one place or engine and oracle silently diverge.
WS_TOKEN_RE = re.compile(r"[^\s]+", re.ASCII)

_HANGUL = re.compile(r"[가-힣]")
_CJK = re.compile(r"[一-鿿]")
_PUNCT = re.compile(r"[^.,!?]")


def lang_quality(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic + quality metrics per doc. The heuristic is a
    deterministic script/stopword rule (not the table's lang label — the
    synthetic text is language-neutral); the contract is rule equality with
    the SQL oracle."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = text.split()
            n_tokens = len(toks)
            n_chars = len(text)
            if _HANGUL.search(text):
                lang_pred = "ko"
            elif _CJK.search(text):
                lang_pred = "zh"
            else:
                lang_pred = "en"
            punct = n_chars - len(_PUNCT.findall(text))
            avg_tok = (sum(len(w) for w in toks) / n_tokens) if n_tokens else 0.0
            rows.append({"doc_id": doc_id, "lang_pred": lang_pred,
                         "n_tokens": n_tokens, "n_chars": n_chars,
                         "punct_count": punct, "avg_token_len": avg_tok})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("doc_id", pa.int64()), ("lang_pred", pa.string()),
             ("n_tokens", pa.int64()), ("n_chars", pa.int64()),
             ("punct_count", pa.int64()), ("avg_token_len", pa.float64())]))

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


LANG_QUALITY_SQL = """
WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[가-힣]') THEN 'ko'
            WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            ELSE 'en' END AS lang_pred,
       len(toks) AS n_tokens,
       length(text) AS n_chars,
       length(text) - length(regexp_replace(text, '[.,!?]', '', 'g')) AS punct_count,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         AS avg_token_len
FROM t
ORDER BY doc_id
"""


def doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Content fingerprint: md5 of lowercased trimmed text (stable id for
    exact dedup joins; SQL-mirrored)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        fps = [hashlib.md5(x.strip().lower().encode("utf-8")).hexdigest()
               for x in t["text"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    return (ds.map_batches(fp, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


DOC_FINGERPRINT_SQL = "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents ORDER BY doc_id"


WINNOW_K = 5
WINNOW_W = 8


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    all k-gram token windows, keep the minimum hash in each window of w
    consecutive k-gram hashes. Gram hash = md5 hex (uniform, so the
    lexicographic min over hex strings is the numeric min over the
    128-bit values) — which makes the whole selection SQL-expressible as
    a window MIN over gram positions, and the query oracle-checked rather
    than rows-only. Embarrassingly parallel: selection is per-document
    inside map_batches, nothing crosses an exchange."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        out = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = text.split()
            grams = [" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))]
            hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
            sel: set[str] = set()
            for i in range(max(1, len(hs) - w + 1)):
                sel.add(min(hs[i : i + w]))
            for h in sorted(sel):
                out.append({"doc_id": doc_id, "fingerprint": h})
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("doc_id", pa.int64()), ("fingerprint", pa.string())]))

    return (ds.map_batches(fp, batch_format="pyarrow").to_pandas()
            .sort_values(["doc_id", "fingerprint"]).reset_index(drop=True))


WINNOW_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i,
         md5(array_to_string(tk[i + 1 : i + {WINNOW_K}], ' ')) AS h,
         greatest(1, len(tk) - {WINNOW_K} + 1) AS n
  FROM toks,
       LATERAL (SELECT unnest(range(greatest(1, len(tk) - {WINNOW_K} + 1))) AS i) r
),
wins AS (
  SELECT doc_id, i, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM grams
)
SELECT DISTINCT doc_id, fp AS fingerprint FROM wins
WHERE i <= greatest(0, n - {WINNOW_W})
ORDER BY doc_id, fingerprint
"""


TOP_TOKENS_K = 20


def top_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact corpus-wide top-K tokens by frequency (heavy hitters, computed
    exactly): per-batch token counting (one partial row per token per
    batch), small groupby over partials, deterministic tie-break by token."""
    ds = read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for text in t["text"].to_pylist():
            c.update(text.split())
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array([int(v) for v in c.values()], pa.int64())})

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype("int64")
    counts = counts.sort_values(["n", "token"], ascending=[False, True])
    return counts.head(TOP_TOKENS_K).reset_index(drop=True)


TOP_TOKENS_SQL = f"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents
)
SELECT token, COUNT(*) AS n FROM t WHERE token <> '' GROUP BY token
ORDER BY n DESC, token LIMIT {TOP_TOKENS_K}
"""


# BPE-ish pre-tokenizer (GPT-2 style contractions / letter runs / digit
# runs / punctuation runs / whitespace, simplified to a lookahead-free
# pattern that Python re and DuckDB RE2 interpret identically — the
# oracle runs the SAME pattern through regexp_extract_all).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z가-힣]+| ?[0-9]+| ?[^A-Za-z가-힣0-9\s]+|\s+"
_BPE_RE = None


def token_stats(sf_dir: str) -> pd.DataFrame:
    """Token counting (the training-data budget op): per document, the
    whitespace token count and the BPE-ish pre-token count. Compiled regex
    cached per worker process; vectorized column build per batch."""
    import re as _re

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        global _BPE_RE
        if _BPE_RE is None:
            # re.ASCII pins \s to RE2's ASCII class (same as WS_TOKEN_RE)
            _BPE_RE = _re.compile(BPE_PATTERN, _re.ASCII)
        _WS_RE = WS_TOKEN_RE
        texts = t["text"].to_pylist()
        # ASCII \S+ run count, matching RE2's regexp_extract_all exactly:
        # Python str.split() is Unicode-aware (U+00A0/U+3000 split here but
        # not in RE2) and DuckDB's split-on-\s+ counts empty text as 1
        ws = [len(_WS_RE.findall(x)) for x in texts]
        bpe = [sum(1 for _ in _BPE_RE.finditer(x)) for x in texts]
        return pa.table({"doc_id": t["doc_id"],
                         "n_ws_tokens": pa.array(ws, pa.int64()),
                         "n_bpe_tokens": pa.array(bpe, pa.int64())})

    return (ds.map_batches(stats, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def repetition_scores(sf_dir: str) -> pd.DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText-style
    filters): per document, the fraction of duplicate token bigrams and the
    mass of the single most frequent token. Ratios are one IEEE division on
    both sides, so raw doubles compare exactly against the oracle.
    Embarrassingly parallel — each batch scores independently."""
    from collections import Counter

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ids, dup, topf = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tk = WS_TOKEN_RE.findall(text)
            n = len(tk)
            bg = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
            ids.append(doc_id)
            dup.append(1.0 - len(set(bg)) / len(bg) if bg else 0.0)
            topf.append(max(Counter(tk).values()) / n if n else 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dup_bigram_frac": pa.array(dup, pa.float64()),
                         "top_token_frac": pa.array(topf, pa.float64())})

    return (ds.map_batches(score, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


REPETITION_SCORES_SQL = """
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
b AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
      FROM d)
SELECT doc_id,
       CASE WHEN len(bg) > 0
            THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN len(toks) > 0
            THEN CAST(list_max(list_transform(list_distinct(toks),
                      x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS top_token_frac
FROM b ORDER BY doc_id
"""


_BPE_SQL_PATTERN = BPE_PATTERN.replace("'", "''")  # SQL string literal
TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------- window chunking

CHUNK_W = 128   # tokens per training window
CHUNK_S = 96    # stride (CHUNK_W - CHUNK_S tokens of overlap)


def chunk_windows(sf_dir: str) -> pd.DataFrame:
    """Fixed-length overlapping window chunking — the one-to-many expansion
    that turns long documents into training windows (flat-map shape: each
    input row yields ceil((n-W)/S)+1 output rows, streamed per batch; no
    driver-side expansion). Window k of a doc covers tokens
    [k*S, min(k*S+W, n)); docs with no tokens are dropped on both engines.
    Tokenization: the module's shared split()/regexp_split contract."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        ids, wins, starts, lens, chunks = [], [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = text.split()
            n = len(toks)
            if n == 0:
                continue
            n_win = 1 if n <= CHUNK_W else (n - CHUNK_W + CHUNK_S - 1) // CHUNK_S + 1
            for k in range(n_win):
                s = k * CHUNK_S
                piece = toks[s : s + CHUNK_W]
                ids.append(doc_id)
                wins.append(k)
                starts.append(s)
                lens.append(len(piece))
                chunks.append(" ".join(piece))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "win_id": pa.array(wins, pa.int64()),
                         "tok_start": pa.array(starts, pa.int64()),
                         "n_toks": pa.array(lens, pa.int64()),
                         "chunk": pa.array(chunks, pa.string())})

    df = ds.map_batches(windows, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "win_id"]).reset_index(drop=True)


CHUNK_WINDOWS_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE trim(text) <> ''
), n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
w AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(
           0, CASE WHEN n <= {CHUNK_W} THEN 0
                   ELSE (n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} END)) AS k
  FROM n)
SELECT doc_id, k AS win_id, k * {CHUNK_S} AS tok_start,
       LEAST({CHUNK_W}, n - k * {CHUNK_S}) AS n_toks,
       array_to_string(toks[k * {CHUNK_S} + 1 :
                            LEAST(k * {CHUNK_S} + {CHUNK_W}, n)], ' ') AS chunk
FROM w ORDER BY doc_id, win_id
"""


GROUP_TOP_TOKENS_K = 3


def group_top_tokens(sf_dir: str, k: int = GROUP_TOP_TOKENS_K) -> pd.DataFrame:
    """Exact per-GROUP top-k tokens (the grouped complement of
    top_tokens): per-batch (source, token) count partials, one groupby
    fold, then a per-source head-k — only one partial row per
    (source, token) per batch crosses the exchange, and the final
    selection handles source groups independently."""
    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for source, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in text.split():
                c[(source, tok)] += 1
        ks = list(c.keys())
        return pa.table({
            "source": pa.array([x[0] for x in ks], pa.string()),
            "token": pa.array([x[1] for x in ks], pa.string()),
            "n": pa.array([int(v) for v in c.values()], pa.int64())})

    from ray.data.aggregate import Sum

    empty = pa.table({"source": pa.array([], pa.string()),
                      "token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def head_k(t: pa.Table) -> pa.Table:
        if "token" not in t.column_names or len(t) == 0:
            return empty
        df = (t.to_pandas()
              .sort_values(["n", "token"], ascending=[False, True]).head(k))
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df[["source", "token", "n"]],
                                    preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "token"]).aggregate(Sum("n", alias_name="n"))
           .groupby("source").map_groups(head_k, batch_format="pyarrow")
           .to_pandas())
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["source", "n", "token"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


GROUP_TOP_TOKENS_SQL = f"""
WITH t AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
c AS (SELECT source, token, COUNT(*) AS n FROM t WHERE token <> ''
      GROUP BY source, token)
SELECT source, token, n FROM c
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY n DESC, token) <= {GROUP_TOP_TOKENS_K}
ORDER BY source, n DESC, token
"""


# ----------------------------------------------- bigram collocation stats

BIGRAM_MIN_COUNT = 5
BG_BUCKETS = 64
BIGRAM_BROADCAST_ROWS = 2_000_000  # unigram (vocabulary) broadcast gate


def bigram_stats(sf_dir: str, min_count: int = BIGRAM_MIN_COUNT,
                 broadcast_rows: int = BIGRAM_BROADCAST_ROWS) -> pd.DataFrame:
    """Collocation statistics — for every bigram with corpus count >=
    min_count, its count plus both unigram counts (the exact integer
    inputs of PMI/NPMI scoring; the log itself is monotone in
    c_xy·N/(c_x·c_y), so ranking needs only these columns and the
    float never has to cross an oracle compare). Tokenization follows
    the shared contract (text.py header).

    Shuffle shape: bigram and unigram counts fold through batch-local
    Counter partials (one row per distinct gram per batch) into one
    groupby each; the c_x/c_y attach is gated like every dimension join
    in this repo — a vocabulary-sized unigram table broadcasts (ray.put
    once, both lookups inside the task that holds the bigram row, zero
    further exchange), a huge vocabulary switches to two co-partitioned
    bucket joins keyed on the left and right token hash. Threshold-0
    parity test pins the paths equal."""
    from collections import Counter

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text"])
    NB = BG_BUCKETS

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(text.split())
        return pa.table({"w": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    def bg_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            toks = text.split()
            c.update(zip(toks, toks[1:]))
        w1, w2 = ([k[0] for k in c], [k[1] for k in c])
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    # the unigram table feeds BOTH bucket joins: materialize it into the
    # object store once instead of re-folding the whole corpus per join
    uni = (ds.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("c", alias_name="c")).materialize())
    bg = (ds.map_batches(bg_partial, batch_format="pyarrow")
          .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c_xy"))
          .filter(expr=f"c_xy >= {min_count}"))

    out_cols = pa.schema([("bigram", pa.string()), ("c_xy", pa.int64()),
                          ("c_x", pa.int64()), ("c_y", pa.int64())])
    if uni.count() <= broadcast_rows:
        up = uni.to_pandas()
        uref = ray.put(dict(zip(up["w"], up["c"].astype(int))))

        def attach_both(t: pa.Table) -> pa.Table:
            if "w1" not in t.column_names or len(t) == 0:
                return out_cols.empty_table()
            m = ray.get(uref)
            df = t.to_pandas()
            return pa.table({
                "bigram": pa.array(df["w1"] + " " + df["w2"], pa.string()),
                "c_xy": pa.array(df["c_xy"].to_numpy(), pa.int64()),
                "c_x": pa.array([m[w] for w in df["w1"]], pa.int64()),
                "c_y": pa.array([m[w] for w in df["w2"]], pa.int64())})

        out = bg.map_batches(attach_both, batch_format="pyarrow").to_pandas()
        return out.sort_values("bigram").reset_index(drop=True)

    # pyarrow has no version-stable string hash kernel; crc32 is
    # deterministic across processes (Python hash() is salted and would
    # scatter the two sides of a join into different buckets).
    def crc_bucket(col) -> pa.Array:
        from zlib import crc32
        vals = col.to_pylist()
        return pa.array([crc32(v.encode("utf-8")) & (NB - 1) for v in vals],
                        pa.int32())

    from ssufid_ray.stages.relational import bucket_join

    def j1(df: pd.DataFrame) -> pa.Table:
        return pa.table({"w1": pa.array(df["k"], pa.string()),
                         "w2": pa.array(df["w2"], pa.string()),
                         "c_xy": pa.array(df["c_xy"].to_numpy(), pa.int64()),
                         "c_x": pa.array(df["c"].to_numpy(), pa.int64())})

    h1 = bucket_join(
        bg.map_batches(lambda t: pa.table(
            {"k": t["w1"], "w2": t["w2"], "c_xy": t["c_xy"]}),
            batch_format="pyarrow"),
        uni.map_batches(lambda t: pa.table({"k": t["w"], "c": t["c"]}),
                        batch_format="pyarrow"),
        key="k",
        left_cols={"w2": pa.string(), "c_xy": pa.int64()},
        right_cols={"c": pa.int64()},
        post=j1,
        out_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                              ("c_xy", pa.int64()), ("c_x", pa.int64())]),
        nb=NB, bucket_of=crc_bucket)

    def j2(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "bigram": pa.array(df["w1"] + " " + df["k"], pa.string()),
            "c_xy": pa.array(df["c_xy"].to_numpy(), pa.int64()),
            "c_x": pa.array(df["c_x"].to_numpy(), pa.int64()),
            "c_y": pa.array(df["c"].to_numpy(), pa.int64())})

    out = bucket_join(
        h1.map_batches(lambda t: pa.table(
            {"k": t["w2"], "w1": t["w1"], "c_xy": t["c_xy"],
             "c_x": t["c_x"]}) if len(t) and "w2" in t.column_names
            else pa.schema([("k", pa.string()), ("w1", pa.string()),
                            ("c_xy", pa.int64()),
                            ("c_x", pa.int64())]).empty_table(),
            batch_format="pyarrow"),
        uni.map_batches(lambda t: pa.table({"k": t["w"], "c": t["c"]}),
                        batch_format="pyarrow"),
        key="k",
        left_cols={"w1": pa.string(), "c_xy": pa.int64(),
                   "c_x": pa.int64()},
        right_cols={"c": pa.int64()},
        post=j2,
        out_schema=pa.schema([("bigram", pa.string()), ("c_xy", pa.int64()),
                              ("c_x", pa.int64()), ("c_y", pa.int64())]),
        nb=NB, bucket_of=crc_bucket).to_pandas()
    return out.sort_values("bigram").reset_index(drop=True)


BIGRAM_STATS_SQL = f"""
WITH d AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
u AS (SELECT unnest(toks) AS w FROM d),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY w),
b AS (SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1]))
             AS bigram FROM d),
bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy FROM b
       GROUP BY bigram HAVING COUNT(*) >= {BIGRAM_MIN_COUNT})
SELECT bc.bigram, bc.c_xy, u1.c AS c_x, u2.c AS c_y
FROM bc
JOIN uc u1 ON split_part(bc.bigram, ' ', 1) = u1.w
JOIN uc u2 ON split_part(bc.bigram, ' ', 2) = u2.w
ORDER BY bc.bigram
"""


# ------------------------------------- vocabulary growth (Heaps curve)

VG_BUCKETS = 10


def vocab_growth(sf_dir: str, nb: int = VG_BUCKETS) -> pd.DataFrame:
    """Vocabulary-growth curve over the bigram vocabulary (Heaps'-law
    measurement): bucket the doc-id space into `nb` fixed ranges and
    count how many DISTINCT bigrams first occur in each — the corpus
    diagnostic that tells you whether more data still buys new n-grams.

    Scale shape: first-occurrence is MIN(doc_id) per bigram; each batch
    folds a local bigram→min dict so the exchange carries one
    (md5-hi, md5-lo, min_doc) int row per distinct bigram per block —
    never the strings. The per-key fold groups on a single int bucket
    key (64 buckets) with a pandas two-key min inside (exact 128-bit
    identity, no multi-key Ray groupby), then collapses straight to
    bucket partials, so nothing vocabulary-sized reaches the driver."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def first_partial(t: pa.Table) -> pa.Table:
        first: dict[bytes, int] = {}
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = txt.split()
            for a, b in zip(toks, toks[1:]):
                g = f"{a} {b}"
                d = first.get(g)
                if d is None or did < d:
                    first[g] = did
        if not first:
            return pa.table({"b": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "fd": pa.array([], pa.int64())})
        digs = np.frombuffer(
            b"".join(hashlib.md5(g.encode()).digest() for g in first),
            dtype=">u8").reshape(-1, 2).astype(np.int64)
        return pa.table({"b": pa.array(digs[:, 0] & 63),
                         "hi": pa.array(digs[:, 0]),
                         "lo": pa.array(digs[:, 1]),
                         "fd": pa.array(np.fromiter(first.values(), np.int64,
                                                    len(first)))})

    def bucket_fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["hi", "lo"], as_index=False)["fd"].min()
        vb = (g["fd"].to_numpy().astype(np.int64) * nb) // n_docs
        c = pd.Series(vb).value_counts()
        return pa.table({"bucket": pa.array(c.index.to_numpy(np.int64)),
                         "new_bigrams": pa.array(c.to_numpy(np.int64))})

    out = (ds.map_batches(first_partial, batch_format="pyarrow")
           .groupby("b").map_groups(bucket_fold, batch_format="pandas")
           .groupby("bucket")
           .aggregate(Sum("new_bigrams", alias_name="new_bigrams"))
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    out["bucket"] = out["bucket"].astype("int64")
    out["new_bigrams"] = out["new_bigrams"].astype("int64")
    out["vocab_cum"] = out["new_bigrams"].cumsum().astype("int64")
    return out


VOCAB_GROWTH_SQL = f"""
WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
b AS (SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS g
      FROM d),
f AS (SELECT g, MIN(doc_id) AS fd FROM b GROUP BY g),
n AS (SELECT COUNT(*) AS nd FROM documents),
k AS (SELECT CAST((fd * {VG_BUCKETS}) // nd AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS new_bigrams
      FROM f, n GROUP BY 1)
SELECT bucket, new_bigrams,
       CAST(SUM(new_bigrams) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
FROM k ORDER BY bucket
"""
