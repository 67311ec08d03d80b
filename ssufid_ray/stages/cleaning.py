"""Corpus-cleaning operators for training-data pipelines: paragraph-level
exact dedup, stopword scrubbing, deterministic shuffle sharding, TF-IDF
distinctive-token extraction.

Scale design (same rules as dedup.py / relational.py):
  - paragraph_dedup: only (span_hash:int64, packed_pos:int64) pairs cross
    the shuffle — span text never leaves the producing task; winner
    selection is a bucketed group-min; per-doc kept counts a second
    int-only bucketed count. Nothing corpus-sized touches the driver
    (the per-doc result table is the query contract).
  - stopword_scrub / shuffle_shards: embarrassingly parallel map_batches,
    no exchange at all; shuffle_shards is how a 100-TB training shuffle
    is actually written (hash -> shard partition, then
    write_parquet(partition_cols=['shard'])) — not a global sort.
  - tfidf_topk: per-doc TF rows are produced and ranked inside one task
    when the document-frequency table is small enough to broadcast
    (vocabulary-sized, ray.put once); above the gate the DF table joins
    the TF rows co-partitioned by token-hash bucket and per-doc top-k
    regroups by doc-hash bucket. A threshold-0 test pins both paths to
    the same oracle result.

Determinism contract with the DuckDB oracles: tokens are ASCII [^\\s]+
runs (text.WS_TOKEN_RE == RE2 regexp_extract_all(text, '[^\\s]+')), and
the only floating-point value (tfidf score) is ONE IEEE-754 division on
both sides, so raw doubles compare exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ssufid_ray.functions.segment import SPAN_WORDS, segment_text
from ssufid_ray.stages.relational import read
from ssufid_ray.stages.text import WS_TOKEN_RE

# ------------------------------------------------------- paragraph dedup

# packed position = doc_id * _PACK + span_offset: a single int64 orders
# (doc_id, offset) lexicographically so "first occurrence wins" is a MIN
_PACK = 1 << 20
_NB = 64  # hash buckets for the group-min / group-count exchanges


def _span_hash(chunk: str) -> int:
    return int.from_bytes(hashlib.blake2b(chunk.encode("utf-8"),
                                          digest_size=8).digest(),
                          "little") >> 1  # 63-bit, stays in int64


def paragraph_dedup(sf_dir: str) -> pd.DataFrame:
    """Span-level (paragraph-level) exact dedup, the Lee et al. 2022
    "Deduplicating Training Data" building block at exact granularity:
    segment every document into the shared SPAN_WORDS-token spans
    (functions/segment.py — the same rule as span_docs, so the oracle
    reuses that expansion), keep the globally FIRST occurrence of each
    distinct span (min (doc_id, offset)), and report per document how
    many of its spans survived.

    Returns (doc_id, n_spans, n_kept, n_dropped), one row per document.
    """
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def span_pairs(t: pa.Table) -> pa.Table:
        hs, packed = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            for off, chunk in enumerate(segment_text(text)):
                if off >= _PACK:
                    raise ValueError("span offset overflows packing")
                hs.append(_span_hash(chunk))
                packed.append(doc_id * _PACK + off)
        h = pa.array(hs, pa.int64())
        return pa.table({
            "h": h,
            "packed": pa.array(packed, pa.int64()),
            "b": pc.cast(pc.bit_wise_and(h, pa.scalar(_NB - 1)), pa.int32()),
        })

    def win_per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        w = df.groupby("h", as_index=False)["packed"].min()
        doc = (w["packed"] // _PACK).to_numpy()
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "db": pa.array(doc & (_NB - 1), pa.int32()),
        })

    def kept_per_doc(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("doc_id", as_index=False).size()
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         "n_kept": pa.array(g["size"], pa.int64())})

    kept = (ds.map_batches(span_pairs, batch_format="pyarrow")
            .groupby("b").map_groups(win_per_bucket, batch_format="pyarrow")
            .groupby("db").map_groups(kept_per_doc, batch_format="pyarrow")
            .to_pandas())

    def totals(t: pa.Table) -> pa.Table:
        n = [max(1, -(-len(x.split()) // SPAN_WORDS))
             for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_spans": pa.array(n, pa.int64())})

    tot = ds.map_batches(totals, batch_format="pyarrow").to_pandas()
    out = tot.merge(kept, on="doc_id", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out["n_dropped"] = (out["n_spans"] - out["n_kept"]).astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


PARAGRAPH_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / {SPAN_WORDS}.0) AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(unnest(range(0, n)) AS BIGINT) AS off,
         unnest(list_transform(range(0, n),
                i -> array_to_string(toks[i*{SPAN_WORDS}+1 : i*{SPAN_WORDS}+{SPAN_WORDS}], ' '))) AS span_text
  FROM t
),
r AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY span_text ORDER BY doc_id, off) AS rn
  FROM s
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------------------------- stopword scrub

STOPWORDS = ("a", "the")


def stopword_scrub(sf_dir: str) -> pd.DataFrame:
    """Token-level scrub: drop stopword tokens, report how many were
    removed and the md5 of the cleaned text (single-space re-join). The
    cleaned text itself never crosses to the driver — the fingerprint is
    the verifiable contract, the real pipeline would write the cleaned
    column back out partitioned."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    stop = set(STOPWORDS)

    def scrub(t: pa.Table) -> pa.Table:
        removed, fps = [], []
        for text in t["text"].to_pylist():
            toks = WS_TOKEN_RE.findall(text)
            kept = [x for x in toks if x not in stop]
            removed.append(len(toks) - len(kept))
            fps.append(hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest())
        return pa.table({"doc_id": t["doc_id"],
                         "n_removed": pa.array(removed, pa.int64()),
                         "clean_md5": pa.array(fps, pa.string())})

    return (ds.map_batches(scrub, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
STOPWORD_SCRUB_SQL = f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
f AS (SELECT doc_id, toks,
             list_filter(toks, x -> x NOT IN ({_STOP_SQL})) AS kept
      FROM d)
SELECT doc_id,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
       md5(array_to_string(kept, ' ')) AS clean_md5
FROM f ORDER BY doc_id
"""


# ------------------------------------------------------ shuffle shards

SHUFFLE_SEED = "42"
N_SHARDS = 16


def shuffle_shards(sf_dir: str) -> pd.DataFrame:
    """Deterministic global training shuffle as a SHARD ASSIGNMENT, not a
    sort: skey = md5(doc_id || '-' || seed); shard = skey mod N_SHARDS
    (the last hex digit for N_SHARDS=16). At 100 TB the pipeline writes
    each row straight to its shard partition
    (write_parquet(partition_cols=['shard'])) and readers stream shards
    in skey order — no all-to-all sort ever runs. The returned table is
    the assignment every worker computes independently."""
    ds = read(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        keys = [hashlib.md5(f"{i}-{SHUFFLE_SEED}".encode()).hexdigest()
                for i in t["doc_id"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "skey": pa.array(keys, pa.string()),
                         "shard": pa.array([int(k[-1], 16) for k in keys],
                                           pa.int64())})

    return (ds.map_batches(assign, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


SHUFFLE_SHARDS_SQL = f"""
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || '-{SHUFFLE_SEED}') AS skey,
       CAST(strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR) || '-{SHUFFLE_SEED}'), 32, 1)) - 1
            AS BIGINT) AS shard
FROM documents ORDER BY doc_id
"""


# ----------------------------------------------------------- tf-idf topk

TFIDF_K = 3
TFIDF_BROADCAST_ROWS = 2_000_000  # DF-table (vocabulary) broadcast gate


def tfidf_topk(sf_dir: str, k: int = TFIDF_K,
               broadcast_rows: int = TFIDF_BROADCAST_ROWS) -> pd.DataFrame:
    """Per-document top-k distinctive tokens scored by tf/df (monotone in
    tf·idf for fixed tf; chosen over tf·ln(N/df) because the score is then
    ONE IEEE division on both engine and oracle — exact float compare).

    Gated like every dimension join in this repo: a vocabulary-sized DF
    table broadcasts (ray.put once, per-doc scoring + ranking entirely
    inside the task that tokenized the doc — zero exchange); a huge
    vocabulary switches to a co-partitioned token-hash join followed by a
    doc-hash regroup for the per-doc top-k. Threshold-0 parity test pins
    the paths equal."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                        ("tf", pa.int64()), ("df", pa.int64()),
                        ("score", pa.float64())])

    def df_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for text in t["text"].to_pylist():
            c.update(set(WS_TOKEN_RE.findall(text)))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array([int(v) for v in c.values()],
                                       pa.int64())})

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="df"))
             .materialize())

    if df_ds.count() <= broadcast_rows:
        dfp = df_ds.to_pandas()
        dref = ray.put(dict(zip(dfp["token"], dfp["df"].astype(int))))

        def score_batch(t: pa.Table) -> pa.Table:
            dfm = ray.get(dref)
            rows = []
            for doc_id, text in zip(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist()):
                tf_c = Counter(WS_TOKEN_RE.findall(text))
                scored = [(tf / dfm[tok], tok, tf, dfm[tok])
                          for tok, tf in tf_c.items()]
                scored.sort(key=lambda s: (-s[0], s[1]))
                rows.extend({"doc_id": doc_id, "token": tok, "tf": tf,
                             "df": df, "score": sc}
                            for sc, tok, tf, df in scored[:k])
            return pa.Table.from_pylist(rows, schema=schema)

        out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    else:
        def _tok_bucket(toks: list[str]) -> pa.Array:
            # stable cross-process hash (Python hash() is seed-randomized)
            return pa.array(
                [int.from_bytes(hashlib.blake2b(x.encode("utf-8"),
                                                digest_size=4).digest(),
                                "little") & (_NB - 1) for x in toks],
                pa.int32())

        def tf_rows(t: pa.Table) -> pa.Table:
            ids, toks, tfs = [], [], []
            for doc_id, text in zip(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist()):
                for tok, tf in Counter(WS_TOKEN_RE.findall(text)).items():
                    ids.append(doc_id)
                    toks.append(tok)
                    tfs.append(tf)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "token": pa.array(toks, pa.string()),
                             "tf": pa.array(tfs, pa.int64()),
                             "df": pa.nulls(len(ids), pa.int64()),
                             "tb": _tok_bucket(toks)})

        def df_tag(t: pa.Table) -> pa.Table:
            toks = t["token"].to_pylist()
            return pa.table({"doc_id": pa.nulls(len(toks), pa.int64()),
                             "token": t["token"],
                             "tf": pa.nulls(len(toks), pa.int64()),
                             "df": pc.cast(t["df"], pa.int64()),
                             "tb": _tok_bucket(toks)})

        both = (ds.map_batches(tf_rows, batch_format="pyarrow")
                .union(df_ds.map_batches(df_tag, batch_format="pyarrow")))

        scored_schema = pa.schema(list(schema) + [("db", pa.int32())])
        empty_scored = scored_schema.empty_table()
        empty_out = schema.empty_table()

        def join_bucket(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "df" not in t.column_names:
                return empty_scored  # empty blocks can lose schema via union
            df = t.to_pandas()
            dim = df[df["df"].notna()][["token", "df"]]
            fact = df[df["df"].isna()][["doc_id", "token", "tf"]]
            j = fact.merge(dim, on="token", how="inner")
            if len(j) == 0:
                return empty_scored
            for c in ("doc_id", "tf", "df"):
                j[c] = j[c].astype("int64")
            j["score"] = j["tf"].astype("float64") / j["df"].astype("float64")
            j["db"] = (j["doc_id"] & (_NB - 1)).astype("int32")
            return pa.Table.from_pandas(
                j[["doc_id", "token", "tf", "df", "score", "db"]],
                preserve_index=False).cast(scored_schema)

        def topk_per_doc(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return empty_out
            df = t.to_pandas()
            df = df.sort_values(["doc_id", "score", "token"],
                                ascending=[True, False, True])
            df = df.groupby("doc_id", as_index=False).head(k)
            return pa.Table.from_pandas(
                df[["doc_id", "token", "tf", "df", "score"]],
                preserve_index=False).cast(schema)

        out = (both.groupby("tb").map_groups(join_bucket,
                                             batch_format="pyarrow")
               .groupby("db").map_groups(topk_per_doc,
                                         batch_format="pyarrow")
               .to_pandas())

    for c in ("doc_id", "tf", "df"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


TFIDF_TOPK_SQL = f"""
WITH d AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[^\\s]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM d GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM d GROUP BY token),
s AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                     tf.token) AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df, score
FROM s WHERE rn <= {TFIDF_K}
ORDER BY doc_id, score DESC, token
"""


# ------------------------------------------------ normalized exact dedup

# Explicit char classes, NOT \s, and ASCII-only case folding, NOT
# str.lower(): Python's \s admits \x0b and Unicode whitespace that
# RE2's does not, and str.lower() maps non-ASCII letters (e.g. 'İ' ->
# 'i' + combining dot) where DuckDB's lower() may not — either would
# silently put engine and oracle in different dedup groups.
_NORM_WS_CHARS = " \t\n\f\r"
_NORM_STRIP_RE = re.compile(f"[^a-z0-9{_NORM_WS_CHARS}]")
_NORM_WS_RE = re.compile(f"[{_NORM_WS_CHARS}]+")
_ASCII_LOWER = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "abcdefghijklmnopqrstuvwxyz")


def _norm_text(s: str) -> str:
    """Case/punctuation-folded canonical form, mirrored token for token
    in NORMALIZED_DEDUP_SQL: ASCII A-Z translate → drop everything
    outside [a-z0-9 \\t\\n\\f\\r] → collapse those whitespace runs to one
    space → trim."""
    return _NORM_WS_RE.sub(" ", _NORM_STRIP_RE.sub(
        "", s.translate(_ASCII_LOWER))).strip()


def normalized_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup AFTER text normalization — the canonicalization pass
    that catches trivially-reformatted duplicates (case, punctuation,
    whitespace) that byte-exact dedup misses. Output: one row per doc
    with its group's canonical id (min doc_id of the identical
    normalized form) and whether it is the survivor.

    Shuffle shape: only (md5-high int64, md5-low int64, doc_id) rows
    cross the exchange — normalized text never leaves the producing
    task (the exact_dedup contract; 128 bits, collision-free at any
    corpus size). One groupby on the high word emits each group's
    min-id winner back onto its members."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hi, lo = [], []
        for s in t["text"].to_pylist():
            d = hashlib.md5(_norm_text(s).encode()).digest()
            hi.append(int.from_bytes(d[:8], "big", signed=True))
            lo.append(int.from_bytes(d[8:], "big", signed=True))
        return pa.table({"h": pa.array(hi, pa.int64()),
                         "l": pa.array(lo, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    out_schema = pa.schema([("doc_id", pa.int64()), ("canon_id", pa.int64()),
                            ("kept", pa.bool_())])

    def pick(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        canon = df.groupby(["h", "l"])["doc_id"].transform("min")
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "canon_id": pa.array(canon.to_numpy(), pa.int64()),
            "kept": pa.array(df["doc_id"].to_numpy() == canon.to_numpy())})

    out = (ds.map_batches(fp, batch_format="pyarrow")
           .groupby("h").map_groups(pick, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


NORMALIZED_DEDUP_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(
                translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                'abcdefghijklmnopqrstuvwxyz'),
                '[^a-z0-9 \t\n\f\r]', '', 'g'),
              '[ \t\n\f\r]+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, MIN(doc_id) OVER (PARTITION BY norm) AS canon_id,
       doc_id = MIN(doc_id) OVER (PARTITION BY norm) AS kept
FROM n ORDER BY doc_id
"""


# ------------------------------------------------------------ PII scrub

# RE2 syntax on BOTH sides: pyarrow's re2-backed kernels and DuckDB's
# regexp_* family — one pattern string, bit-identical replacement output.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d-]{7,}\d"


def pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction over the corpus — the curation step every training
    pipeline runs before tokenization. The synthetic documents carry no
    PII, so each doc is first augmented with a deterministic email +
    phone derived from doc_id (the SQL oracle builds the identical
    string), then scrubbed: emails first, phones on the email-scrubbed
    text (ordering matters — a long numeric email local part must not be
    double-counted as a phone). Fully vectorized re2 kernels per batch;
    the redacted text itself never reaches the driver — the output
    carries its md5 + length per doc (DuckDB md5() hashes the same UTF-8
    bytes), which pins every replacement position without shipping the
    corpus. In a real pipeline the clean column would stream straight to
    the sink via storage.write_dataset."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        dnp = did.to_numpy()
        pad4 = lambda a: pc.utf8_lpad(  # noqa: E731
            pc.cast(pa.array(a, pa.int64()), pa.string()), 4, "0")
        aug = pc.binary_join_element_wise(
            t["text"], " Contact user", pc.cast(did, pa.string()),
            "@example.com or +82-10-",
            pad4(dnp % 10000), "-", pad4(dnp % 9999),
            " now.", "")
        n_email = pc.cast(pc.count_substring_regex(aug, PII_EMAIL_RE),
                          pa.int64())
        clean1 = pc.replace_substring_regex(aug, PII_EMAIL_RE, "[EMAIL]")
        n_phone = pc.cast(pc.count_substring_regex(clean1, PII_PHONE_RE),
                          pa.int64())
        clean = pc.replace_substring_regex(clean1, PII_PHONE_RE, "[PHONE]")
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in clean.to_pylist()]
        return pa.table({"doc_id": did, "n_email": n_email,
                         "n_phone": n_phone,
                         "clean_len": pc.cast(pc.utf8_length(clean),
                                              pa.int64()),
                         "clean_md5": pa.array(md5s, pa.string())})

    out = ds.map_batches(scrub, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


PII_SCRUB_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +82-10-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-'
              || lpad(CAST(doc_id % 9999 AS VARCHAR), 4, '0')
              || ' now.' AS s
  FROM documents),
e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(s, '{PII_EMAIL_RE}')) AS BIGINT)
           AS n_email,
         regexp_replace(s, '{PII_EMAIL_RE}', '[EMAIL]', 'g') AS s1
  FROM aug)
SELECT doc_id, n_email,
       CAST(len(regexp_extract_all(s1, '{PII_PHONE_RE}')) AS BIGINT)
         AS n_phone,
       CAST(length(regexp_replace(s1, '{PII_PHONE_RE}', '[PHONE]', 'g'))
            AS BIGINT) AS clean_len,
       md5(regexp_replace(s1, '{PII_PHONE_RE}', '[PHONE]', 'g'))
         AS clean_md5
FROM e ORDER BY doc_id
"""
