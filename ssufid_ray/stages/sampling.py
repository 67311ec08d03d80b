"""Sampling and quantile operators for training-data curation.

`stratified_sample` is the deterministic per-stratum downsampler every
corpus-mixing pipeline needs (keep X% of each language); the keep decision
is a pure hash of the row key, so it is reproducible, resumable and
SQL-mirrorable (the DuckDB oracle computes the same hash in BIGINT).

`exact_quantiles` computes EXACT order statistics over a fact-sized column
without a global sort: pass 0 bounds the range with per-batch (min, max,
count) partials; pass 1 histograms the column into fixed bins (per-batch
partial vectors, one tiny groupby); the driver locates each target rank's
bin from the 2048-row histogram and pass 2 re-reads only rows falling in
candidate bins (a ~1/2048 slice). A skewed bin that still exceeds the
collect limit is re-histogrammed recursively within its own range, so the
driver never materializes more than `collect_limit` values no matter the
distribution. DuckDB oracle: quantile_disc (rank = ceil(q*n), 1-based —
probed semantics, pinned in tests).

`group_quantiles` is the per-group complement (median/deciles per
language) via groupby().map_groups — partitioning assumption: one group's
rows fit one task (bounded group cardinality x bounded skew), the same
contract as sessionize/asof_join.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ssufid_ray.stages.dedup import NGRAM_N
from ssufid_ray.stages.relational import read

# ------------------------------------------------------------ stratified

# per-language keep rates in permille; the hash is a Knuth multiplicative
# mix computed identically in numpy int64 and DuckDB BIGINT (doc_id is
# pre-reduced mod a prime so the product stays far from both overflow
# boundaries at any realistic id range)
SAMPLE_RATES = {"en": 200, "de": 500, "es": 500, "fr": 500, "zh": 500}
_SAMPLE_PRIME = 1_000_003
_SAMPLE_MULT = 2_654_435_761
_SAMPLE_MOD = 4_294_967_296  # 2^32


def _keep_hash(doc_id: np.ndarray) -> np.ndarray:
    return ((doc_id % _SAMPLE_PRIME) * _SAMPLE_MULT + 12345) % _SAMPLE_MOD


def stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling by language: keep
    SAMPLE_RATES[lang] permille of each stratum, decided by a pure row
    hash — no randomness, no coordination, embarrassingly parallel (each
    batch filters independently; nothing crosses an exchange)."""
    ds = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = _keep_hash(ids) % 1000
        # unknown languages keep nothing — same as the oracle's CASE
        # without ELSE (NULL comparison filters the row)
        rates = np.array([SAMPLE_RATES.get(x, 0) for x in t["lang"].to_pylist()],
                         dtype=np.int64)
        return t.filter(pa.array(h < rates))

    df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


_RATE_CASE = " ".join(
    f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items()))
STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ((doc_id % {_SAMPLE_PRIME}) * {_SAMPLE_MULT} + 12345) % {_SAMPLE_MOD}
      % 1000 < CASE lang {_RATE_CASE} END
ORDER BY doc_id
"""


# -------------------------------------------------------- exact quantiles

QUANTILES = (0.25, 0.5, 0.75, 0.95)
N_BINS = 2048
COLLECT_LIMIT = 200_000  # max values the driver will ever hold


def _hist_pass(ds, lo: float, hi: float) -> np.ndarray:
    """One histogram pass: per-batch partial bin-count vectors, folded by
    a tiny groupby — the driver sees N_BINS rows, never the column."""
    from ray.data.aggregate import Sum

    width = (hi - lo) / N_BINS or 1.0

    def partial(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, N_BINS - 1)
        binc = np.bincount(b, minlength=N_BINS)
        nz = np.nonzero(binc)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(binc[nz], pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")).take_all())
    counts = np.zeros(N_BINS, dtype=np.int64)
    for r in rows:
        counts[r["bin"]] = r["n"]
    return counts


def _bin_slice(ds, lo: float, hi: float, bins: list[int]):
    """Dataset of rows of `v` falling in any of `bins` of the [lo, hi)
    histogram grid — ONE filtered pass, tagged with the bin index so the
    driver can split the collected slice per bin."""
    width = (hi - lo) / N_BINS or 1.0
    want = np.zeros(N_BINS, dtype=bool)
    want[bins] = True

    def pick(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, N_BINS - 1)
        m = want[b]
        return pa.table({"bin": pa.array(b[m], pa.int64()),
                         "v": pa.array(v[m], pa.float64())})

    return ds.map_batches(pick, batch_format="pyarrow")


def _kth_by_value_counts(ds, k: int) -> float:
    """Exact k-th smallest when the remaining range holds only a handful
    of distinct doubles: per-value counts (tiny groupby result), walk the
    cumulative counts to rank k. Terminates the narrowing loop when a
    single value's multiplicity exceeds COLLECT_LIMIT — re-binning
    identical values can never drop the count, so range narrowing alone
    would loop forever there."""
    vc = (ds.groupby("v").count().to_pandas().sort_values("v"))
    cum = vc["count()"].to_numpy().cumsum()
    return float(vc["v"].to_numpy()[int(np.searchsorted(cum, k))])


def _kth_smallest(ds, k: int, lo: float, hi: float) -> float:
    """Exact k-th smallest (1-based) of column `v` in [lo, hi]: histogram,
    walk the CDF to rank k's bin, then either collect that bin (small) or
    recurse into its sub-range (skew fallback — driver never holds more
    than COLLECT_LIMIT values). A range narrowed to float resolution means
    the bin is mass on a few identical values; switch to exact per-value
    counts (the heavy-multiplicity terminator)."""
    while True:
        if hi - lo <= max(abs(lo), abs(hi), 1e-12) * 1e-12:
            return _kth_by_value_counts(ds, k)
        counts = _hist_pass(ds, lo, hi)
        width = (hi - lo) / N_BINS or 1.0
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, k))
        k_in = k - (int(cum[b - 1]) if b else 0)
        b_lo, b_hi = lo + b * width, lo + (b + 1) * width
        if int(counts[b]) <= COLLECT_LIMIT:
            vals = np.sort(_bin_slice(ds, lo, hi, [b]).to_pandas()["v"].to_numpy())
            return float(vals[k_in - 1])
        ds, lo, hi, k = _bin_slice(ds, lo, hi, [b]), b_lo, b_hi, k_in  # recurse


def _rank_values(ds, ranks: dict[float, int], lo: float,
                 hi: float, total: int | None = None) -> dict[float, float]:
    """Exact value at each 1-based rank of column `v` (the shared
    histogram-method core): ONE histogram pass locates every target
    rank's bin, ONE filtered pass collects all small bins together; only
    a pathologically skewed bin (> COLLECT_LIMIT rows) triggers the
    per-rank recursive narrowing. Driver never holds more than
    COLLECT_LIMIT values per collected bin.

    When the caller knows the column fits that same driver-hold bound
    (total <= COLLECT_LIMIT), one collect + sort replaces the histogram
    and slice rounds entirely — the small-side gate every caller already
    pays a Count() for.

    Contract: callers pass a NULL/NaN-free column (all current callers
    cast/filter upstream) — NaNs would sort to the end here but clip to
    bin 0 on the histogram path, silently shifting ranks. An empty column
    cannot satisfy any rank, so it is rejected rather than falling into
    np.concatenate([])."""
    if total is not None and total == 0:
        raise ValueError("_rank_values: empty column has no rank values")
    if total is not None and total <= COLLECT_LIMIT:
        tabs = [t for t in ray.get(ds.to_arrow_refs())
                if t.num_rows and "v" in t.column_names]
        vs = np.sort(np.concatenate(
            [t["v"].to_numpy(zero_copy_only=False) for t in tabs]))
        return {q: float(vs[k - 1]) for q, k in ranks.items()}
    counts = _hist_pass(ds, lo, hi)
    cum = np.cumsum(counts)
    bin_of = {q: int(np.searchsorted(cum, k)) for q, k in ranks.items()}
    small = sorted({b for b in bin_of.values() if counts[b] <= COLLECT_LIMIT})

    by_bin: dict[int, np.ndarray] = {}
    if small:
        got = _bin_slice(ds, lo, hi, small).to_pandas()
        for b, grp in got.groupby("bin"):
            by_bin[int(b)] = np.sort(grp["v"].to_numpy())

    width = (hi - lo) / N_BINS or 1.0
    out = {}
    for q, k in ranks.items():
        b = bin_of[q]
        k_in = k - (int(cum[b - 1]) if b else 0)
        if b in by_bin:
            out[q] = float(by_bin[b][k_in - 1])
        else:  # skewed bin: narrow recursively within its own range
            out[q] = _kth_smallest(_bin_slice(ds, lo, hi, [b]), k_in,
                                   lo + b * width, lo + (b + 1) * width)
    return out


def exact_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact quantiles of lineitem.l_extendedprice via the shared
    histogram method (_rank_values). No global sort. Rank rule matches
    DuckDB quantile_disc: ceil(q * n), 1-based."""
    from ray.data.aggregate import Count, Max, Min

    ds = read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"v": pc.cast(t["l_extendedprice"], pa.float64())}),
        batch_format="pyarrow")
    stats = ds.aggregate(Min("v"), Max("v"), Count())
    lo, hi = float(stats["min(v)"]), float(stats["max(v)"])
    total = int(stats["count()"])

    ranks = {q: math.ceil(q * total) for q in QUANTILES}  # oracle's double mult
    vals = _rank_values(ds, ranks, lo, hi, total=total)
    return pd.DataFrame([{"q": q, "value": vals[q]} for q in QUANTILES])


EXACT_QUANTILES_SQL = "\nUNION ALL\n".join(
    f"SELECT {q} AS q, quantile_disc(l_extendedprice, {q}) AS value FROM lineitem"
    for q in QUANTILES) + "\nORDER BY q"


# --------------------------------------------------------- decontamination

DECON_BENCH_MAX = 50  # doc_id < 50 plays the held-out benchmark set


def _norm_fps(texts: list[str]) -> list[str]:
    """Normalized content fingerprint (md5 of lowercased trimmed text) —
    the ONE definition of the decontamination blocklist identity, shared
    by decontaminate and curation_pipeline (and mirrored by their
    oracles' md5(lower(trim(text))))."""
    return [hashlib.md5(x.strip().lower().encode("utf-8")).hexdigest()
            for x in texts]


def decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: drop every document whose exact content
    fingerprint (md5 of lowercased trimmed text) appears in the benchmark
    set (doc_id < DECON_BENCH_MAX stands in for it). The blocklist is
    BOUNDED (benchmarks are), so it broadcasts once via ray.put and each
    batch filters locally — nothing shuffles. A corpus-scale blocklist
    would instead hash-partition both sides on fingerprint and anti-join
    per bucket (the exact_dedup exchange shape)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    bench = ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], pa.scalar(DECON_BENCH_MAX))),
        batch_format="pyarrow").to_pandas()
    block = ray.put(frozenset(_norm_fps(bench["text"].tolist())))

    def survive(t: pa.Table) -> pa.Table:
        bl = ray.get(block)
        keep = [fp not in bl for fp in _norm_fps(t["text"].to_pylist())]
        return t.filter(pa.array(keep)).select(["doc_id"])

    df = ds.map_batches(survive, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DECONTAMINATE_SQL = f"""
WITH bl AS (SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
            WHERE doc_id < {DECON_BENCH_MAX})
SELECT doc_id FROM documents
WHERE md5(lower(trim(text))) NOT IN (SELECT fp FROM bl)
ORDER BY doc_id
"""


def contamination_overlap_rate(sf_dir: str) -> pd.DataFrame:
    """Per-document benchmark n-gram overlap RATE — the graded companion
    of the binary `decontaminate` drop: for every candidate document
    (doc_id >= DECON_BENCH_MAX), the fraction of its distinct NGRAM_N-gram
    shingles that appear anywhere in the benchmark docs' shingle union
    (the standard train/test contamination report, e.g. GPT-3 appendix C
    style n-gram overlap). The benchmark side is bounded, so its gram set
    broadcasts once via ray.put and candidates stream through one
    map_batches — nothing shuffles; a corpus-sized blocklist would
    hash-partition grams and count matches per bucket (dup_gram_stats'
    exchange shape). Fully SQL-mirrored."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(text: str) -> set:
        toks = text.split()
        n = max(1, len(toks) - NGRAM_N + 1)
        return {" ".join(toks[i: i + NGRAM_N]) for i in range(n)}

    bench = ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], pa.scalar(DECON_BENCH_MAX))),
        batch_format="pyarrow").to_pandas()
    grams: set = set()
    for txt in bench["text"]:
        grams |= shingles(txt)
    gref = ray.put(frozenset(grams))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("overlap_rate", pa.float64())])

    def rate(t: pa.Table) -> pa.Table:
        g = ray.get(gref)
        keep = pc.greater_equal(t["doc_id"], pa.scalar(DECON_BENCH_MAX))
        t = t.filter(keep)
        ids, rates = [], []
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = shingles(txt)
            ids.append(i)
            rates.append(len(sh & g) / len(sh))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "overlap_rate": pa.array(rates, pa.float64())},
                        schema=out_schema)

    df = ds.map_batches(rate, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


CONTAMINATION_RATE_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(1, len(toks) - {NGRAM_N - 1})),
             i -> array_to_string(toks[i : i + {NGRAM_N - 1}], ' '))) AS sh
  FROM t
), bl AS (
  SELECT list(DISTINCT g) AS gs
  FROM (SELECT unnest(sh) AS g FROM s WHERE doc_id < {DECON_BENCH_MAX})
)
SELECT s.doc_id AS doc_id,
       CAST(len(list_intersect(s.sh, bl.gs)) AS DOUBLE) / len(s.sh)
         AS overlap_rate
FROM s, bl WHERE s.doc_id >= {DECON_BENCH_MAX}
ORDER BY doc_id
"""


# --------------------------------------------------------- corpus mixing

# target mix in permille (integer arithmetic end to end so engine and
# oracle agree exactly; floats would disagree on floor boundaries)
MIX_TARGET_PERMILLE = {"en": 400, "de": 150, "es": 150, "fr": 150, "zh": 150}
MIX_TOPK_GATE = 100_000  # per-lang k above which the rank path must switch


def _mix_quota(counts: dict[str, int]) -> dict[str, int]:
    """Exact per-language quotas: the largest output size N for which
    every language can supply its share, then k_s = p_s * N // 1000."""
    n_out = min(counts[s] * 1000 // p for s, p in MIX_TARGET_PERMILLE.items())
    return {s: p * n_out // 1000 for s, p in MIX_TARGET_PERMILLE.items()}


def corpus_mix(sf_dir: str) -> pd.DataFrame:
    """Deterministic corpus mixing to an exact target proportion: per
    language keep the k_s documents with the smallest row hash (ties by
    doc_id), where the quotas come from one tiny count aggregate. The
    selection is a grouped top-k: per-batch partial top-k caps what
    crosses the exchange at k_s rows per (batch, lang), and the per-lang
    merge sees at most n_blocks * k_s candidate rows. That holds to
    k_s ~ MIX_TOPK_GATE; a 100-TB run with corpus-proportional quotas
    switches to the histogram-threshold path (find the k_s-th smallest
    hash per language with exact_quantiles' narrowing machinery, then one
    stateless filter pass) — same contract, O(passes) independent of k."""
    ds = read(sf_dir, "documents", ["doc_id", "lang"])

    counts_df = ds.groupby("lang").count().to_pandas()
    counts = dict(zip(counts_df["lang"], counts_df["count()"].astype(int)))
    quota = _mix_quota(counts)
    if max(quota.values()) > MIX_TOPK_GATE:
        raise NotImplementedError(
            "corpus-proportional quota: use the histogram-threshold path")

    def partial_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                           "lang": t["lang"].to_pylist()})
        df["h"] = _keep_hash(df["doc_id"].to_numpy())
        parts = []
        for s, grp in df.groupby("lang"):
            k = quota.get(s, 0)
            if k:
                parts.append(grp.sort_values(["h", "doc_id"]).head(k))
        out = (pd.concat(parts, ignore_index=True) if parts
               else df.iloc[0:0])
        return pa.Table.from_pandas(out[["doc_id", "lang", "h"]],
                                    preserve_index=False)

    def merge_lang(df: pd.DataFrame) -> pd.DataFrame:
        if "lang" not in df.columns or not len(df):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "lang": pd.Series(dtype="object")})
        k = quota.get(df["lang"].iloc[0], 0)
        return (df.sort_values(["h", "doc_id"]).head(k)[["doc_id", "lang"]])

    out = (ds.map_batches(partial_topk, batch_format="pyarrow")
           .groupby("lang").map_groups(merge_lang, batch_format="pandas")
           .to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_MIX_VALUES = ", ".join(f"('{s}', {p})"
                        for s, p in sorted(MIX_TARGET_PERMILLE.items()))
CORPUS_MIX_SQL = f"""
WITH t(lang, p) AS (VALUES {_MIX_VALUES}),
c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
nout AS (SELECT MIN(n * 1000 // p) AS n_out FROM c JOIN t USING (lang)),
k AS (SELECT t.lang, t.p * nout.n_out // 1000 AS k_s FROM t CROSS JOIN nout),
r AS (SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ((doc_id % {_SAMPLE_PRIME}) * {_SAMPLE_MULT} + 12345)
                          % {_SAMPLE_MOD}, doc_id) AS rn
      FROM documents)
SELECT doc_id, lang FROM r JOIN k USING (lang) WHERE rn <= k_s
ORDER BY doc_id
"""


# --------------------------------------------------------- sequence packing

PACK_BUDGET = 256      # tokens per packed training sequence
PACK_PART_DOCS = 200   # docs per packing partition (fixed doc-id ranges)


def sequence_pack(sf_dir: str) -> pd.DataFrame:
    """Greedy next-fit sequence packing (the training-data batching op):
    documents in doc_id order are appended to the current sequence until
    the next one would exceed PACK_BUDGET tokens, which starts a new
    sequence (an over-budget doc gets a sequence of its own).

    Distribution contract: packing is next-fit WITHIN fixed doc-id ranges
    of PACK_PART_DOCS documents (a sequence never spans a partition), so
    every partition packs independently of Ray block boundaries and the
    result is deterministic under any parallelism. Global seq_ids come
    from a prefix sum over the per-partition sequence counts — the only
    cross-partition traffic is one tiny count row per partition. At real
    scale the partition is ~1e6 docs, keeping that offset table small.
    Token contract: text.WS_TOKEN_RE (ASCII [^\\s]+ runs, RE2 parity)."""
    from ssufid_ray.stages.text import WS_TOKEN_RE as ws

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def lengths(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        dl = [len(ws.findall(x)) for x in t["text"].to_pylist()]
        return pa.table({"part": pa.array(ids // PACK_PART_DOCS, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "dl": pa.array(dl, pa.int64())})

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        if "doc_id" not in df.columns or not len(df):
            return pd.DataFrame({"part": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "local_seq": pd.Series([], dtype="int64")})
        df = df.sort_values("doc_id")
        seqs, seq, fill = [], 0, 0
        for dl in df["dl"].to_numpy():
            if fill and fill + dl > PACK_BUDGET:
                seq, fill = seq + 1, 0
            fill += dl
            seqs.append(seq)
        return pd.DataFrame({"part": df["part"].to_numpy(),
                             "doc_id": df["doc_id"].to_numpy(),
                             "local_seq": np.array(seqs, dtype="int64")})

    # materialized: `packed` is consumed twice (counts + finalize) and the
    # tokenize+pack lineage must not re-execute per consumer
    packed = (ds.map_batches(lengths, batch_format="pyarrow")
              .groupby("part").map_groups(pack_group, batch_format="pandas")
              .materialize())

    # prefix-sum the per-partition sequence counts -> global offsets
    from ray.data.aggregate import Max

    counts = (packed.groupby("part").aggregate(Max("local_seq", alias_name="m"))
              .to_pandas().sort_values("part"))
    counts["off"] = (counts["m"] + 1).cumsum().shift(fill_value=0)
    off = dict(zip(counts["part"].astype("int64"), counts["off"].astype("int64")))

    def finalize(t: pa.Table) -> pa.Table:
        if "part" not in t.column_names or len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "seq_id": pa.array([], pa.int64())})
        base = np.array([off[p] for p in t["part"].to_pylist()], dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "seq_id": pa.array(base + t["local_seq"].to_numpy())})

    df = packed.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


SEQUENCE_PACK_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id // {PACK_PART_DOCS} AS part,
         CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT) AS dl,
         row_number() OVER (PARTITION BY doc_id // {PACK_PART_DOCS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT part, rn, doc_id, dl, CAST(0 AS BIGINT) AS local_seq, dl AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.part, d.rn, d.doc_id, d.dl,
         CASE WHEN p.fill > 0 AND p.fill + d.dl > {PACK_BUDGET}
              THEN p.local_seq + 1 ELSE p.local_seq END,
         CASE WHEN p.fill > 0 AND p.fill + d.dl > {PACK_BUDGET}
              THEN d.dl ELSE p.fill + d.dl END
  FROM d JOIN pack p ON d.part = p.part AND d.rn = p.rn + 1
),
nseq AS (SELECT part, MAX(local_seq) + 1 AS n FROM pack GROUP BY part),
offs AS (SELECT part,
                SUM(n) OVER (ORDER BY part
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS off
         FROM nseq)
SELECT p.doc_id, CAST(COALESCE(o.off, 0) + p.local_seq AS BIGINT) AS seq_id
FROM pack p JOIN offs o USING (part)
ORDER BY p.doc_id
"""


# --------------------------------------------------------- group quantiles


def group_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-language median + p90 of document length: groupby(lang) with an
    in-group sort — the bounded-group partition contract (5 languages)."""
    ds = read(sf_dir, "documents", ["lang", "n_chars"])

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["n_chars"].to_numpy())
        n = v.size
        pick = lambda q: int(v[math.ceil(q * n) - 1])  # noqa: E731
        return pd.DataFrame({"lang": [df["lang"].iloc[0]],
                             "n_docs": np.array([n], dtype="int64"),
                             "p50": np.array([pick(0.5)], dtype="int64"),
                             "p90": np.array([pick(0.9)], dtype="int64")})

    out = ds.groupby("lang").map_groups(per_lang, batch_format="pandas")
    df = out.to_pandas()
    for c in ("n_docs", "p50", "p90"):
        df[c] = df[c].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)


GROUP_QUANTILES_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------- quality filter

QF_Q_LO, QF_Q_HI = 0.1, 0.9
QF_REP_MAX = 0.05


def _quality_pass(sf_dir: str) -> ray.data.Dataset:
    """Shared quality gate (the Gopher-style pass as ONE pipeline): keep
    documents whose whitespace-token count lies inside the corpus' own
    [p10, p90] band AND whose duplicate-bigram fraction is at most
    QF_REP_MAX. The percentile band comes from the exact distributed
    quantile machinery above (histogram passes, no global sort, nothing
    corpus-sized on the driver); the two scalar cutoffs then broadcast and
    every batch filters independently. Returns the surviving
    (doc_id, n_tokens, dup_bigram_frac) Dataset — quality_filter
    registers it directly, curation_pipeline chains dedup +
    decontamination after it."""
    from collections import Counter

    from ssufid_ray.stages.text import WS_TOKEN_RE

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def metrics(t: pa.Table) -> pa.Table:
        ids, ns, fr = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            tk = WS_TOKEN_RE.findall(text)
            bg = Counter(zip(tk, tk[1:]))
            nb = sum(bg.values())
            ids.append(doc_id)
            ns.append(len(tk))
            fr.append(1.0 - len(bg) / nb if nb else 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ns, pa.int64()),
                         "dup_bigram_frac": pa.array(fr, pa.float64())})

    from ray.data.aggregate import Count, Max, Min

    m = ds.map_batches(metrics, batch_format="pyarrow").materialize()
    v = m.map_batches(
        lambda t: pa.table({"v": pc.cast(t["n_tokens"], pa.float64())}),
        batch_format="pyarrow").materialize()
    stats = v.aggregate(Min("v"), Max("v"), Count())
    vmin, vmax = float(stats["min(v)"]), float(stats["max(v)"])
    total = int(stats["count()"])
    # shared histogram-method core: one pass locates both quantile ranks
    ranks = {q: math.ceil(q * total) for q in (QF_Q_LO, QF_Q_HI)}
    vals = _rank_values(v, ranks, vmin, vmax, total=total)
    lo, hi = vals[QF_Q_LO], vals[QF_Q_HI]

    def keep(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy()
        f = t["dup_bigram_frac"].to_numpy()
        return t.filter(pa.array((n >= lo) & (n <= hi) & (f <= QF_REP_MAX)))

    return m.map_batches(keep, batch_format="pyarrow")


def quality_filter(sf_dir: str) -> pd.DataFrame:
    """The quality gate as a registered query (see _quality_pass). The
    fraction is one IEEE division on both sides (repetition_scores
    contract), and the band bounds are integers, so the oracle compare
    is exact."""
    out = _quality_pass(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUALITY_FILTER_SQL = f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
b AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
      FROM d),
m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(bg) > 0
                  THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                  ELSE 0.0 END AS dup_bigram_frac
      FROM b),
q AS (SELECT quantile_disc(n_tokens, {QF_Q_LO}) AS lo,
             quantile_disc(n_tokens, {QF_Q_HI}) AS hi FROM m)
SELECT doc_id, n_tokens, dup_bigram_frac
FROM m, q
WHERE n_tokens BETWEEN lo AND hi AND dup_bigram_frac <= {QF_REP_MAX}
ORDER BY doc_id
"""


# --------------------------------------- exact per-group bottom-k sample

GROUP_SAMPLE_K = 5
_GS_MULT = 1_103_515_245
_GS_ADD = 77
_GS_MOD = 2_147_483_647


def group_sample_k(sf_dir: str, k: int = GROUP_SAMPLE_K) -> pd.DataFrame:
    """Exact k-per-group consistent sample: for every source, the k docs
    with the smallest deterministic hash of doc_id (ties by doc_id). The
    complement of stratified_sample's rate filter — this one guarantees
    EXACTLY k rows per group, which needs a (tiny) merge: each block
    keeps at most k rows per group it saw, so only k x groups x blocks
    candidate rows ever leave the scan, and the final selection runs
    over that bounded candidate set. No corpus-sized exchange; the hash
    is pure int64 arithmetic mirrored verbatim in the oracle."""
    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["h"] = (df["doc_id"].to_numpy(dtype=np.int64) % _GS_MOD
                   * _GS_MULT + _GS_ADD) % _GS_MOD
        df = df.sort_values(["h", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (cand.sort_values(["h", "doc_id"]).groupby("source").head(k)
           [["source", "doc_id", "n_chars"]])
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


GROUP_SAMPLE_K_SQL = f"""
SELECT source, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY (doc_id % {_GS_MOD} * {_GS_MULT} + {_GS_ADD}) % {_GS_MOD}, doc_id
) <= {GROUP_SAMPLE_K}
ORDER BY source, doc_id
"""


# ------------------------------------------- end-to-end curation pipeline

CURATION_JB = 64  # doc_id / fingerprint exchange width


def curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """Flagship END-TO-END curation run, composed as one streaming
    pipeline the way a real training-data job chains its stages:
      1. quality gate  — corpus-own [p10, p90] token band + repetition
         cap (_quality_pass; two scalar cutoffs broadcast)
      2. exact dedup   — among the survivors, first occurrence per text
         fingerprint wins (co-partitioned int/hex exchanges only)
      3. decontaminate — drop survivors whose normalized fingerprint
         appears in the bounded benchmark blocklist (broadcast set)
    Stage order matters (dedup runs on quality survivors, decon on dedup
    winners) and the oracle mirrors it as a CTE chain, so the hash gate
    pins the COMPOSITION, not just the pieces."""
    surv = _quality_pass(sf_dir)  # (doc_id, n_tokens, dup_bigram_frac)
    docs = read(sf_dir, "documents", ["doc_id", "text"])

    # one fingerprint pass over the corpus: raw md5 for dedup identity,
    # normalized md5 for the decontamination blocklist
    def fps(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "jb": pc.cast(pc.bit_wise_and(t["doc_id"],
                                          pa.scalar(CURATION_JB - 1)),
                          pa.int32()),
            "fp_raw": pa.array([hashlib.md5(x.encode()).hexdigest()
                                for x in texts], pa.string()),
            "fp_norm": pa.array(_norm_fps(texts), pa.string()),
            "n_tokens": pa.nulls(len(t), pa.int64())})

    def surv_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "jb": pc.cast(pc.bit_wise_and(t["doc_id"],
                                          pa.scalar(CURATION_JB - 1)),
                          pa.int32()),
            "fp_raw": pa.nulls(len(t), pa.string()),
            "fp_norm": pa.nulls(len(t), pa.string()),
            "n_tokens": t["n_tokens"]})

    joined_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                               ("fp_raw", pa.string()), ("fp_norm", pa.string()),
                               ("fb", pa.int32())])

    def attach_fp(t: pa.Table) -> pa.Table:
        if "fp_raw" not in t.column_names or len(t) == 0:
            return joined_schema.empty_table()
        df = t.to_pandas()
        fp = df[df["n_tokens"].isna()][["doc_id", "fp_raw", "fp_norm"]]
        sv = df[df["n_tokens"].notna()][["doc_id", "n_tokens"]]
        j = sv.merge(fp, on="doc_id", how="inner")
        j["n_tokens"] = j["n_tokens"].astype("int64")
        j["fb"] = (j["fp_raw"].str[:4].apply(int, base=16) % CURATION_JB
                   ).astype("int32")
        return pa.Table.from_pandas(
            j[["doc_id", "n_tokens", "fp_raw", "fp_norm", "fb"]],
            preserve_index=False, schema=joined_schema)

    survivors = (surv.map_batches(surv_rows, batch_format="pyarrow")
                 .union(docs.map_batches(fps, batch_format="pyarrow"))
                 .groupby("jb").map_groups(attach_fp, batch_format="pyarrow"))

    # bounded benchmark blocklist -> broadcast set (decontaminate contract)
    bl_rows = (docs.map_batches(
        lambda t: pa.table({"fp": pa.array(_norm_fps(
            [x for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
             if i < DECON_BENCH_MAX]), pa.string())}),
        batch_format="pyarrow").take_all())
    bl_ref = ray.put(frozenset(r["fp"] for r in bl_rows))

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])

    def dedup_and_decon(t: pa.Table) -> pa.Table:
        if "fp_raw" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas().sort_values("doc_id")
        win = df.groupby("fp_raw", as_index=False).first()
        bl = ray.get(bl_ref)
        win = win[~win["fp_norm"].isin(bl)]
        return pa.Table.from_pandas(win[["doc_id", "n_tokens"]],
                                    preserve_index=False, schema=out_schema)

    out = (survivors.groupby("fb")
           .map_groups(dedup_and_decon, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


CURATION_PIPELINE_SQL = f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS toks FROM documents),
b AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
      FROM d),
m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(bg) > 0
                  THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                  ELSE 0.0 END AS dup_bigram_frac
      FROM b),
q AS (SELECT quantile_disc(n_tokens, {QF_Q_LO}) AS lo,
             quantile_disc(n_tokens, {QF_Q_HI}) AS hi FROM m),
pass AS (SELECT doc_id, n_tokens FROM m, q
         WHERE n_tokens BETWEEN lo AND hi
           AND dup_bigram_frac <= {QF_REP_MAX}),
fp AS (SELECT doc_id, md5(text) AS fr, md5(lower(trim(text))) AS fn
       FROM documents),
ded AS (SELECT min(p.doc_id) AS doc_id
        FROM pass p JOIN fp ON p.doc_id = fp.doc_id GROUP BY fp.fr),
bl AS (SELECT DISTINCT md5(lower(trim(text))) AS f FROM documents
       WHERE doc_id < {DECON_BENCH_MAX})
SELECT p.doc_id AS doc_id, p.n_tokens
FROM ded JOIN pass p ON ded.doc_id = p.doc_id
JOIN fp ON fp.doc_id = p.doc_id
WHERE fp.fn NOT IN (SELECT f FROM bl)
ORDER BY p.doc_id
"""


# ------------------------------------------------- MAD outlier detection

MAD_K_NUM, MAD_K_DEN = 2, 1  # threshold multiplier, kept rational


def mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust per-group outlier detection (median absolute deviation):
    orders whose price deviates from their priority group's median by
    more than k x MAD. Both medians use the repo's probed quantile_disc
    semantics (1-based rank ceil(q*n) over the sorted values — the
    group_quantiles contract); the deviation and threshold are single
    IEEE ops on both sides, so the oracle compare is exact. One exchange:
    groups are bounded (5 priorities) and each fits a task — the
    sessionize partitioning contract."""
    ds = read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"])

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_orderpriority", pa.string()),
                            ("o_totalprice", pa.float64())])

    def outliers(t: pa.Table) -> pa.Table:
        if "o_totalprice" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        v = df["o_totalprice"].to_numpy()
        med = np.sort(v)[math.ceil(0.5 * v.size) - 1]  # quantile_disc(.5)
        dev = np.abs(v - med)
        mad = np.sort(dev)[math.ceil(0.5 * dev.size) - 1]
        keep = df[dev > (MAD_K_NUM / MAD_K_DEN) * mad]
        keep = keep.copy()
        keep["o_totalprice"] = keep["o_totalprice"].round(2)
        return pa.Table.from_pandas(
            keep[["o_orderkey", "o_orderpriority", "o_totalprice"]],
            preserve_index=False, schema=out_schema)

    out = (ds.groupby("o_orderpriority")
           .map_groups(outliers, batch_format="pyarrow").to_pandas())
    return out.sort_values("o_orderkey").reset_index(drop=True)


MAD_OUTLIERS_SQL = f"""
WITH m AS (SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS med
           FROM orders GROUP BY 1),
d AS (SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
             abs(o.o_totalprice - med) AS dev
      FROM orders o JOIN m USING (o_orderpriority)),
s AS (SELECT o_orderpriority, quantile_disc(dev, 0.5) AS mad
      FROM d GROUP BY 1)
SELECT o_orderkey, d.o_orderpriority,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM d JOIN s USING (o_orderpriority)
WHERE dev > ({MAD_K_NUM} / {MAD_K_DEN}) * mad
ORDER BY o_orderkey
"""


# ------------------------------------------------- winsorized aggregation

WIN_Q_LO, WIN_Q_HI = 0.05, 0.95


def winsorized_rollup(sf_dir: str) -> pd.DataFrame:
    """Per-group winsorized sum — the robust-aggregation step that caps
    outlier values at the group's [p5, p95] band before summing (a
    training-data pipeline uses it to bound per-source token/price
    contributions). Everything is exact: values become integer cents,
    both bounds use the repo's probed quantile_disc semantics (1-based
    rank ceil(q*n) over sorted values), the clamp is integer min/max and
    the fold is an integer sum — order-invariant on both sides. Groups
    are bounded (5 priorities) and each fits one task (the sessionize
    partitioning contract), so this is ONE exchange."""
    ds = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n", pa.int64()), ("win_sum", pa.float64()),
                            ("lo_bound", pa.float64()),
                            ("hi_bound", pa.float64())])

    def winsorize(t: pa.Table) -> pa.Table:
        if "o_totalprice" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        srt = np.sort(cents)
        lo = srt[math.ceil(WIN_Q_LO * srt.size) - 1]
        hi = srt[math.ceil(WIN_Q_HI * srt.size) - 1]
        clamped = np.minimum(np.maximum(cents, lo), hi)
        return pa.table({
            "o_orderpriority": pa.array([df["o_orderpriority"].iloc[0]], pa.string()),
            "n": pa.array([int(cents.size)], pa.int64()),
            "win_sum": pa.array([int(clamped.sum()) / 100.0], pa.float64()),
            "lo_bound": pa.array([int(lo) / 100.0], pa.float64()),
            "hi_bound": pa.array([int(hi) / 100.0], pa.float64())})

    out = (ds.groupby("o_orderpriority")
           .map_groups(winsorize, batch_format="pyarrow").to_pandas())
    return out.sort_values("o_orderpriority").reset_index(drop=True)


WINSORIZED_ROLLUP_SQL = f"""
WITH c AS (SELECT o_orderpriority,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
q AS (SELECT o_orderpriority,
             quantile_disc(cents, {WIN_Q_LO}) AS lo,
             quantile_disc(cents, {WIN_Q_HI}) AS hi
      FROM c GROUP BY 1)
SELECT c.o_orderpriority, COUNT(*) AS n,
       SUM(LEAST(GREATEST(cents, lo), hi)) / 100.0 AS win_sum,
       MIN(lo) / 100.0 AS lo_bound, MAX(hi) / 100.0 AS hi_bound
FROM c JOIN q USING (o_orderpriority)
GROUP BY c.o_orderpriority ORDER BY c.o_orderpriority
"""


# --------------------------------------------------- deterministic split

SPLIT_KNUTH = 2654435761  # Knuth multiplicative constant
SPLIT_MOD = 1 << 32


def dataset_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split rollup — the hash-split every
    training-data pipeline applies before writing shards: bucket =
    (doc_id * Knuth) mod 2^32 mod 100, train < 80 <= val < 90 <= test.
    Pure integer arithmetic, so engine and oracle agree exactly and the
    assignment is stable across runs, block shapes and cluster sizes.
    The engine computes in uint64 (wrap mod 2^64) and the oracle mirrors
    that wrap explicitly in HUGEINT — BIGINT alone would overflow-error
    at doc_id >= 2^63 / Knuth ≈ 3.5e9 — so the two sides agree for every
    non-negative int64 doc_id.
    One tiny exchange: per-batch (split, lang) count partials fold
    through a Sum groupby."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        b = (t["doc_id"].to_numpy().astype(np.uint64) * SPLIT_KNUTH) \
            % SPLIT_MOD % 100
        split = np.where(b < 80, "train", np.where(b < 90, "val", "test"))
        df = pd.DataFrame({"split": split, "lang": t["lang"].to_pylist()})
        g = df.groupby(["split", "lang"], as_index=False).size()
        return pa.table({"split": pa.array(g["split"], pa.string()),
                         "lang": pa.array(g["lang"], pa.string()),
                         "n_docs": pa.array(g["size"].to_numpy(), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["split", "lang"]).aggregate(Sum("n_docs", alias_name="n_docs"))
           .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["split", "lang"]).reset_index(drop=True)


DATASET_SPLIT_SQL = f"""
WITH s AS (
  SELECT lang,
         CASE WHEN CAST(doc_id AS HUGEINT) * {SPLIT_KNUTH}
                   % 18446744073709551616 % {SPLIT_MOD} % 100 < 80 THEN 'train'
              WHEN CAST(doc_id AS HUGEINT) * {SPLIT_KNUTH}
                   % 18446744073709551616 % {SPLIT_MOD} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY split, lang ORDER BY split, lang
"""


# ------------------------------------ weighted Bernoulli sample (exact)

WSAMPLE_K = 200          # expected sample size at inclusion prob k*w/W
_WS_GRAIN = 65536        # u16 hash granularity (prob resolution 1/65536)


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pd.DataFrame:
    """Deterministic weighted Bernoulli sampling: include each order
    with probability ~ k * w / W (w = totalprice in integer cents,
    W = corpus total), decided by a pure integer row hash — the
    importance-sampling primitive for value-weighted corpus subsets.

    ALL arithmetic is integer so engine and oracle agree bit-for-bit:
    u16 = rowhash >> 16 (16-bit uniform), include iff
    u16 < (k * w * 65536) // W. Bounds: w < 2^38 cents keeps
    k * w * 65536 inside int64 (asserted); rows with k*w >= W are
    always included (threshold saturates past 65535).

    Scale shape: pass 1 folds (Σw) per batch into one scalar — the only
    coordination; pass 2 is an embarrassingly parallel map-side filter.
    Resumable and partition-stable: the keep decision depends only on
    the row key and the global W."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def w_partial(t: pa.Table) -> pa.Table:
        w = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(w.sum())], pa.int64())})

    tot = (ds.map_batches(w_partial, batch_format="pyarrow")
           .groupby(None).aggregate(Sum("s", alias_name="s")).to_pandas())
    W = int(tot["s"].iloc[0])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy().astype(np.int64)
        w = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        assert w.size == 0 or int(w.max()) < (1 << 38), \
            "weight bound for exact int64 threshold arithmetic"
        u16 = (((ids % _SAMPLE_PRIME) * _SAMPLE_MULT + 12345)
               % _SAMPLE_MOD) // _WS_GRAIN
        thr = (k * w * _WS_GRAIN) // W
        return t.filter(pa.array(u16 < thr))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


WEIGHTED_SAMPLE_SQL = f"""
WITH tot AS (
  SELECT SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS w
  FROM orders
)
SELECT o_orderkey, o_totalprice
FROM orders, tot
WHERE ((o_orderkey % {_SAMPLE_PRIME}) * {_SAMPLE_MULT} + 12345)
      % {_SAMPLE_MOD} // {_WS_GRAIN}
    < ({WSAMPLE_K} * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
       * {_WS_GRAIN}) // CAST(tot.w AS BIGINT)
ORDER BY o_orderkey
"""


# --------------------------------------- uniform bottom-k hash sample

BOTTOMK_K = 256


def bottomk_sample(sf_dir: str, k: int = BOTTOMK_K) -> pd.DataFrame:
    """Uniform k-row sample as BOTTOM-K BY HASH — the mergeable
    distributed uniform-sampling primitive (KMV family): the k rows with
    the smallest integer row hash, ties broken by key. Unlike
    rate-based sampling the size is exactly k, and partial bottom-ks
    merge associatively (union then re-take k), so no pass needs global
    coordination.

    Scale shape: each batch reduces to its local bottom-k
    (np.argpartition, O(rows)); the driver merges <= k x blocks
    candidate rows. At a real corpus the merge is a tree fold —
    identical to the HLL register merge shape."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy().astype(np.int64)
        h = ((ids % _SAMPLE_PRIME) * _SAMPLE_MULT + 12345) % _SAMPLE_MOD
        if ids.size > k:
            idx = np.lexsort((ids, h))[:k]
            t, h = t.take(pa.array(idx)), h[idx]
        return t.append_column("h", pa.array(h))

    cand = ds.map_batches(local_bottomk, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(["h", "o_orderkey"]).head(k)
    return (top[["o_orderkey", "o_totalprice"]]
            .sort_values("o_orderkey").reset_index(drop=True))


BOTTOMK_SQL = f"""
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
         ((o_orderkey % {_SAMPLE_PRIME}) * {_SAMPLE_MULT} + 12345)
         % {_SAMPLE_MOD} AS h
  FROM orders ORDER BY h, o_orderkey LIMIT {BOTTOMK_K}
) ORDER BY o_orderkey
"""


# ------------------------------------------------------ DSIR resampling
# Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by the log-likelihood
# ratio of a hashed n-gram bag model fit on a target corpus vs the raw
# corpus, then Gumbel-top-k resample by that weight. The engine analogue
# of "pick web data that looks like the target distribution".

DSIR_BUCKETS = 8192            # hashed feature space (paper uses 10^4)
DSIR_TARGET_LANG = "en"        # stand-in target corpus: english docs
DSIR_KEEP_FRAC = 0.25
_DSIR_TOKEN = None  # compiled once per worker process (T3 idiom)


def _dsir_bucket_ids(text: str) -> np.ndarray:
    """Hashed unigram+bigram bucket ids for one document. crc32 is a
    fixed public function, so features are deterministic across workers
    and processes (no PYTHONHASHSEED exposure)."""
    import re as _re
    import zlib

    global _DSIR_TOKEN
    if _DSIR_TOKEN is None:
        _DSIR_TOKEN = _re.compile(r"[a-z0-9']+")
    toks = _DSIR_TOKEN.findall(text.lower())
    feats = [zlib.crc32(t.encode()) for t in toks]
    feats += [zlib.crc32((a + " " + b).encode())
              for a, b in zip(toks, toks[1:])]
    if not feats:
        return np.empty(0, dtype=np.int64)
    return np.asarray(feats, dtype=np.int64) % DSIR_BUCKETS


def _dsir_log_ratio(sf_dir: str) -> np.ndarray:
    """ONE distributed pass fits BOTH bag models: each batch emits its
    nonzero (bucket, n_raw, n_tgt) partial counts, a tiny groupby folds
    them (the _hist_pass exchange shape — the driver only ever sees
    <= DSIR_BUCKETS rows, never a token). Laplace +1 smoothing."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        langs = t["lang"].to_pylist()
        for text, lang in zip(t["text"].to_pylist(), langs):
            ids = _dsir_bucket_ids(text)
            if not ids.size:
                continue
            binc = np.bincount(ids, minlength=DSIR_BUCKETS)
            raw += binc
            if lang == DSIR_TARGET_LANG:
                tgt += binc
        nz = np.nonzero(raw)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n_raw": pa.array(raw[nz], pa.int64()),
                         "n_tgt": pa.array(tgt[nz], pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_raw", alias_name="n_raw"),
                       Sum("n_tgt", alias_name="n_tgt")).take_all())
    raw = np.ones(DSIR_BUCKETS, dtype=np.float64)  # +1 smoothing
    tgt = np.ones(DSIR_BUCKETS, dtype=np.float64)
    for r in rows:
        raw[r["bucket"]] += r["n_raw"]
        tgt[r["bucket"]] += r["n_tgt"]
    return np.log(tgt / tgt.sum()) - np.log(raw / raw.sum())


def dsir_weights(sf_dir: str) -> pd.DataFrame:
    """Per-document DSIR importance log-weight (rows-only query: the
    hashed-feature bag model is not SQL-expressible; verified bit-exact
    against a sequential reference plus a target-upweighting property in
    tests). The log-ratio table is DSIR_BUCKETS floats — broadcast once
    via ray.put, read per batch, never re-shipped per row."""
    logr_ref = ray.put(_dsir_log_ratio(sf_dir))
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        logr = ray.get(logr_ref)
        w = np.empty(t.num_rows, dtype=np.float64)
        nf = np.empty(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t["text"].to_pylist()):
            ids = _dsir_bucket_ids(text)
            nf[i] = ids.size
            w[i] = float(logr[ids].sum()) if ids.size else 0.0
        return pa.table({"doc_id": t["doc_id"],
                         "logw": pa.array(w, pa.float64()),
                         "n_feats": pa.array(nf, pa.int64())})

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def dsir_resample(sf_dir: str) -> pd.DataFrame:
    """Gumbel-top-k resample by DSIR weight: key = logw + Gumbel noise
    seeded from doc_id (crc32 — deterministic, no RNG state), keep the
    top DSIR_KEEP_FRAC of the corpus. The cut uses the exact-k-th-
    smallest histogram narrowing (_kth_smallest) on the key column —
    the same no-global-sort scale path exact_quantiles uses — then one
    stateless filter pass; the driver never holds the corpus keys."""
    import zlib

    logr_ref = ray.put(_dsir_log_ratio(sf_dir))
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def key_batch(t: pa.Table) -> pa.Table:
        logr = ray.get(logr_ref)
        ids64 = t["doc_id"].to_numpy().astype(np.int64)
        u = np.array([(zlib.crc32(b"dsir:%d" % d) + 1.0) / 4294967298.0
                      for d in ids64])
        g = -np.log(-np.log(u))
        w = np.empty(t.num_rows, dtype=np.float64)
        for i, text in enumerate(t["text"].to_pylist()):
            fids = _dsir_bucket_ids(text)
            w[i] = float(logr[fids].sum()) if fids.size else 0.0
        return pa.table({"doc_id": t["doc_id"],
                         "logw": pa.array(w, pa.float64()),
                         "v": pa.array(w + g, pa.float64())})

    # materialize the SCORED columns once (3 numeric cols, ~24 B/row —
    # tiny next to the text it came from): the count, the min/max pass,
    # the histogram rounds and the final filter would each re-run the
    # tokenize+score kernel on the lazy pipeline otherwise
    keyed = ds.map_batches(key_batch, batch_format="pyarrow").materialize()
    n = keyed.count()
    k = max(1, int(math.ceil(n * DSIR_KEEP_FRAC)))
    # threshold = (n-k+1)-th smallest key; Gumbel keys are continuous so
    # ties at the cut are measure-zero — the count is asserted in tests
    stats = keyed.map_batches(
        lambda t: pa.table({"lo": [float(np.min(t["v"].to_numpy()))],
                            "hi": [float(np.max(t["v"].to_numpy()))]}),
        batch_format="pyarrow").to_pandas()
    thr = _kth_smallest(keyed.select_columns(["v"]), n - k + 1,
                        float(stats["lo"].min()), float(stats["hi"].max()))
    df = (keyed.map_batches(
        lambda t: t.filter(pc.greater_equal(t["v"], pa.scalar(thr))),
        batch_format="pyarrow").to_pandas())
    return (df.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "logw"]])
