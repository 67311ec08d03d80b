"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship span-document pipeline over sf0.001.
`queries()` registers every implemented operator family from SURVEY.md §2
plus the training-data operators (dedup / similarity / text analysis /
multimodal) over the driver's generic tables; `oracle_sql()` carries the
DuckDB equivalent for each SQL-expressible one (same column names, same
rounding rules; crawl_events' oracle reads the run's own JSONL event
partitions with read_json_auto). Non-SQL-expressible entries (crawl
replay, simhash, multimodal, the approximate LSH path, the
HLL/DDSketch estimates — global and grouped, k-means, PCA, the
fixed-point PageRank) are registered without an oracle
-> rows-only check, by design, each with a property/golden/recall/
bit-exact-reference test in-repo (COVERAGE.md maps each one).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry() -> Any:
    from ssufid_ray.pipelines.flagship import span_document_pipeline

    return span_document_pipeline("/root/testdata/sf0.001")


def _crawl_replay(sf_dir: str) -> Any:
    """Flagship crawl replay on the deterministic synthetic corpus (scaled
    to the sf tier), returning a per-document span summary. Rows-only check:
    the real verification (ordering / seen-set / span equality vs oracle)
    runs in pytest (tests/test_crawl_e2e.py)."""
    import shutil

    import pyarrow as pa
    import ray.data

    from ssufid_ray.pipelines.crawl import documents_dataset, run_crawl
    from ssufid_ray.synth import ensure_corpus

    from ssufid_ray.synth import CORPUS_VERSION

    scale = _crawl_scale(sf_dir)
    corpus, _ = ensure_corpus(scale=scale)
    # out dir keyed by corpus version: a stale run from a previous corpus
    # generation must never be resumed
    out = f"/tmp/ssufid_entry/crawl_{scale}_v{CORPUS_VERSION}"
    shutil.rmtree(out, ignore_errors=True)
    run_crawl(corpus, out)

    def summarize(t: pa.Table) -> pa.Table:
        # vectorized span rollup: list lengths + a segmented sum of the
        # flattened kind mask (no per-row Python loop)
        import numpy as np
        import pyarrow.compute as pc

        spans = t["spans"].combine_chunks()
        lens = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kind = pc.struct_field(spans.flatten(), "kind")
        is_text = pc.equal(kind, "text").to_numpy(
            zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(is_text)])
        ends = np.cumsum(lens)
        n_text = csum[ends] - csum[ends - lens]
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.string()),
            "plugin_id": t["plugin_id"].cast(pa.string()),
            "n_spans": pa.array(lens, pa.int64()),
            "n_text": pa.array(n_text, pa.int64()),
            "n_media": pa.array(lens - n_text, pa.int64())})

    df = (documents_dataset(out, columns=["doc_id", "plugin_id", "spans", "outcome"])
          .map_batches(summarize, batch_format="pyarrow").to_pandas())
    return df.sort_values("doc_id").reset_index(drop=True)


_EVENT_COLS = ["plugin", "type", "attempt", "retry_count", "posts_limit",
               "posts"]


def _crawl_scale(sf_dir: str) -> float:
    return 0.12 if "0.001" in sf_dir else (0.25 if "0.01" in sf_dir else 1.0)


_EVENTS_LINK = "/tmp/ssufid_entry/crawl_events_current"


def _point_events_link(out: str) -> None:
    """Atomically repoint the stable symlink the crawl_events oracle SQL
    reads through. oracle_sql() returns static strings built once, but the
    events table's location depends on the sf tier the query runs at — the
    link makes the static SQL follow the query's tier in either evaluation
    order (SQL-first or query-first)."""
    import os

    os.makedirs(os.path.dirname(_EVENTS_LINK), exist_ok=True)
    tmp = _EVENTS_LINK + ".tmp"
    try:
        os.unlink(tmp)
    except FileNotFoundError:
        pass
    os.symlink(out, tmp)
    os.replace(tmp, _EVENTS_LINK)


def _ensure_crawl_out(sf_dir: str) -> str:
    """Corpus + crawl output for the event-report queries. Skip-fast: a
    completed manifest (crawl_replay usually runs first) costs one JSON
    read — no corpus build, no Ray work."""
    import json
    from pathlib import Path

    from ssufid_ray.synth import CORPUS_VERSION

    scale = _crawl_scale(sf_dir)
    out = f"/tmp/ssufid_entry/crawl_{scale}_v{CORPUS_VERSION}"
    mpath = Path(out) / "manifest.json"
    done = False
    if mpath.exists():
        try:
            done = bool(json.loads(mpath.read_text()).get("metrics_done"))
        except ValueError:
            done = False
    if not done:
        from ssufid_ray.pipelines.crawl import run_crawl
        from ssufid_ray.synth import ensure_corpus

        corpus, _ = ensure_corpus(scale=scale)
        run_crawl(corpus, out, resume=True)
    _point_events_link(out)
    return out


def _crawl_events(sf_dir: str) -> Any:
    """Structured crawl event report (K5, content_report analogue): one row
    per board with type/attempt/posts — includes the board-level-retry
    fixture's crawl_failed row (attempt == 3). Oracled: the per-host JSONL
    partitions are a real table, so the DuckDB side reads the same files
    with read_json_auto (the reference's analyze-report jq contract).
    Elapsed times are nondeterministic and excluded from both sides."""
    from ssufid_ray.pipelines.crawl import events_dataset

    out = _ensure_crawl_out(sf_dir)
    df = events_dataset(out).to_pandas()[_EVENT_COLS]
    return df.sort_values("plugin").reset_index(drop=True)


def _crawl_events_sql() -> str:
    """DuckDB oracle for _crawl_events over the SAME JSONL partitions,
    read through the _EVENTS_LINK symlink: the query repoints the link to
    its tier's output when it runs, so in query-first evaluation order
    (the local gate's order) the static SQL compares against the files
    the query just produced at ANY tier. The ensure below exists for
    SQL-first order at the driver's comparison tier (sf0.01): it
    guarantees the link and files exist before the SQL can run. That is
    a deliberate side effect of building the registry — without it an
    SQL-first harness reads a dangling link — and it is skip-fast (one
    JSON manifest read) once the sf0.01 output exists. Known limit:
    SQL-first evaluation at a tier OTHER than sf0.01 would read the
    sf0.01 files (wrong tier) until the query repoints the link; the
    driver contract compares at sf0.01 only, so this is out of scope."""
    _ensure_crawl_out("/root/testdata/sf0.01")
    return (f"SELECT {', '.join(_EVENT_COLS)} FROM "
            f"read_json_auto('{_EVENTS_LINK}/events/*.jsonl') "
            "ORDER BY plugin")


def queries() -> dict[str, Callable[[str], Any]]:
    from ssufid_ray.stages import (cleaning, clustering, decomp, dedup,
                                   graph, incremental, ranking, relational,
                                   retrieval, sampling, similarity, sketches,
                                   strings, temporal, text, tpch)
    from ssufid_ray.stages.multimodal import (media_frame_sample,
                                              media_resize, multimodal_meta)

    return {
        # relational operator inventory (SURVEY §2)
        "q1_pricing": relational.q1_pricing,
        "grouped_topk": relational.grouped_topk,
        "merge_upsert": relational.merge_upsert_generic,
        "event_counts": relational.event_counts,
        "board_rollup": relational.board_rollup,
        "ts_range_filter": relational.ts_range_filter,
        "semi_join": relational.semi_join,
        "anti_join": relational.anti_join,
        "sort_limit": relational.sort_limit,
        "window_agg": relational.window_agg,
        "join_rollup": relational.join_rollup,
        "asof_join": relational.asof_join,
        "distinct_values": relational.distinct_values,
        "json_extract_rollup": relational.json_extract_rollup,
        "nation_rollup": relational.nation_rollup,
        "sessionize": relational.sessionize,
        "range_join": relational.range_join,
        "sliding_window_agg": relational.sliding_window_agg,
        # event-time tumbling window with WATERMARK late-data drop
        # (distributed prefix scan: range-carry broadcast + in-range
        # running max; streaming semantics, batch-replayed)
        "watermark_window_agg": relational.watermark_window_agg,
        # ordered conversion funnel (MATCH_RECOGNIZE-lite sequential
        # pattern per key, greedy earliest chain with a max step gap)
        "funnel_stages": relational.funnel_stages,
        # fixed-width value histogram on exact integer cents
        "value_histogram": relational.value_histogram,
        # GROUPING SETS / CUBE surface: 4 grouping levels in one pass
        "grouping_sets_rollup": relational.grouping_sets_rollup,
        # LAG window surface: per-key gap to the previous event
        "user_event_gaps": relational.user_event_gaps,
        # interval sweep: sessions open at each session start (+1/-1
        # boundary prefix scan, day-range carries — no global sort)
        "peak_concurrency": temporal.peak_concurrency,
        # interval x interval overlap join, no equi key: grid-bucket
        # replication + start-sorted sweep + ownership dedupe
        "interval_overlap_join": temporal.interval_overlap_join,
        # time-series densification: dense (type × hour) grid, zero fill
        "time_grid_fill": temporal.time_grid_fill,
        # trailing 7-day COUNT(DISTINCT user) per day (bounded ×W pair
        # expansion instead of a non-equi time join)
        "rolling_distinct_users": temporal.rolling_distinct_users,
        "user_cooccurrence": temporal.user_cooccurrence,
        "event_trigrams": temporal.event_trigrams,
        "retention_cohorts": temporal.retention_cohorts,
        # per-group Pearson correlation from exact integer moment sums
        "group_corr": ranking.group_corr,
        "group_regression": ranking.group_regression,
        # bounded edit-distance pair join (byte-Levenshtein, vectorized
        # DP, length-band prefilter)
        "edit_distance_pairs": strings.edit_distance_pairs,
        # substring-containment dedup pairs (bounded exact baseline;
        # scale path = winnow-fingerprint candidates + this verify)
        "containment_pairs": strings.containment_pairs,
        # argmax-per-group: modal event_type per user, deterministic ties
        "group_mode": ranking.group_mode,
        # big-big equi join: both sides fact-sized -> co-partitioned
        # hash join (bucket both sides by key hash), combiner on the
        # lineitem side before the exchange
        "fact_fact_join": relational.fact_fact_join,
        "customer_churn": relational.customer_churn,
        "q5_region_revenue": relational.q5_region_revenue,
        "q17_small_quantity": relational.q17_small_quantity,
        # HAVING SUM > t, then join the qualifying keys back to the
        # fact (TPC-H Q18 shape); per-bucket top-k before the driver
        "q18_large_volume": relational.q18_large_volume,
        # EXISTS + NOT-EXISTS correlated pair as one conditional
        # distinct-count per order (TPC-H Q21 shape)
        "q21_sole_late_supplier": relational.q21_sole_late_supplier,
        # scalar-subquery threshold + anti join (TPC-H Q22 shape)
        "q22_dormant_balance": relational.q22_dormant_balance,
        # segment top-k unshipped revenue (TPC-H Q3 shape): buckets
        # partition the orderkey space, so per-bucket top-k is exact
        "q3_shipping_priority": tpch.q3_shipping_priority,
        # pure filtered scan-aggregate, zero exchanges (TPC-H Q6 shape)
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        # returned-item lost revenue per customer, top-k + k-key
        # filtered dimension decoration (TPC-H Q10 shape)
        "q10_returned_items": tpch.q10_returned_items,
        # promo revenue share, gated part attach (TPC-H Q14 shape)
        "q14_promo_revenue": tpch.q14_promo_revenue,
        # EXISTS as a max-shipdate fold per order (TPC-H Q4 shape)
        "q4_order_priority": tpch.q4_order_priority,
        # bilateral nation-pair trade by year: two gated dimension
        # attaches + the big-big orderkey exchange (TPC-H Q7 shape)
        "q7_volume_shipping": tpch.q7_volume_shipping,
        # profit rollup with in-batch price math, two gated attaches
        # (TPC-H Q9 shape; retailprice*qty stands in for supplycost)
        "q9_product_profit": tpch.q9_product_profit,
        # scalar-subquery max over a derived aggregate (TPC-H Q15 shape)
        "q15_top_supplier": tpch.q15_top_supplier,
        # per-group argmin with join-back decoration (TPC-H Q2 shape)
        "q2_min_acctbal_supplier": tpch.q2_min_acctbal_supplier,
        # nation market share by year: 3 gated attaches + one big-big
        # orderkey exchange + int/int share divide (TPC-H Q8 shape)
        "q8_market_share": tpch.q8_market_share,
        # late-line priority counts over the bare big-big join
        # (TPC-H Q12 shape)
        "q12_late_lines": tpch.q12_late_lines,
        # exact count-distinct via suppkey-hash bucketing (TPC-H Q16)
        "q16_supplier_counts": tpch.q16_supplier_counts,
        # disjunctive (brand,size,qty) predicate scan (TPC-H Q19 shape)
        "q19_disjunctive_revenue": tpch.q19_disjunctive_revenue,
        # excess-quantity suppliers: two-key groupby + threshold semi
        # join + filtered decorate (TPC-H Q20 shape)
        "q20_excess_suppliers": tpch.q20_excess_suppliers,
        # two-criteria skyline: per-block local frontier -> tiny
        # candidate union -> exact final scan (no shuffle)
        "pareto_frontier": relational.pareto_frontier,
        # ordered per-key string aggregation (session-path primitive)
        "event_paths": temporal.event_paths,
        # groupwise argmax full-row compaction (QUALIFY rn=1 shape)
        "last_event_per_user": temporal.last_event_per_user,
        # Heaps-law vocabulary growth over the bigram vocabulary
        "vocab_growth": text.vocab_growth,
        # semi join with a Bloom pushdown: broadcast bitmap prunes the
        # fact scan before the (thin) co-partitioned exact verify
        "bloom_semi_join": relational.bloom_semi_join,
        # LEFT OUTER join (TPC-H Q13 shape): zero-order customers kept,
        # per-bucket histogram partials
        "cust_order_histogram": relational.cust_order_histogram,
        # global total-order primitives: exact ROW_NUMBER/NTILE via bin
        # partitioning + prefix-sum offsets (no global sort bottleneck)
        "global_rank": ranking.global_rank,
        "pivot_counts": ranking.pivot_counts,
        # exact grouped count-distinct (two-stage pair shuffle) — the
        # exact complement of hll_distinct
        "group_distinct": ranking.group_distinct,
        # RANK() with gaps (tie-sharing searchsorted fold per group)
        "rank_with_ties": ranking.rank_with_ties,
        # wide->long unpivot, per-batch flat emit, zero exchange
        "unpivot_measures": ranking.unpivot_measures,
        # first-touch attribution: argmin compaction -> per-user final
        # -> tiny type rollup
        "first_touch_counts": ranking.first_touch_counts,
        # per-key ordered running total (int-cents exact)
        "cumulative_user_sum": ranking.cumulative_user_sum,
        # sampling / order statistics / curation
        "stratified_sample": sampling.stratified_sample,
        # integer-exact weighted Bernoulli sample (prob ~ k*w/W)
        "weighted_sample": sampling.weighted_sample,
        # uniform bottom-k-by-hash sample (mergeable KMV primitive)
        "bottomk_sample": sampling.bottomk_sample,
        "dataset_split": sampling.dataset_split,
        # exact k-per-group consistent sample (bounded candidate merge)
        "group_sample_k": sampling.group_sample_k,
        "exact_quantiles": sampling.exact_quantiles,
        "group_quantiles": sampling.group_quantiles,
        "decontaminate": sampling.decontaminate,
        "contamination_overlap_rate": sampling.contamination_overlap_rate,
        "corpus_mix": sampling.corpus_mix,
        # DSIR importance resampling (Xie et al. 2023): hashed n-gram
        # bag-model log-ratio weights + Gumbel-top-k selection
        # (rows-only: the hashed feature space is not SQL-expressible;
        # bit-exact sequential-reference + target-enrichment +
        # determinism tests in tests/test_sampling.py)
        "dsir_weights": sampling.dsir_weights,
        "dsir_resample": sampling.dsir_resample,
        # composed curation gate: corpus-quantile token band + repetition
        "quality_filter": sampling.quality_filter,
        # flagship end-to-end curation chain: quality gate -> exact dedup
        # among survivors -> benchmark decontamination (one pipeline; the
        # CTE-chain oracle pins the composition, not just the pieces)
        "curation_pipeline": sampling.curation_pipeline,
        # robust per-group outlier detection (k x MAD from the group
        # median, probed quantile_disc semantics both engines)
        "mad_outliers": sampling.mad_outliers,
        "winsorized_rollup": sampling.winsorized_rollup,
        # training-sequence packing (greedy next-fit in fixed doc-id
        # ranges, global seq ids by prefix sum)
        "sequence_pack": sampling.sequence_pack,
        # sparse retrieval: inverted-index postings + BM25 ranking
        "bm25_topk": retrieval.bm25_topk,
        "inverted_postings": retrieval.inverted_postings,
        # text analysis
        "span_docs": text.span_docs,
        "lang_quality": text.lang_quality,
        "doc_fingerprint": text.doc_fingerprint,
        "top_tokens": text.top_tokens,
        "bigram_stats": text.bigram_stats,
        # exact per-group top-k tokens (grouped heavy hitters)
        "group_top_tokens": text.group_top_tokens,
        "token_stats": text.token_stats,
        "repetition_scores": text.repetition_scores,
        # winnowing fingerprints (md5 gram hash -> window-MIN oracle)
        "winnow_fingerprints": text.winnow_fingerprints,
        # flat-map one-to-many: fixed-length overlapping training windows
        "chunk_windows": text.chunk_windows,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "minhash_dedup": dedup.minhash_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        # exact duplicated-substring coverage (fixed-L gram counts,
        # 128-bit int exchange; suffix-array-dedup analogue)
        "dup_gram_stats": dedup.dup_gram_stats,
        # the CUT step of fixed-L suffix-array-style substring dedup:
        # keep first occurrence corpus-wide, merge overlapping marks,
        # report per-doc removed/kept token counts (oracled)
        "dedup_substring_spans": dedup.dedup_substring_spans,
        # EXACT set-similarity self-join via AllPairs/PPJoin prefix
        # filtering (deterministic complement of minhash; the full-domain
        # oracle equality is the recall proof)
        "jaccard_join": dedup.jaccard_join,
        # incremental dedup of an incoming slice against a PERSISTED
        # bucket-partitioned fingerprint index (resumable artifact,
        # int-only anti-join exchanges)
        "incremental_dedup": incremental.incremental_dedup,
        # two chained daily runs: day A dedups + APPENDS its uniques'
        # fingerprints into the index (atomic per-bucket renames +
        # marker tag), day B dedups against corpus + A's uniques
        "incremental_append_day2": incremental.incremental_append_day2,
        # connected components over the near-dup pairs (iterative
        # min-label propagation; recursive-CTE closure oracle)
        "dup_clusters": graph.dup_clusters,
        "dedup_keep_best": graph.dedup_keep_best,
        "triangle_count": graph.triangle_count,
        # PageRank centrality over the near-dup graph (rows-only:
        # int64 fixed-point iteration, bit-exact vs a sequential
        # reference in tests; gated local path for small graphs)
        "pagerank_dup": graph.pagerank_dup,
        "simhash_clusters": dedup.simhash_clusters,  # rows-only
        # verified hamming<=3 pairs, multi-probe rotation (rows-only:
        # recall pinned vs brute force in tests)
        "simhash_hamming_pairs": dedup.simhash_hamming_pairs,
        "embedding_dup_pairs": dedup.embedding_dup_pairs,
        # the 100-TB near-dup scale path (rows-only: approximate by
        # design; precision-1.0 subset of embedding_dup_pairs, recall
        # asserted in tests)
        "embedding_dup_pairs_lsh": dedup.embedding_dup_pairs_lsh_q,
        "semdedup_pairs": dedup.semdedup_pairs,
        # similarity search
        "embedding_topk": similarity.brute_force_topk,
        "knn_join": similarity.knn_join,
        "embedding_dim_stats": similarity.embedding_dim_stats,
        "mutual_topk": similarity.mutual_topk,
        "ivf_topk": similarity.ivf_topk,  # exact config -> same oracle
        "ivf_append_topk": similarity.ivf_append_topk,  # full probe -> exact
        # product-quantized ANN: ADC shortlist over uint8 codes + exact
        # re-rank (rows-only: quantization argmins aren't SQL; recall
        # >=0.9 vs the brute-force oracle + determinism + crash-safe
        # rebuild pinned in tests/test_queries_oracle.py)
        "pq_topk": similarity.pq_topk,
        # corpus cleaning (paragraph-level dedup / scrub / shard / tf-idf)
        "paragraph_dedup": cleaning.paragraph_dedup,
        "normalized_dedup": cleaning.normalized_dedup,
        # PII redaction (re2 email/phone scrub, hash covers the text)
        "pii_scrub": cleaning.pii_scrub,
        "stopword_scrub": cleaning.stopword_scrub,
        "shuffle_shards": cleaning.shuffle_shards,
        "tfidf_topk": cleaning.tfidf_topk,
        # distributed k-means over embeddings (rows-only: pinned exactly
        # to a sequential fixed-point reference in tests)
        "kmeans_clusters": clustering.kmeans_clusters,
        # distributed PCA: fixed-point moment folds, bounded fan-in merge,
        # driver eigh, integer-dot projection (rows-only: bit-exact pin
        # vs a sequential reference in tests)
        "pca_project": decomp.pca_project,
        # one-pass mergeable relative-error quantile sketch (DDSketch)
        # (rows-only: error bound vs exact quantile asserted in tests)
        "ddsketch_quantiles": decomp.ddsketch_quantiles,
        # per-group mergeable quantile sketch (rows-only: bucket index is
        # ceil(log_g v) — libm-rounding at boundaries isn't SQL-
        # reproducible; error bound vs exact asserted in tests)
        "group_ddsketch_quantiles": decomp.group_ddsketch_quantiles,
        # multimodal: REAL in-container decode (numpy PPM, stdlib WAV,
        # SSUV frame container); rows-only — synthesis+decode isn't SQL
        "multimodal_meta": multimodal_meta,
        # byte-range frame sampling over the video container (rows-only)
        "media_frame_sample": media_frame_sample,
        # nearest-neighbor PPM resize actor pool (rows-only)
        "media_resize": media_resize,
        # sketches (rows-only: deterministic estimate, accuracy in tests)
        "hll_distinct": sketches.hll_distinct_users,
        # per-group HLL (keyed two-level register tree; rows-only,
        # accuracy-bounded vs exact in tests)
        "group_hll_distinct": sketches.group_hll_distinct,
        # frequent tokens via a mergeable SpaceSaving candidate sketch +
        # bounded exact verify pass (exact output -> SQL-oracled)
        "heavy_hitters": sketches.heavy_hitters,
        "countmin_tokens": sketches.countmin_tokens,  # rows-only: sketch estimate, error-bound test in-repo
        # the crawl engine itself (rows-only)
        "crawl_replay": _crawl_replay,
        # K5 structured event report incl. board-retry accounting
        # (oracled against the same JSONL via read_json_auto)
        "crawl_events": _crawl_events,
    }


def oracle_sql() -> dict[str, str]:
    from ssufid_ray.stages import (cleaning, dedup, graph, incremental,
                                   ranking, relational, retrieval, sampling,
                                   similarity, sketches, strings, temporal,
                                   text, tpch)

    return {
        "q1_pricing": relational.Q1_SQL,
        "grouped_topk": relational.GROUPED_TOPK_SQL,
        "merge_upsert": relational.MERGE_UPSERT_SQL,
        "event_counts": relational.EVENT_COUNTS_SQL,
        "board_rollup": relational.BOARD_ROLLUP_SQL,
        "ts_range_filter": relational.TS_RANGE_FILTER_SQL,
        "semi_join": relational.SEMI_JOIN_SQL,
        "anti_join": relational.ANTI_JOIN_SQL,
        "sort_limit": relational.SORT_LIMIT_SQL,
        "window_agg": relational.WINDOW_AGG_SQL,
        "join_rollup": relational.JOIN_ROLLUP_SQL,
        "asof_join": relational.ASOF_JOIN_SQL,
        "distinct_values": relational.DISTINCT_SQL,
        "json_extract_rollup": relational.JSON_EXTRACT_SQL,
        "nation_rollup": relational.NATION_ROLLUP_SQL,
        "sessionize": relational.SESSIONIZE_SQL,
        "range_join": relational.RANGE_JOIN_SQL,
        "sliding_window_agg": relational.SLIDING_WINDOW_SQL,
        "watermark_window_agg": relational.WATERMARK_WINDOW_SQL,
        "funnel_stages": relational.FUNNEL_STAGES_SQL,
        "value_histogram": relational.VALUE_HISTOGRAM_SQL,
        "grouping_sets_rollup": relational.GROUPING_SETS_SQL,
        "user_event_gaps": relational.USER_EVENT_GAPS_SQL,
        "peak_concurrency": temporal.PEAK_CONCURRENCY_SQL,
        "interval_overlap_join": temporal.INTERVAL_OVERLAP_SQL,
        "time_grid_fill": temporal.TIME_GRID_FILL_SQL,
        "rolling_distinct_users": temporal.ROLLING_DISTINCT_SQL,
        "user_cooccurrence": temporal.USER_COOCCURRENCE_SQL,
        "event_trigrams": temporal.EVENT_TRIGRAMS_SQL,
        "retention_cohorts": temporal.RETENTION_COHORTS_SQL,
        "group_corr": ranking.GROUP_CORR_SQL,
        "group_regression": ranking.GROUP_REGRESSION_SQL,
        "edit_distance_pairs": strings.EDIT_DISTANCE_SQL,
        "containment_pairs": strings.CONTAINMENT_SQL,
        "group_mode": ranking.GROUP_MODE_SQL,
        "fact_fact_join": relational.FACT_FACT_JOIN_SQL,
        "customer_churn": relational.CUSTOMER_CHURN_SQL,
        "q5_region_revenue": relational.Q5_SQL,
        "q17_small_quantity": relational.Q17_SQL,
        "q18_large_volume": relational.Q18_SQL,
        "q21_sole_late_supplier": relational.Q21_SQL,
        "q22_dormant_balance": relational.Q22_SQL,
        "q3_shipping_priority": tpch.Q3_SQL,
        "q6_forecast_revenue": tpch.Q6_SQL,
        "q10_returned_items": tpch.Q10_SQL,
        "q14_promo_revenue": tpch.Q14_SQL,
        "q4_order_priority": tpch.Q4_SQL,
        "q7_volume_shipping": tpch.Q7_SQL,
        "q9_product_profit": tpch.Q9_SQL,
        "q15_top_supplier": tpch.Q15_SQL,
        "q2_min_acctbal_supplier": tpch.Q2_SQL,
        "q8_market_share": tpch.Q8_SQL,
        "q12_late_lines": tpch.Q12_SQL,
        "q16_supplier_counts": tpch.Q16_SQL,
        "q19_disjunctive_revenue": tpch.Q19_SQL,
        "q20_excess_suppliers": tpch.Q20_SQL,
        "pareto_frontier": relational.PARETO_SQL,
        "event_paths": temporal.EVENT_PATHS_SQL,
        "last_event_per_user": temporal.LAST_EVENT_SQL,
        "vocab_growth": text.VOCAB_GROWTH_SQL,
        "bloom_semi_join": relational.BLOOM_SEMI_JOIN_SQL,
        "cust_order_histogram": relational.CUST_ORDER_HISTOGRAM_SQL,
        "global_rank": ranking.GLOBAL_RANK_SQL,
        "pivot_counts": ranking.PIVOT_COUNTS_SQL,
        "group_distinct": ranking.GROUP_DISTINCT_SQL,
        "rank_with_ties": ranking.RANK_WITH_TIES_SQL,
        "unpivot_measures": ranking.UNPIVOT_SQL,
        "first_touch_counts": ranking.FIRST_TOUCH_SQL,
        "cumulative_user_sum": ranking.CUMULATIVE_USER_SUM_SQL,
        "stratified_sample": sampling.STRATIFIED_SAMPLE_SQL,
        "weighted_sample": sampling.WEIGHTED_SAMPLE_SQL,
        "bottomk_sample": sampling.BOTTOMK_SQL,
        "dataset_split": sampling.DATASET_SPLIT_SQL,
        "group_sample_k": sampling.GROUP_SAMPLE_K_SQL,
        "exact_quantiles": sampling.EXACT_QUANTILES_SQL,
        "group_quantiles": sampling.GROUP_QUANTILES_SQL,
        "decontaminate": sampling.DECONTAMINATE_SQL,
        "contamination_overlap_rate": sampling.CONTAMINATION_RATE_SQL,
        "corpus_mix": sampling.CORPUS_MIX_SQL,
        "quality_filter": sampling.QUALITY_FILTER_SQL,
        "curation_pipeline": sampling.CURATION_PIPELINE_SQL,
        "mad_outliers": sampling.MAD_OUTLIERS_SQL,
        "winsorized_rollup": sampling.WINSORIZED_ROLLUP_SQL,
        "sequence_pack": sampling.SEQUENCE_PACK_SQL,
        "bm25_topk": retrieval.BM25_TOPK_SQL,
        "inverted_postings": retrieval.INVERTED_POSTINGS_SQL,
        "repetition_scores": text.REPETITION_SCORES_SQL,
        "span_docs": text.SPAN_DOCS_SQL,
        "lang_quality": text.LANG_QUALITY_SQL,
        "doc_fingerprint": text.DOC_FINGERPRINT_SQL,
        "top_tokens": text.TOP_TOKENS_SQL,
        "bigram_stats": text.BIGRAM_STATS_SQL,
        "group_top_tokens": text.GROUP_TOP_TOKENS_SQL,
        "token_stats": text.TOKEN_STATS_SQL,
        "chunk_windows": text.CHUNK_WINDOWS_SQL,
        "winnow_fingerprints": text.WINNOW_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "minhash_dedup": dedup.MINHASH_DEDUP_SQL,
        "ngram_jaccard_pairs": dedup.NGRAM_JACCARD_SQL,
        "dup_gram_stats": dedup.DUP_GRAM_STATS_SQL,
        "dedup_substring_spans": dedup.DEDUP_SUBSTRING_SPANS_SQL,
        "jaccard_join": dedup.JACCARD_JOIN_SQL,
        "incremental_dedup": incremental.INCREMENTAL_DEDUP_SQL,
        "incremental_append_day2": incremental.INCREMENTAL_APPEND_DAY2_SQL,
        "dup_clusters": graph.DUP_CLUSTERS_SQL,
        "dedup_keep_best": graph.DEDUP_KEEP_BEST_SQL,
        "triangle_count": graph.TRIANGLE_COUNT_SQL,
        "embedding_dup_pairs": dedup.EMBEDDING_DUP_SQL,
        "embedding_topk": similarity.BRUTE_FORCE_TOPK_SQL,
        "knn_join": similarity.KNN_JOIN_SQL,
        "embedding_dim_stats": similarity.EMBEDDING_DIM_STATS_SQL,
        "mutual_topk": similarity.MUTUAL_TOPK_SQL,
        "ivf_topk": similarity.BRUTE_FORCE_TOPK_SQL,
        "ivf_append_topk": similarity.BRUTE_FORCE_TOPK_SQL,
        "paragraph_dedup": cleaning.PARAGRAPH_DEDUP_SQL,
        "normalized_dedup": cleaning.NORMALIZED_DEDUP_SQL,
        "pii_scrub": cleaning.PII_SCRUB_SQL,
        "stopword_scrub": cleaning.STOPWORD_SCRUB_SQL,
        "shuffle_shards": cleaning.SHUFFLE_SHARDS_SQL,
        "tfidf_topk": cleaning.TFIDF_TOPK_SQL,
        "heavy_hitters": sketches.HEAVY_HITTERS_SQL,
        "crawl_events": _crawl_events_sql(),
    }
