"""Crawl-replay verification against the generator's oracle (BASELINE.md):
per-host fetch ordering, URL-seen membership, span-sequence equality,
full-post field equality. Returns a structured report; tests assert on it.

Driver-side pandas here is test-scale only (the oracle fits); the
underlying engine outputs stay parquet datasets.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import pandas as pd
import pyarrow.dataset as pads

from ssufid_ray import storage


def _fetched_order(df: pd.DataFrame) -> dict[str, list[str]]:
    d = df[df.fetch_seq >= 0].sort_values(["host", "fetch_seq"])
    return {h: list(g.url) for h, g in d.groupby("host")}


def _outcome_sets(df: pd.DataFrame, outcome: str):
    """MULTISET of (host, url): the generator records one dup_skipped /
    robots_blocked row per OCCURRENCE (a pinned post repeated on later
    list pages yields one per page), so per-occurrence accounting is part
    of the oracle contract — a set would mask double/under-counting."""
    from collections import Counter

    d = df[df.outcome == outcome]
    return Counter(zip(d.host, d.url))


def load_engine_records(out_dir: str) -> pd.DataFrame:
    cols = ["url", "host", "fetch_seq", "doc_id", "outcome"]
    scout = pads.dataset(str(Path(out_dir) / "scout")).to_table(
        columns=cols + ["rec_type"]).to_pandas()
    scout = scout[scout.rec_type == "record"][cols]
    posts = pads.dataset(str(Path(out_dir) / "posts"), partitioning="hive").to_table(
        columns=cols).to_pandas()
    posts = posts[posts.outcome != "embedded"]
    return pd.concat([scout, posts], ignore_index=True)


def load_engine_seen(out_dir: str) -> set[str]:
    seen: set[str] = set()
    for p in sorted((Path(out_dir) / "seen").glob("seen_shard_*.pkl")):
        with open(p, "rb") as f:
            seen |= set(pickle.load(f)["exact"])
    return seen


def _span_key(spans: list[dict]) -> tuple:
    return tuple(
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in sorted(spans, key=lambda s: s["offset"])
    )


def compare_crawl(corpus_dir: str, out_dir: str, *, check_posts: bool = True) -> dict:
    corpus = Path(corpus_dir)
    oracle = storage.read_table(str(corpus / "oracle.parquet")).to_pandas()
    # the calendar host is a separate pipeline; exclude it from crawl checks
    cal_hosts = {"calendar.ssu.ac.kr"}
    oracle = oracle[~oracle.host.isin(cal_hosts)]
    engine = load_engine_records(out_dir)

    report: dict = {"ok": True, "problems": []}

    def problem(msg: str):
        report["ok"] = False
        report["problems"].append(msg)

    # 1. per-host issue ordering over actually-issued fetches
    o_order, e_order = _fetched_order(oracle), _fetched_order(engine)
    for host in sorted(set(o_order) | set(e_order)):
        a, b = o_order.get(host, []), e_order.get(host, [])
        if a != b:
            i = next((k for k, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b)))
            problem(
                f"order mismatch on {host} at seq {i}: oracle={a[i] if i < len(a) else None!r} "
                f"engine={b[i] if i < len(b) else None!r} (lens {len(a)} vs {len(b)})"
            )
    report["hosts_checked"] = len(o_order)

    # 2. outcome sets
    for outcome in ("dup_skipped", "robots_blocked", "error_retry"):
        o_s, e_s = _outcome_sets(oracle, outcome), _outcome_sets(engine, outcome)
        if o_s != e_s:
            problem(
                f"{outcome} multiset mismatch: missing={sorted((o_s - e_s))[:3]} "
                f"extra={sorted((e_s - o_s))[:3]} (o={sum(o_s.values())} "
                f"e={sum(e_s.values())})"
            )

    # 3. URL-seen membership
    truth_seen = set(storage.read_table(str(corpus / "seen_truth.parquet"))["url"].to_pylist())
    engine_seen = load_engine_seen(out_dir)
    if truth_seen != engine_seen:
        problem(
            f"seen-set mismatch: missing={sorted(truth_seen - engine_seen)[:3]} "
            f"extra={sorted(engine_seen - truth_seen)[:3]} "
            f"(truth={len(truth_seen)} engine={len(engine_seen)})"
        )
    report["seen_size"] = len(engine_seen)

    # 4. span-sequence equality per doc
    truth_docs = storage.read_table(str(corpus / "truth_documents.parquet")).to_pylist()
    posts_tbl = pads.dataset(str(Path(out_dir) / "posts"), partitioning="hive").to_table()
    posts = posts_tbl.to_pylist()
    engine_docs = {r["doc_id"]: r for r in posts if r["outcome"] in ("fetched", "embedded")}
    truth_by_id = {r["doc_id"]: r for r in truth_docs}
    missing = sorted(set(truth_by_id) - set(engine_docs))
    extra = sorted(set(engine_docs) - set(truth_by_id))
    if missing:
        problem(f"missing docs: {len(missing)} e.g. {missing[:3]}")
    if extra:
        problem(f"extra docs: {len(extra)} e.g. {extra[:3]}")
    span_bad = 0
    first_span_diff = None
    for doc_id, t in truth_by_id.items():
        e = engine_docs.get(doc_id)
        if e is None:
            continue
        if _span_key(t["spans"]) != _span_key(e["spans"]):
            span_bad += 1
            if first_span_diff is None:
                first_span_diff = (doc_id, t["spans"], e["spans"])
    if span_bad:
        d, ts, es = first_span_diff
        problem(f"span mismatch in {span_bad} docs; first={d}: truth={ts[:4]} engine={es[:4]}")
    report["docs_checked"] = len(truth_by_id)
    report["span_pass_rate"] = 1.0 - span_bad / max(1, len(truth_by_id))

    # 5. full post field equality
    if check_posts:
        truth_posts = {r["doc_id"]: r for r in
                       storage.read_table(str(corpus / "truth_posts.parquet")).to_pylist()}
        fields = ["post_id", "url", "author", "title", "description", "category",
                  "created_at", "updated_at", "thumbnail", "content", "attachments",
                  "metadata"]
        field_bad: dict[str, int] = {}
        first_field_diff = None
        for doc_id, t in truth_posts.items():
            e = engine_docs.get(doc_id)
            if e is None:
                continue
            for f in fields:
                tv, ev = t[f], e[f]
                if isinstance(tv, list) and tv and isinstance(tv[0], tuple):
                    tv = [list(x) for x in tv]  # map entries -> list form
                if isinstance(ev, list) and ev and isinstance(ev[0], tuple):
                    ev = [list(x) for x in ev]
                if tv != ev:
                    field_bad[f] = field_bad.get(f, 0) + 1
                    if first_field_diff is None:
                        first_field_diff = (doc_id, f, tv, ev)
        if field_bad:
            problem(f"post field mismatches {field_bad}; first={first_field_diff}")
    return report
