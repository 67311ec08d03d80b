"""User-extension surface (§2.11): a brand-new board kind = one strategy
object + seed rows + page-store rows. The engine crawls it end to end with
no engine changes — built here against a HAND-MADE mini corpus (not the
synthetic generator)."""

import json
import shutil
from datetime import datetime
from pathlib import Path

import pyarrow as pa

from ssufid_ray import storage
from ssufid_ray.schema import PAGE_STORE_SCHEMA, SEED_SCHEMA
from ssufid_ray.stages.boards import (
    BoardSpec,
    ListParse,
    make_post,
    register_strategy,
)
from ssufid_ray.functions.dates import parse_board_date
from ssufid_ray.urlnorm import canonicalize


def _make_jsonl_strategy():
    """Defined inside a function so cloudpickle ships the class BY VALUE to
    workers (a user library would instead be importable on all nodes)."""

    class JsonlStrategy:
        """Custom kind: one request returning JSON-LINES posts."""

        kind = "jsonl"
        protocol = "single"
        upfront_pages = None

        def list_url(self, spec, page_no):
            return canonicalize(f"{spec.base_url.rstrip('/')}/feed.jsonl")

        def parse_list(self, spec, body, page_url):
            posts = []
            for line in body.decode("utf-8").splitlines():
                item = json.loads(line)
                spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
                         for i, t in enumerate(item["paragraphs"])]
                posts.append(make_post(
                    spec, str(item["id"]), item["url"], title=item["title"],
                    created_at=parse_board_date(item["date"], spec.date_format),
                    spans=spans, content="\n".join(item["paragraphs"])))
            return ListParse(rows=[], has_more=False, embedded=posts)

    return JsonlStrategy()


def _mini_corpus(root: Path) -> str:
    host = "custom.example.org"
    seeds = [{
        "board_id": "myboard", "host": host,
        "base_url": f"https://{host}/api/myboard", "board_kind": "jsonl",
        "date_format": "ymd_dash", "id_param": "", "page_size": 10,
        "posts_limit": 10, "politeness_ms": 0,
        "priority_date": datetime(2026, 1, 1),
    }]
    storage.write_table(pa.Table.from_pylist(seeds, schema=SEED_SCHEMA),
                        str(root / "seeds.parquet"))
    feed = "\n".join(json.dumps({
        "id": i, "url": f"https://{host}/p/{i}", "title": f"post {i}",
        "date": "2026-03-02", "paragraphs": [f"para {i}a", f"para {i}b"],
    }) for i in range(3))
    pages = [
        {"url": f"https://{host}/robots.txt", "host": host, "status": 200,
         "content_type": "text/plain", "body": b"User-agent: *\n",
         "fetch_ms": 1, "flaky": False},
        {"url": canonicalize(f"https://{host}/api/myboard/feed.jsonl"),
         "host": host, "status": 200, "content_type": "application/jsonl",
         "body": feed.encode(), "fetch_ms": 1, "flaky": False},
    ]
    storage.write_table(pa.Table.from_pylist(pages, schema=PAGE_STORE_SCHEMA),
                        str(root / "pages" / f"{host}.parquet"))
    return str(root)


def test_custom_board_kind_end_to_end(ray_session, tmp_path):
    from ssufid_ray.pipelines.crawl import documents_dataset, run_crawl

    strategy = _make_jsonl_strategy()
    register_strategy(strategy)  # driver side (HostScout serial path)
    corpus = _mini_corpus(tmp_path / "corpus")
    out = str(tmp_path / "out")
    run_crawl(corpus, out, extra_strategies=[strategy])
    docs = sorted(documents_dataset(out).take_all(), key=lambda r: r["doc_id"])
    assert [d["doc_id"] for d in docs] == ["myboard/0", "myboard/1", "myboard/2"]
    assert [s["text"] for s in docs[1]["spans"]] == ["para 1a", "para 1b"]
    assert docs[0]["created_at"] == datetime(2026, 3, 1, 15, 0)  # KST -> UTC
