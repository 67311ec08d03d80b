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


def test_custom_paged_protocol(ray_session, tmp_path):
    """A custom kind reusing the 'paged' protocol: page loop + has_more stop
    + posts_limit + seen dedup all come from the engine."""
    from ssufid_ray.pipelines.crawl import documents_dataset, run_crawl
    from ssufid_ray.stages.boards import RowMeta

    def make_strategy():
        class PagedJsonStrategy:
            kind = "pagedjson"
            protocol = "paged"
            upfront_pages = None

            def list_url(self, spec, page_no):
                return canonicalize(
                    f"{spec.base_url.rstrip('/')}/list?page={page_no}")

            def parse_list(self, spec, body, page_url):
                data = json.loads(body.decode())
                rows = [RowMeta(post_id=str(i["id"]),
                                url=canonicalize(i["detail"]), title=i["t"])
                        for i in data["rows"]]
                return ListParse(rows=rows, has_more=data["more"])

            def parse_detail(self, spec, body, url, meta):
                item = json.loads(body.decode())
                spans = [{"kind": "text", "text": item["body"],
                          "media_ref": "", "offset": 0}]
                return make_post(spec, meta.post_id, url, title=meta.title,
                                 created_at=parse_board_date(item["date"],
                                                             spec.date_format),
                                 spans=spans, content=item["body"])

        return PagedJsonStrategy()

    host = "paged.example.org"
    root = tmp_path / "corpus2"
    seeds = [{"board_id": "pb", "host": host,
              "base_url": f"https://{host}/api/pb", "board_kind": "pagedjson",
              "date_format": "ymd_dash", "id_param": "", "page_size": 2,
              "posts_limit": 3, "politeness_ms": 0,
              "priority_date": datetime(2026, 1, 1)}]
    storage.write_table(pa.Table.from_pylist(seeds, schema=SEED_SCHEMA),
                        str(root / "seeds.parquet"))
    pages = [{"url": f"https://{host}/robots.txt", "host": host, "status": 200,
              "content_type": "text/plain", "body": b"User-agent: *\n",
              "fetch_ms": 1, "flaky": False}]
    # 2 list pages (4 detail rows, limit 3) + detail bodies
    for page, ids, more in ((1, [10, 11], True), (2, [12, 13], False)):
        pages.append({
            "url": canonicalize(f"https://{host}/api/pb/list?page={page}"),
            "host": host, "status": 200, "content_type": "application/json",
            "body": json.dumps({"rows": [
                {"id": i, "t": f"t{i}", "detail": f"https://{host}/d/{i}"}
                for i in ids], "more": more}).encode(),
            "fetch_ms": 1, "flaky": False})
    for i in (10, 11, 12, 13):
        pages.append({"url": f"https://{host}/d/{i}", "host": host,
                      "status": 200, "content_type": "application/json",
                      "body": json.dumps({"date": "2026-03-02",
                                          "body": f"body {i}"}).encode(),
                      "fetch_ms": 1, "flaky": False})
    storage.write_table(pa.Table.from_pylist(pages, schema=PAGE_STORE_SCHEMA),
                        str(root / "pages" / f"{host}.parquet"))

    out = str(tmp_path / "out2")
    run_crawl(str(root), out, extra_strategies=[make_strategy()])
    docs = sorted(documents_dataset(out).take_all(), key=lambda r: r["doc_id"])
    # posts_limit=3 caps the 4 discovered rows
    assert [d["doc_id"] for d in docs] == ["pb/10", "pb/11", "pb/12"]
    assert docs[0]["spans"][0]["text"] == "body 10"
