"""Merge-upsert (J1) vs the generator's merge fixture, grouped top-k (A3),
and the site/RSS/ICS sinks — mirrors the reference's constructed-record
merge tests (core/mod.rs:640-794) at corpus scale."""

import collections
import json
from datetime import datetime
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from ssufid_ray import storage


@pytest.fixture(scope="module")
def merged(corpus, crawl_out):
    import ray.data

    from ssufid_ray.pipelines.crawl import documents_dataset
    from ssufid_ray.schema import POSTS_SCHEMA
    from ssufid_ray.stages.merge import merge_posts

    (d, meta), (out, _) = corpus, crawl_out
    now = datetime.fromisoformat(meta["merge_now"])
    new_ds = documents_dataset(out)
    cache_ds = ray.data.from_arrow(storage.read_table(str(Path(d) / "cache_prev.parquet")))
    return merge_posts(new_ds, cache_ds, now=now).materialize()


def test_merge_outcomes_match_fixture(corpus, merged):
    d, _ = corpus
    expect = {
        r["doc_id"]: r["outcome"]
        for r in storage.read_table(str(Path(d) / "merge_expect.parquet")).to_pylist()
    }
    got = {r["doc_id"]: r["outcome"]
           for r in merged.select_columns(["doc_id", "outcome"]).take_all()}
    assert got == expect
    counts = collections.Counter(got.values())
    assert counts["created"] > 0 and counts["updated"] > 0
    assert counts["skipped"] > 0 and counts["preserved"] > 0


def test_merge_final_rows_match_fixture(corpus, merged):
    d, _ = corpus
    truth = {r["doc_id"]: r
             for r in storage.read_table(str(Path(d) / "merge_final.parquet")).to_pylist()}
    got = {r["doc_id"]: r for r in merged.take_all()}
    assert set(truth) == set(got)
    fields = ["title", "content", "created_at", "updated_at", "category",
              "author", "attachments", "spans"]
    for doc_id, t in truth.items():
        g = got[doc_id]
        for f in fields:
            assert g[f] == t[f], (doc_id, f, t[f], g[f])


def test_topk_per_board(merged):
    from ssufid_ray.stages.merge import topk_per_board

    k = 5
    top = topk_per_board(merged, k=k).take_all()
    by_board = collections.defaultdict(list)
    for r in sorted(top, key=lambda r: r["rank"]):
        by_board[r["plugin_id"]].append(r)
    assert by_board
    for pid, rows in by_board.items():
        assert len(rows) <= k
        dates = [r["created_at"] for r in rows]
        assert dates == sorted(dates, reverse=True)  # newest first
        assert [r["rank"] for r in rows] == list(range(len(rows)))


def test_site_outputs(merged, tmp_path):
    from ssufid_ray.pipelines.site import write_site_outputs
    from ssufid_ray.stages.merge import topk_per_board

    top = topk_per_board(merged, k=5)
    manifest = write_site_outputs(top, str(tmp_path)).take_all()
    assert len(manifest) > 10
    row = manifest[0]
    data = json.loads((Path(row["dir"]) / "data.json").read_text())
    assert data["title"] == row["plugin_id"]
    assert len(data["items"]) == row["n_items"]
    item = data["items"][0]
    assert set(item) == {"id", "url", "author", "title", "description", "category",
                         "created_at", "updated_at", "thumbnail", "content",
                         "attachments", "metadata"}
    rss = (Path(row["dir"]) / "rss.xml").read_text()
    assert 'guid isPermaLink="false"' in rss
    assert "<pubDate>" in rss and "+0000" in rss
