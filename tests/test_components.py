"""Unit tests for components not directly covered by the e2e replay:
lexical renderer goldens, seen-set shard actors, the compressed-XHR codec,
span helpers, merge predicates."""

import json

import pyarrow as pa
import pytest

from ssufid_ray.functions.codec import decode_payload, encode_payload
from ssufid_ray.functions.lexical import lexical_to_spans
from ssufid_ray.functions.spans import (
    append_attachment_spans,
    first_image,
    spans_from_container,
)
from ssufid_ray.functions.html import parse_html
from ssufid_ray.functions.textnorm import contents_eq, description_fallback


def test_lexical_golden():
    state = {"root": {"type": "root", "children": [
        {"type": "paragraph", "children": [
            {"type": "text", "text": "Hello "}, {"type": "text", "text": "world"}]},
        {"type": "heading", "tag": "h2", "children": [{"type": "text", "text": "제목"}]},
        {"type": "image", "src": "/files/a.png", "altText": "x", "width": 10},
        {"type": "horizontalrule"},
        {"type": "list", "listType": "bullet", "children": [
            {"type": "listitem", "children": [{"type": "text", "text": "one"}]},
            {"type": "listitem", "children": [{"type": "text", "text": "two"}]}]},
        {"type": "table", "children": [
            {"type": "tablerow", "children": [
                {"type": "tablecell", "children": [{"type": "text", "text": "a"}]},
                {"type": "tablecell", "children": [{"type": "text", "text": "b"}]}]}]},
        {"type": "paragraph", "children": []},  # empty -> skipped
    ]}}
    spans = lexical_to_spans(json.dumps(state), "https://h.kr/api/x/doc/1")
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in spans] == [
        ("text", "Hello world"),
        ("text", "제목"),
        ("image", "https://h.kr/files/a.png"),
        ("text", "one"),
        ("text", "two"),
        ("text", "a | b"),
    ]
    assert [s["offset"] for s in spans] == list(range(6))


def test_empty_lexical_state():
    assert lexical_to_spans('{"root": {"type": "root", "children": []}}', "http://h") == []


def test_codec_roundtrip():
    obj = {"items": [{"id": 1, "title": "공지"}], "hasNext": True}
    assert decode_payload(encode_payload(obj)) == obj


def test_lz_string_utf16_semantics():
    """Real lz-string (pieroxy) UTF-16 container semantics: 15-bit chars
    offset by 32, trailing space, literal/dict token stream."""
    import pytest as _pytest

    from ssufid_ray.functions.codec import (compress_to_utf16,
                                            decompress_from_utf16)

    for s in ["", "a", "ababababab", "Hello, world!", "공지사항 " * 40,
              "😀 astral 🐍", "\x00ctrl"]:
        z = compress_to_utf16(s)
        assert z.endswith(" ")
        assert all(32 <= ord(ch) < 32 + (1 << 15) for ch in z[:-1])
        assert decompress_from_utf16(z) == s
    # golden: hand-derived from the public spec for "a" — token 0 (2 bits)
    # + literal 97 LSB-first (8 bits) + end token 2 (3 bits) + zero flush
    # = 0b001000011001000 = 4296, +32 container offset = 4328
    assert [ord(c) for c in compress_to_utf16("a")] == [4328, 32]
    assert [ord(c) for c in compress_to_utf16("aaa")] == [4325, 32, 32]
    assert decompress_from_utf16("") is None  # lz-string contract
    with _pytest.raises(ValueError):
        decode_payload("corrupt!".encode("utf-8"))


def test_span_helpers():
    doc = parse_html('<div id="c"><p>hi</p><img src="/i.png"><p>  </p><h3>x</h3></div>')
    spans = spans_from_container(doc.select_one("#c"), "http://h.kr/a/b")
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in spans] == [
        ("text", "hi"), ("image", "http://h.kr/i.png"), ("text", "x")]
    spans = append_attachment_spans(spans, [{"url": "http://h.kr/f.pdf", "name": None,
                                             "mime_type": None}])
    assert spans[-1] == {"kind": "attachment", "text": "", "media_ref": "http://h.kr/f.pdf",
                         "offset": 3}
    assert first_image(spans) == "http://h.kr/i.png"


def test_contents_eq_trim_semantics():
    a = {"post_id": "1", "title": "t", "category": ["공지"], "content": "<p>x</p>"}
    b = {"post_id": "1 ", "title": " t ", "category": ["공지"], "content": "\n<p>x</p> "}
    assert contents_eq(a, b)  # id/title/content trimmed (post.rs:50-55)
    c = dict(b, content="<p>y</p>")
    assert not contents_eq(a, c)
    d = dict(b, category=[])
    assert not contents_eq(a, d)
    # category compares UNTRIMMED (post.rs:53): whitespace change = update
    e = dict(b, category=[" 공지"])
    assert not contents_eq(a, e)


def test_description_fallback_first_50():
    assert description_fallback(None, "x" * 80) == "x" * 50 + "..."
    assert description_fallback(None, "x" * 50) == "x" * 50  # short: no suffix
    assert description_fallback("d", "x" * 80) == "d"


def test_seen_shard_actor_roundtrip(ray_session, tmp_path):
    from ssufid_ray.state.seen import SeenSet

    seen = SeenSet.create(num_shards=4, capacity_per_shard=1 << 12)
    urls = [f"http://h{i % 5}.kr/p{i}" for i in range(200)]
    hosts = [f"h{i % 5}.kr" for i in range(200)]
    fresh = seen.check_and_add(urls, hosts)
    assert all(fresh)
    again = seen.check_and_add(urls, hosts)
    assert not any(again)
    assert seen.size() == 200
    seen.checkpoint(str(tmp_path))
    seen2 = SeenSet.create(num_shards=4, capacity_per_shard=1 << 12)
    seen2.restore(str(tmp_path))
    assert seen2.members() == set(urls)
    assert not any(seen2.check_and_add(urls[:10], hosts[:10]))


def test_seen_filter_stage(ray_session):
    import ray.data

    from ssufid_ray.state.seen import SeenFilter, SeenSet

    seen = SeenSet.create(num_shards=2, capacity_per_shard=1 << 10)
    t = pa.table({"url": [f"u{i}" for i in [1, 2, 3, 2, 1, 4]],
                  "host": ["h1", "h2", "h1", "h2", "h1", "h2"]})
    out = (ray.data.from_arrow(t)
           .map_batches(SeenFilter(seen), batch_format="pyarrow", batch_size=None)
           .take_all())
    assert [r["url"] for r in out] == ["u1", "u2", "u3", "u4"]


def test_kv_table_and_frontmatter():
    from ssufid_ray.functions.kvtable import (
        parse_header_zip_table,
        parse_kv_table,
        render_frontmatter,
    )

    doc = parse_html(
        '<table class="info">'
        "<tr><th>과정</th><td>학사</td></tr>"
        "<tr><th>기간</th><td>2026. 3. 2 ~ 3. 6</td></tr>"
        "<tr><td>no-th-cell</td></tr>"
        "</table>"
        '<table class="div">'
        "<tr><th>이름</th><th>정원</th></tr>"
        "<tr><td>A</td><td>30</td></tr>"
        "<tr><td>B</td></tr>"
        "</table>"
    )
    kv = parse_kv_table(doc.select_one("table.info"))
    assert kv == [("과정", "학사"), ("기간", "2026. 3. 2 ~ 3. 6")]
    rows = parse_header_zip_table(doc.select_one("table.div"))
    assert rows == [{"이름": "A", "정원": "30"}, {"이름": "B", "정원": ""}]
    fm = render_frontmatter(kv, "<p>body</p>")
    assert fm.startswith("---\n과정: 학사\n")
    assert '기간: "2026. 3. 2 ~ 3. 6"' not in fm  # no ':' in value -> unquoted
    assert "기간: 2026. 3. 2 ~ 3. 6" in fm
    assert fm.endswith("---\n<p>body</p>")


def test_read_documents_both_layouts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ssufid_ray.schema import DOCUMENTS_SCHEMA
    from ssufid_ray.sources.readers import read_documents

    # flat layout (driver generic table)
    flat = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": ["a b c d e f g h i j k l", "short text"],
                     "lang": ["en", "en"], "source": ["s", "s"],
                     "n_chars": pa.array([23, 10], pa.int64())})
    pq.write_table(flat, tmp_path / "flat.parquet")
    rows = read_documents(str(tmp_path / "flat.parquet")).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id["1"]["spans"][0]["text"] == "a b c d e f g h i j"
    assert by_id["1"]["spans"][1]["offset"] == 1
    # span layout (engine native)
    span_tbl = pa.Table.from_pylist(
        [{"doc_id": "x/1", "spans": [{"kind": "text", "text": "hi",
                                      "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA)
    pq.write_table(span_tbl, tmp_path / "spans.parquet")
    rows = read_documents(str(tmp_path / "spans.parquet")).take_all()
    assert rows[0]["doc_id"] == "x/1" and rows[0]["spans"][0]["text"] == "hi"


def test_cli_synth_and_crawl_verify(ray_session, tmp_path):
    from ssufid_ray.cli import main

    corpus = str(tmp_path / "corpus")
    assert main(["synth", "--out", corpus, "--scale", "0.1"]) == 0
    out = str(tmp_path / "out")
    # exit 1: the corpus contains the board-level-retry fixture board, and
    # the CLI surfaces "N of M Run failed" like cli/main.rs:118-125
    assert main(["crawl", "--corpus", corpus, "--out", out]) == 1
    assert main(["verify", "--corpus", corpus, "--out", out]) == 0
    assert main(["calendar", "--corpus", corpus, "--out", out]) == 0


def test_hll_accuracy(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from ssufid_ray.stages.sketches import hll_distinct

    sf = "/root/testdata/sf0.01"
    for table, col in (("events", "user_id"), ("lineitem", "l_orderkey")):
        exact = len(set(pq.read_table(f"{sf}/{table}.parquet", columns=[col])
                        [col].to_pylist()))
        est = hll_distinct(ray.data.read_parquet(f"{sf}/{table}.parquet",
                                                 columns=[col]), col)
        assert abs(est - exact) / exact < 0.05, (table, col, est, exact)
    # determinism (stable hashing, no RNG)
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    assert hll_distinct(ds, "user_id") == hll_distinct(ds, "user_id")


def test_multimodal_decode_both_modes(monkeypatch):
    """MediaDecoder: the stub path (this container) and the real-codec
    path (PIL importable) must emit the same schema; an undecodable
    payload on the real path falls back to the stub per row instead of
    failing the batch. PIL is absent here, so the real path is exercised
    through an injected fake codec module."""
    import sys
    import types

    import numpy as np
    import pyarrow as pa

    from ssufid_ray.stages.multimodal import MEDIA_META_SCHEMA, MediaDecoder

    batch = pa.table({
        "media_id": pa.array(["m1", "m2", "m3"]),
        "kind": pa.array(["image", "image", "audio"]),
        "payload": pa.array([b"goodimg", b"corrupt", b"wavdata"], pa.binary()),
        "content_type": pa.array(["image/png", "image/png", "audio/wav"]),
    })

    stub_out = MediaDecoder()(batch)  # no PIL in this container
    assert stub_out.schema.equals(MEDIA_META_SCHEMA)

    class FakeImg:
        size = (320, 240)

        def convert(self, mode):
            return self

        def resize(self, wh):
            return np.full((1, 8), 128, dtype=np.uint8)

    def fake_open(buf):
        if buf.getvalue() == b"goodimg":
            return FakeImg()
        raise OSError("cannot identify image file")

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = fake_open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    real_out = MediaDecoder()(batch)
    assert real_out.schema.equals(MEDIA_META_SCHEMA)
    rows = {r["media_id"]: r for r in real_out.to_pylist()}
    stub_rows = {r["media_id"]: r for r in stub_out.to_pylist()}
    # decodable image: real dims + real feature
    assert (rows["m1"]["width"], rows["m1"]["height"]) == (320, 240)
    assert rows["m1"]["feature"] == [pytest.approx(128 / 255.0)] * 8
    # corrupt image payload and non-image kind: per-row stub fallback
    assert rows["m2"] == stub_rows["m2"]
    assert rows["m3"] == stub_rows["m3"]


def test_ivf_partial_build_recovers(ray_session):
    """A build that crashed after a partial write_parquet (partition files
    present, no _DONE) must be discarded and rebuilt — never appended to:
    appended files double rows and surface duplicate neighbor_ids."""
    from pathlib import Path

    from ssufid_ray.stages.similarity import build_ivf_index, ivf_topk

    sf = "/root/testdata/sf0.001"
    clean = ivf_topk(sf)
    assert not clean.duplicated(["query_id", "neighbor_id"]).any()

    idx_dir, _ = build_ivf_index(sf)
    # simulate the crash window: partitions written, _DONE never landed
    Path(idx_dir, "_DONE").unlink()
    rebuilt = ivf_topk(sf)
    assert Path(idx_dir, "_DONE").exists()
    assert not rebuilt.duplicated(["query_id", "neighbor_id"]).any()
    assert rebuilt.equals(clean)


def test_emb_matrix_parity_on_sliced_arrays():
    """emb_matrix must equal the per-element conversion on plain, sliced
    and multi-chunk list<float> columns (groupby emits sliced blocks, and
    .values on a sliced ListArray would silently read the wrong rows)."""
    import numpy as np
    import pyarrow as pa

    from ssufid_ray.functions.emb import emb_matrix

    arr = pa.array([[float(i), float(i + 1), float(i + 2)] for i in range(10)],
                   pa.list_(pa.float32()))
    cases = [arr, arr.slice(3, 5),
             pa.chunked_array([arr.slice(0, 4), arr.slice(4, 6)])]
    for c in cases:
        plain = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        want = np.array(plain.to_pylist(), dtype=np.float64)
        assert np.array_equal(emb_matrix(c), want)


def test_countmin_bounds(ray_session):
    """Count-min guarantee: est >= exact for every probed token, and the
    total over-estimate respects the eps*N bound (eps = 2/width) with
    depth-4 slack; plus determinism across runs."""
    import duckdb

    from ssufid_ray.stages.sketches import CM_WIDTH, countmin_tokens

    sf = "/root/testdata/sf0.01"
    out = countmin_tokens(sf)
    assert len(out) > 0
    exact = dict(duckdb.sql(f"""
        SELECT w, COUNT(*) FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM read_parquet('{sf}/documents.parquet')) GROUP BY w
        """).fetchall())
    n_total = sum(exact.values())
    for tok, est in zip(out["token"], out["est_count"]):
        ex = exact[tok]
        assert est >= ex, (tok, est, ex)
        assert est - ex <= 2 * n_total * 2 // CM_WIDTH, (tok, est, ex)
    assert out.equals(countmin_tokens(sf))


def test_bucket_join_contract(ray_session):
    """The shared co-partitioned join helper: inner and left joins,
    payload dtype restoration after pandas null-promotion, string keys
    via a custom bucket function, and empty-side schema stability."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ssufid_ray.stages.relational import bucket_join

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 66, 130], "v": [10, 20, 30, 40, 50]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": [2, 66, 999], "w": [200, 6600, 0]}))
    out_schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                            ("w", pa.int64())])

    def post(df):
        return pa.table({"k": pa.array(df["k"].to_numpy(), pa.int64()),
                         "v": pa.array(df["v"].to_numpy(), pa.int64()),
                         "w": pa.array(df["w"].to_numpy().astype("int64")
                                       if df["w"].notna().all()
                                       else df["w"].fillna(-1).to_numpy()
                                       .astype("int64"), pa.int64())})

    # inner: only matching keys survive, ints stay ints (k=2 and k=66 —
    # 66 & 63 == 2, so both land in bucket 2 and must not cross-match)
    got = (bucket_join(left, right, key="k", left_cols={"v": pa.int64()},
                       right_cols={"w": pa.int64()}, post=post,
                       out_schema=out_schema)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.to_dict("list") == {"k": [2, 66], "v": [20, 40],
                                   "w": [200, 6600]}
    assert all(str(got[c].dtype) == "int64" for c in got.columns)

    # left: unmatched left rows survive with NaN right payload
    got = (bucket_join(left, right, key="k", left_cols={"v": pa.int64()},
                       right_cols={"w": pa.int64()}, post=post,
                       out_schema=out_schema, how="left")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [1, 2, 3, 66, 130]
    assert got["w"].tolist() == [-1, 200, -1, 6600, -1]

    # string keys via a custom bucket function; both sides use it
    def sbucket(col):
        from zlib import crc32
        return pa.array([crc32(v.encode()) & 63 for v in col.to_pylist()],
                        pa.int32())

    sleft = ray.data.from_pandas(pd.DataFrame(
        {"k": ["aa", "bb", "cc"], "v": [1, 2, 3]}))
    sright = ray.data.from_pandas(pd.DataFrame(
        {"k": ["bb", "cc", "dd"], "w": [22, 33, 44]}))
    def spost(df):
        return pa.table({"k": pa.array(df["k"], pa.string()),
                         "v": pa.array(df["v"].to_numpy(), pa.int64()),
                         "w": pa.array(df["w"].to_numpy().astype("int64"),
                                       pa.int64())})

    got = (bucket_join(sleft, sright, key="k", left_cols={"v": pa.int64()},
                       right_cols={"w": pa.int64()}, post=spost,
                       out_schema=pa.schema([("k", pa.string()),
                                             ("v", pa.int64()),
                                             ("w", pa.int64())]),
                       bucket_of=sbucket)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == ["bb", "cc"]
    assert got["w"].tolist() == [22, 33]

    # empty right side: inner join yields zero rows but a STABLE schema
    eright = ray.data.from_pandas(pd.DataFrame(
        {"k": pd.Series(dtype="int64"), "w": pd.Series(dtype="int64")}))
    got = bucket_join(left, eright, key="k", left_cols={"v": pa.int64()},
                      right_cols={"w": pa.int64()}, post=post,
                      out_schema=out_schema).to_pandas()
    assert len(got) == 0


def test_bucket_join_matches_pandas_merge(ray_session):
    """Randomized (seeded) equivalence: bucket_join == plain pandas merge
    for inner and left joins over skewed int keys, including duplicate
    keys on both sides (the helper must produce the full cross-product
    per key, exactly like merge)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ssufid_ray.stages.relational import bucket_join

    rng = np.random.RandomState(0)
    out_schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                            ("w", pa.int64())])

    def post(df):
        return pa.table({"k": pa.array(df["k"].to_numpy(), pa.int64()),
                         "v": pa.array(df["v"].to_numpy(), pa.int64()),
                         "w": pa.array(df["w"].fillna(-1).to_numpy()
                                       .astype("int64"), pa.int64())})

    for trial in range(5):
        nl, nr = rng.randint(1, 400), rng.randint(0, 120)
        lf = pd.DataFrame({"k": rng.zipf(1.8, nl).astype("int64") % 97,
                           "v": rng.randint(0, 1000, nl).astype("int64")})
        rt = pd.DataFrame({"k": rng.zipf(1.8, max(nr, 1)).astype("int64") % 97,
                           "w": rng.randint(0, 1000, max(nr, 1))
                           .astype("int64")}).iloc[:nr]
        for how in ("inner", "left"):
            got = (bucket_join(ray.data.from_pandas(lf),
                               ray.data.from_pandas(rt), key="k",
                               left_cols={"v": pa.int64()},
                               right_cols={"w": pa.int64()},
                               post=post, out_schema=out_schema, how=how)
                   .to_pandas())
            want = lf.merge(rt, on="k", how=how)
            want["w"] = want["w"].fillna(-1).astype("int64") if how == "left" \
                else want["w"].astype("int64")
            srt = lambda d: (d.sort_values(["k", "v", "w"])
                             .reset_index(drop=True))
            assert srt(got).equals(srt(want[["k", "v", "w"]])), (trial, how)


def test_skyline_dominance_property():
    """_skyline survivors are exactly the undominated points (maximize p,
    minimize d, one strict coordinate), checked brute-force on seeded
    random inputs with heavy ties and duplicate rows."""
    import numpy as np
    import pandas as pd
    from ssufid_ray.stages.relational import _skyline

    rng = np.random.default_rng(7)
    for _ in range(5):
        n = 200
        df = pd.DataFrame({
            "o_orderkey": np.arange(n, dtype=np.int64),
            "p": rng.integers(0, 20, n),          # heavy ties
            "d": rng.integers(0, 20, n)})
        sky = _skyline(df)
        p, d = df["p"].to_numpy(), df["d"].to_numpy()
        dominated = np.array([
            bool(np.any((p >= p[i]) & (d <= d[i])
                        & ((p > p[i]) | (d < d[i]))))
            for i in range(n)])
        expect = set(df.loc[~dominated, "o_orderkey"])
        assert set(sky["o_orderkey"]) == expect
        # block-union invariant: global skyline survives local skylines
        half = _skyline(df.iloc[:n // 2]).merge(
            _skyline(df.iloc[n // 2:]), how="outer")
        assert expect <= set(_skyline(half)["o_orderkey"])


def test_q18_gate_parity(ray_session):
    """q18's qualifying-key attach must give identical results through
    the broadcast path (default at test scale) and the co-partitioned
    bucket_join path (gate forced to 0)."""
    from ssufid_ray.stages.relational import q18_large_volume

    sf = "/root/testdata/sf0.001"
    a = q18_large_volume(sf)
    b = q18_large_volume(sf, broadcast_rows=0)
    assert a.equals(b) and len(a) > 0


def test_group_hll_accuracy_and_determinism(ray_session):
    """Per-type HLL estimates must land within the sketch's error budget
    of the exact per-type distinct counts, and repeat runs must be
    bit-identical (seeded hash, associative merge)."""
    import duckdb

    from ssufid_ray.stages.sketches import group_hll_distinct

    sf = "/root/testdata/sf0.01"
    got = group_hll_distinct(sf)
    again = group_hll_distinct(sf)
    assert got.equals(again)
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"GROUP BY event_type ORDER BY event_type").df()
    assert list(got["event_type"]) == list(exact["event_type"])
    for est, true in zip(got["n_users_est"], exact["n"]):
        assert abs(est - true) / true < 0.05, (est, true)


def test_exact_pair_enumeration_is_i_major():
    """Pins the exact embedding-pair linearization (dedup.py score):
    k = row_start(i) + (j - i) decoded back to (i, j) must walk the upper
    triangle in i-MAJOR order — consecutive k share the left block i until
    the row ends. The block-locality of the pair scheduler (one left-block
    fetch per row run on a real cluster) relies on exactly this order."""
    import numpy as np

    nb = 7

    def row_start(i):
        return i * nb - i * (i - 1) // 2

    ks = np.arange(nb * (nb + 1) // 2, dtype=np.int64)
    fi = np.floor(((2 * nb + 1)
                   - np.sqrt(float(2 * nb + 1) ** 2 - 8.0 * ks)) / 2
                  ).astype(np.int64)
    fi = np.where(row_start(fi + 1) <= ks, fi + 1, fi)
    fi = np.where(row_start(fi) > ks, fi - 1, fi)
    fj = ks - row_start(fi) + fi
    got = list(zip(fi.tolist(), fj.tolist()))
    want = [(i, j) for i in range(nb) for j in range(i, nb)]  # i-major
    assert got == want


def test_lance_roundtrip_when_available(ray_session, tmp_path):
    """Exercises the Lance-first branch of storage.write_dataset /
    read_dataset the moment the `lance` package exists (skipped in this
    sandbox, where HAVE_LANCE is False and the parquet fallback — covered
    everywhere else — is taken)."""
    from ssufid_ray import storage

    if not storage.HAVE_LANCE:
        pytest.skip("lance not installed; parquet fallback covered elsewhere")
    import ray.data

    tbl = pa.table({"doc_id": ["a", "b"], "n": [1, 2]})
    path = str(tmp_path / "roundtrip.lance")
    storage.write_dataset(ray.data.from_arrow(tbl), path)
    back = storage.read_dataset(path).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == ["a", "b"] and list(back["n"]) == [1, 2]
