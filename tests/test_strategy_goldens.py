"""Hand-written fixture-page goldens per board strategy — the reference's
embedded SAMPLE_HTML test pattern (ssu-academic-calendar/src/lib.rs:384-514).
These pages are written BY HAND, not by the corpus generator, so a
generator/parser co-drift cannot cancel out here."""

import json
from datetime import datetime

from ssufid_ray.stages.boards import BoardSpec, RowMeta, strategy_for


def spec(kind, **kw):
    d = dict(board_id="b1", host="h.kr", base_url="http://h.kr/bbs/board.php?bo_table=b1",
             board_kind=kind, date_format="yy_dash_hm", id_param="wr_id",
             page_size=15, posts_limit=100, politeness_ms=0,
             priority_date=datetime(2026, 1, 1))
    d.update(kw)
    return BoardSpec(**d)


GNUBOARD_LIST = b"""
<html><body><div id="bo_list"><table><tbody>
<tr><th>cat</th><th>subject</th></tr>
<tr><td class="td_num2"><p>\xea\xb3\xb5\xec\xa7\x80</p></td>
    <td class="td_subject"><div><a href="board.php?bo_table=b1&amp;wr_id=7">Pinned post</a></div></td>
    <td class="td_name sv_use"><span>alice</span></td><td class="td_date">26-03-02</td></tr>
<tr><td class="td_num2"><p></p></td>
    <td class="td_subject"><div><a href="board.php?bo_table=b1&amp;wr_id=6">Plain post</a></div></td>
    <td class="td_name sv_use"><span></span></td><td class="td_date">26-03-01</td></tr>
<tr><td class="td_num2"><p>x</p></td>
    <td class="td_subject"><div><a href="board.php?bo_table=b1">no id param</a></div></td>
    <td class="td_name sv_use"><span>z</span></td><td class="td_date">26-03-01</td></tr>
</tbody></table></div></body></html>
"""


def test_gnuboard_list_golden():
    s = spec("gnuboard")
    lp = strategy_for("gnuboard").parse_list(
        s, GNUBOARD_LIST, "http://h.kr/bbs/board.php?bo_table=b1&page=1")
    assert len(lp.rows) == 2  # header + id-less rows dropped (metadata.rs:24-71)
    a, b = lp.rows
    assert a.post_id == "7" and a.pinned and a.category == ["공지"]
    assert a.url == "http://h.kr/bbs/board.php?bo_table=b1&wr_id=7"
    assert a.author == "alice"
    assert b.author is None  # empty span -> None


GNUBOARD_DETAIL = """
<html><body><article>
<div id="bo_v_title"><span class="bo_v_cate">학사</span> <span class="bo_v_tit"> 공지 &amp; 안내 </span></div>
<div id="bo_v_info"><span class="if_date">26-03-02 09:30</span></div>
<div id="bo_v_con">
<p>첫 문단</p>
<img src="/files/a.png">
<blockquote>인용문</blockquote>
</div>
<div id="bo_v_file"><ul><li><a href="/files/f.pdf"><strong>양식.pdf</strong></a></li></ul></div>
</article></body></html>
""".encode("utf-8")


def test_gnuboard_detail_golden():
    s = spec("gnuboard")
    meta = RowMeta(post_id="7", url="http://h.kr/bbs/board.php?bo_table=b1&wr_id=7",
                   author="alice", category=["공지"], pinned=True)
    p = strategy_for("gnuboard").parse_detail(s, GNUBOARD_DETAIL, meta.url, meta)
    assert p["title"] == "공지 & 안내"
    assert p["created_at"] == datetime(2026, 3, 2, 0, 30)  # KST -> UTC
    assert [(x["kind"], x["text"] or x["media_ref"]) for x in p["spans"]] == [
        ("text", "첫 문단"),
        ("image", "http://h.kr/files/a.png"),
        ("text", "인용문"),
        ("attachment", "http://h.kr/files/f.pdf"),
    ]
    assert p["thumbnail"] == "http://h.kr/files/a.png"
    assert p["attachments"][0]["name"] == "양식.pdf"
    assert p["attachments"][0]["mime_type"] == "application/pdf"
    assert p["content"] == (
        '<p>첫 문단</p>\n<img src="/files/a.png">\n<blockquote>인용문</blockquote>')


def test_wordpress_detail_golden():
    s = spec("wordpress", base_url="https://h.kr/b1", date_format="ymd_korean",
             id_param="slug")
    body = """
    <table class="t_view"><tbody><tr><td><p class="title">모집 안내</p></td></tr></tbody></table>
    <ul class="date_w"><dd>2026년 03월 02일</dd><dd>조회 10</dd></ul>
    <div class="td_box"><h3>제목</h3><p>본문</p></div>
    """.encode("utf-8")
    meta = RowMeta(post_id="x", url="https://h.kr/b1/view?slug=x", pinned=True)
    p = strategy_for("wordpress").parse_detail(s, body, meta.url, meta)
    assert p["category"] == ["공지"]  # iff pinned (wordpress/mod.rs:222-224)
    assert p["created_at"] == datetime(2026, 3, 1, 15, 0)
    assert [x["text"] for x in p["spans"]] == ["제목", "본문"]
    assert p["author"] is None


def test_offset_detail_js_download_golden():
    s = spec("offset", base_url="http://h.kr/b1", date_format="dual_dash",
             id_param="idx")
    body = """
    <div class="view_head"><h3>title</h3><span class="writer">kim</span></div>
    <div class="view_body"><p>body</p></div>
    <ul class="file_list"><li><a href="javascript:download('37','form.pdf')">form.pdf</a></li></ul>
    """.encode("utf-8")
    meta = RowMeta(post_id="9", url="http://h.kr/b1/view.do?idx=9",
                   date_str="2026-03-02")
    p = strategy_for("offset").parse_detail(s, body, meta.url, meta)
    # no detail date -> list-row fallback (J3, chemeng:271-317)
    assert p["created_at"] == datetime(2026, 3, 1, 15, 0)
    # javascript:download(no, name) -> download.php URL (ee:221-324)
    assert p["attachments"][0]["url"] == "http://h.kr/download.php?name=form.pdf&no=37"
    assert p["author"] == "kim"


def test_euckr_detail_golden():
    s = spec("euckr", base_url="http://h.kr/b1", date_format="ymd_dash_hm",
             id_param="num")
    body = (
        '<div class="view_title">기숙사 공지</div>'
        '<table class="info">'
        "<tr><th>작성자</th><td>관리자</td></tr>"
        "<tr><th>작성일</th><td>2026-03-02 10:00</td></tr>"
        "</table>"
        '<div class="view_content"><p>내용</p></div>'
    ).encode("euc-kr")
    meta = RowMeta(post_id="3", url="http://h.kr/b1/view.php?num=3")
    p = strategy_for("euckr").parse_detail(s, body, meta.url, meta)
    assert p["title"] == "기숙사 공지"
    assert p["author"] == "관리자"
    assert dict(p["metadata"])["작성일"] == "2026-03-02 10:00"
    assert p["created_at"] == datetime(2026, 3, 2, 1, 0)


def test_json_api_embedded_golden():
    s = spec("json_api", base_url="https://h.kr/api/b1", date_format="iso_t",
             id_param="")
    body = json.dumps({"items": [{
        "id": 5, "title": " 공지 ", "author": "bot", "date": "2026-03-02T09:00:00",
        "updated": "2026-03-03T09:00:00", "summary": "요약",
        "category": ["학사"], "url": "https://h.kr/b1/p/5",
        "content_html": "<p>hello</p><img src=\"/i.png\">",
        "attachments": [{"url": "https://h.kr/f.hwp", "name": "파일.hwp"}],
    }]}).encode("utf-8")
    lp = strategy_for("json_api").parse_list(s, body, "https://h.kr/api/b1/posts?size=100")
    p = lp.embedded[0]
    assert p["title"] == "공지"
    assert p["updated_at"] == datetime(2026, 3, 3, 0, 0)
    assert p["description"] == "요약"
    assert [x["kind"] for x in p["spans"]] == ["text", "image", "attachment"]
    assert p["spans"][1]["media_ref"] == "https://h.kr/i.png"


def test_study_shell_and_list_golden():
    from ssufid_ray.functions.codec import encode_payload

    s = spec("study", base_url="https://h.kr/api/b1", date_format="ymd_dash_hm",
             id_param="")
    strat = strategy_for("study")
    shell = f'<html><body><textarea id="model">{encode_payload({"pageSize": 15}).decode()}</textarea></body></html>'
    state = strat.parse_shell(s, shell.encode("utf-8"))
    assert state == {"pageSize": 15}
    body = encode_payload({"items": [{"id": 1, "title": "t", "author": None,
                                      "date": "2026-03-02 10:00", "category": [],
                                      "url": "https://h.kr/b1/p/1",
                                      "content_html": "<p>x</p>"}],
                           "hasNext": False})
    lp = strat.parse_list(s, body, "https://h.kr/api/b1/xhr/list?page=1")
    assert not lp.has_more and lp.embedded[0]["doc_id"] == "b1/1"


def test_sso_chain_golden():
    """Multi-redirect SSO session (sso.rs:26-92): form scrape -> submit
    (cookie+redirect) -> landing -> token; failures mirror the reference
    error taxonomy (CantLoadForm / CantFindToken with alert message)."""
    import pytest

    s = spec("sso", base_url="https://h.kr/api/b1", date_format="iso_t", id_param="")
    strat = strategy_for("sso")
    form = (b'<html><form class="sso" method="post">'
            b'<input type="hidden" name="in_tp_bit" value="a1b2">'
            b'<input type="hidden" name="rqst_caus_cd" value="03">'
            b'</form></html>')
    fields = strat.parse_login_form(s, form)
    assert fields == {"in_tp_bit": "a1b2", "rqst_caus_cd": "03"}
    assert strat.submit_url(s, fields).endswith(
        "/sso/submit?in_tp_bit=a1b2&rqst_caus_cd=03")
    with pytest.raises(ValueError, match="in_tp_bit"):  # CantLoadForm
        strat.parse_login_form(s, b"<html><form></form></html>")

    submit = (b'<script>document.cookie="sToken=midABC";'
              b'location.href="https://h.kr/api/b1/sso/landing?sToken=midABC"'
              b'</script>')
    cookie, redirect = strat.parse_submit(s, submit)
    assert cookie == "midABC" and redirect.endswith("/sso/landing?sToken=midABC")
    with pytest.raises(ValueError, match="wrong password"):  # CantFindToken
        strat.parse_submit(s, b'<script>alert("wrong password");</script>')

    tok = strat.parse_landing(
        s, b'<html><div><textarea id="sToken"> tokXYZ </textarea></div></html>')
    assert tok == "tokXYZ"
    # the intermediate cookie is NOT the session token: the authenticated
    # list URL embeds the landing token only
    assert "sToken=tokXYZ" in strat.list_url(s, 1, token=tok)
    assert "midABC" not in strat.list_url(s, 1, token=tok)
