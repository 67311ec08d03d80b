"""Deterministic synthetic crawl corpus: seed list, page store, oracle.

Stands in for the live SSU boards (no network in this sandbox; the reference
crawls ~56 real boards). One seeded RNG drives everything; the ground truth
(span sequences, crawl ordering, URL-seen membership, merge outcomes) is
derived from generation metadata — NOT by re-parsing the rendered pages — so
parser bugs cannot cancel out (SURVEY §7.4).

The crawl policy the oracle encodes (and the engine must reproduce):
  per host:   robots.txt first, then boards strictly in priority order
              (priority_date desc, board_id asc) — the frontier's priority
              heap keyed (board, posted_date desc); politeness serializes a
              host anyway, so per-host board order is the heap order.
  per board:  list pages in protocol order (each protocol's pagination rule,
              reference SURVEY §2.1 S1-S9), then details in list-row order,
              truncated to posts_limit distinct; at issue time each detail
              URL is checked seen-set first (dup_skipped), then robots
              (robots_blocked); flaky fetches retry (outcome stays fetched),
              permanent 500s exhaust retries (error_retry).
  fetch_seq:  dense per-host issue order over actually-issued fetches;
              dup_skipped / robots_blocked rows carry seq -1.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa

from ssufid_ray import storage
from ssufid_ray.functions.textnorm import guess_mime
from ssufid_ray.schema import (
    CALENDAR_SCHEMA,
    CRAWL_ORACLE_SCHEMA,
    PAGE_STORE_SCHEMA,
    POSTS_SCHEMA,
    SEED_SCHEMA,
)
from ssufid_ray.urlnorm import canonicalize

KST = timedelta(hours=9)

_KO_WORDS = (
    "공지 안내 모집 신청 기간 변경 장학 수강 졸업 학사 일정 특강 채용 세미나 "
    "행사 등록 마감 연장 결과 발표 대상 학생 교수 학과 대학 캠퍼스 온라인 제출 "
    "서류 문의 바랍니다 합니다 관련 프로그램 운영 참여 추가 확인"
).split()
_EN_WORDS = (
    "notice announcement application deadline program scholarship seminar "
    "registration schedule update campus online submit document extended "
    "result students faculty department university spring fall winter summer"
).split()

_BLOCK_TAGS = ("p", "p", "p", "h3", "blockquote")  # text-block tag mix

PAGE_CAP = 50
RETRY_COUNT = 3  # reference core/mod.rs:28


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _sentence(rng: random.Random, lo=3, hi=12) -> str:
    n = rng.randint(lo, hi)
    bank = _KO_WORDS if rng.random() < 0.6 else _EN_WORDS
    words = [rng.choice(bank) for _ in range(n)]
    if rng.random() < 0.08:
        words.insert(rng.randrange(len(words)), "R&D")  # entity-escape exercise
    return " ".join(words)


# --------------------------------------------------------------------------
# board/host layout


_KIND_DATEFMT = {
    "gnuboard": "yy_dash_hm",
    "wordpress": None,  # chosen per board from 3 formats (M8)
    "wordpress_card": "ymd_dot",
    "ssucatch": "ymd_korean",
    "offset": None,  # ymd_dot_spaced | dual_dash
    "euckr": "ymd_dash_hm",
    "json_api": "iso_t",
    "cursor": "ymd_slash_hms",
    "lexical": "iso_t",
    "study": "ymd_dash_hm",
    "sso": "iso_t",
}
_KIND_IDPARAM = {
    "gnuboard": "wr_id",
    "wordpress": "slug",
    "wordpress_card": "slug",
    "ssucatch": "",
    "offset": "idx",
    "euckr": "num",
    "json_api": "",
    "cursor": "",
    "lexical": "",
    "study": "",
    "sso": "",
}
_MINUTE_FORMATS = {"yy_dash_hm", "ymd_dash_hm", "ymd_slash_hms", "iso_t", "dual_dash"}


def _board_layout(rng: random.Random) -> list[dict]:
    """~56 boards over ~20 hosts; host 0 Zipf-dominant."""
    hosts = ["notice.ssu.ac.kr"] + [
        f"{name}.ssu.ac.kr"
        for name in (
            "cse", "biz", "ee", "me", "chem", "law", "eco", "media", "dorm",
            "inso", "film", "startup", "stu", "mgmt", "soar", "bioinfo",
            "materials", "infocom", "path",
        )
    ]
    scheme = {h: ("https" if i % 3 else "http") for i, h in enumerate(hosts)}
    boards: list[dict] = []

    def add(host: str, kind: str, n: int, factor_range: tuple[float, float]):
        for _ in range(n):
            i = len(boards)
            bid = f"{host.split('.')[0]}-{kind[:4]}-{i:02d}"
            sch = scheme[host]
            base = {
                "gnuboard": f"{sch}://{host}/bbs/board.php?bo_table={bid}",
                "wordpress": f"{sch}://{host}/{bid}",
                "wordpress_card": f"{sch}://{host}/{bid}",
                "ssucatch": f"{sch}://{host}/category/{bid}",
                "offset": f"{sch}://{host}/{bid}",
                "euckr": f"{sch}://{host}/{bid}",
                "json_api": f"{sch}://{host}/api/{bid}",
                "cursor": f"{sch}://{host}/api/{bid}",
                "lexical": f"{sch}://{host}/api/{bid}",
                "study": f"{sch}://{host}/api/{bid}",
                "sso": f"{sch}://{host}/api/{bid}",
            }[kind]
            fmt = _KIND_DATEFMT[kind] or (
                rng.choice(["ymd_dash", "ymd_dot", "ymd_korean"])
                if kind == "wordpress"
                else rng.choice(["ymd_dot_spaced", "dual_dash"])
            )
            boards.append(
                {
                    "board_id": bid,
                    "host": host,
                    "scheme": sch,
                    "base_url": canonicalize(base),
                    "board_kind": kind,
                    "date_format": fmt,
                    "id_param": _KIND_IDPARAM[kind],
                    "page_size": rng.choice([10, 15]),
                    "politeness_ms": 300 if kind.startswith("wordpress") else rng.choice([0, 100]),
                    "size_factor": rng.uniform(*factor_range),
                    "pinned_count": rng.choice([0, 1, 2, 3]) if kind in (
                        "gnuboard", "wordpress", "wordpress_card", "offset") else 0,
                }
            )

    # dominant host: 12 boards, oversized
    add(hosts[0], "gnuboard", 6, (1.5, 3.0))
    add(hosts[0], "wordpress", 3, (1.5, 2.5))
    add(hosts[0], "offset", 2, (1.5, 2.5))
    add(hosts[0], "ssucatch", 1, (1.5, 2.0))
    # the long tail
    tail = (
        ["gnuboard"] * 10 + ["wordpress"] * 9 + ["wordpress_card"] * 4
        + ["ssucatch"] * 5 + ["offset"] * 6 + ["euckr"] * 2
        + ["json_api"] * 4 + ["cursor"] * 2 + ["lexical"] * 2
        + ["study"] * 2 + ["sso"] * 2
    )
    for j, kind in enumerate(tail):
        add(hosts[1 + j % (len(hosts) - 1)], kind, 1, (0.3, 1.8))
    return boards


# --------------------------------------------------------------------------
# posts + spans


def _round_for_format(kst: datetime, fmt: str) -> datetime:
    if fmt in _MINUTE_FORMATS:
        if fmt == "ymd_slash_hms" or fmt == "iso_t":
            return kst.replace(microsecond=0)
        return kst.replace(second=0, microsecond=0)
    return kst.replace(hour=0, minute=0, second=0, microsecond=0)


def _fmt_date(kst: datetime, fmt: str) -> str:
    return {
        "ymd_dash": kst.strftime("%Y-%m-%d"),
        "ymd_dot": kst.strftime("%Y.%m.%d"),
        "ymd_korean": f"{kst.year}년 {kst.month:02d}월 {kst.day:02d}일",
        "ymd_dot_spaced": kst.strftime("%Y. %m. %d"),
        "yy_dash_hm": kst.strftime("%y-%m-%d %H:%M"),
        "ymd_dash_hm": kst.strftime("%Y-%m-%d %H:%M"),
        "ymd_slash_hms": kst.strftime("%Y/%m/%d %H:%M:%S"),
        "iso_t": kst.strftime("%Y-%m-%dT%H:%M:%S"),
        "dual_dash": kst.strftime("%Y-%m-%d %H:%M"),
    }[fmt]


def _make_media_pool(rng: random.Random, scheme: str, host: str) -> dict:
    return {
        "images": [f"{scheme}://{host}/files/img_{i:04d}.png" for i in range(40)],
        "files": [
            f"{scheme}://{host}/files/doc_{i:04d}.{rng.choice(['pdf', 'hwp', 'xlsx', 'zip'])}"
            for i in range(30)
        ],
    }


def _gen_post(rng: random.Random, board: dict, n: int, kst: datetime, pool: dict,
              pinned: bool) -> dict:
    """One post's ground truth: fields + abstract content blocks + spans."""
    kind = board["board_kind"]
    title = _sentence(rng, 2, 6).rstrip(".")
    n_spans = rng.choice([1, 2, 3, 4, 5, 6, 8, 12, 20, 40])
    blocks = []  # (block_kind, payload)
    media_only = rng.random() < 0.05
    for _ in range(n_spans):
        r = rng.random()
        if media_only or r < 0.20:
            blocks.append(("image", rng.choice(pool["images"])))
        else:  # attachments enter via the attachment list, never as blocks
            blocks.append(("text", _sentence(rng)))
    if media_only:
        blocks = [b for b in blocks if b[0] == "image"] or [("image", rng.choice(pool["images"]))]
    n_atts = (
        rng.choice([0, 0, 0, 1, 1, 2])
        if kind in ("gnuboard", "ssucatch", "offset", "json_api", "cursor")
        else 0
    )
    attachments = []
    for _ in range(n_atts):
        u = rng.choice(pool["files"])
        name = f"{rng.choice(['공고문', '신청서', 'form', 'guide'])}_{rng.randint(1, 99)}.{u.rsplit('.', 1)[1]}"
        attachments.append({"url": u, "name": name, "mime_type": guess_mime(name)})
    author = (
        rng.choice(["관리자", "학사팀", "admin", None, None])
        if kind in ("gnuboard", "offset", "euckr", "json_api", "cursor", "lexical")
        else None
    )
    category = []
    if kind == "gnuboard":
        category = ["공지"] if pinned else ([rng.choice(["학사", "장학", "일반"])] if rng.random() < 0.7 else [])
    elif kind in ("wordpress", "wordpress_card"):
        category = ["공지"] if pinned else []
    elif kind == "ssucatch":
        category = rng.sample(["학사", "장학", "국제교류", "채용"], rng.randint(1, 2))
    elif kind == "offset":
        category = ["공지"] if pinned else []
    updated = None
    if kind == "json_api" and rng.random() < 0.2:
        updated = kst + timedelta(hours=rng.randint(1, 48))
    spans = []
    for bk, payload in blocks:
        if bk == "image":
            spans.append({"kind": "image", "text": "", "media_ref": payload, "offset": -1})
        else:
            spans.append({"kind": "text", "text": payload, "media_ref": "", "offset": -1})
    for att in attachments:
        spans.append({"kind": "attachment", "text": "", "media_ref": att["url"], "offset": -1})
    for i, s in enumerate(spans):
        s["offset"] = i
    return {
        "n": n,
        "title": title,
        "author": author,
        "category": category,
        "pinned": pinned,
        "kst": kst,
        "created_at": kst - KST,
        "updated_at": (updated - KST) if updated else None,
        "blocks": blocks,
        "attachments": attachments,
        "spans": spans,
        "description": _sentence(rng, 4, 8) if kind == "json_api" and rng.random() < 0.5 else None,
    }


# --------------------------------------------------------------------------
# page renderers (deliberately independent of the engine's parsers: the
# generator writes markup, the engine must parse it; only URL canonicalization
# is shared, as a pure utility)

_NAV = '<nav class="gnb"><a href="/">HOME</a> <a href="/sitemap">사이트맵</a></nav>'
_FOOTER = '<footer><p>Soongsil Univ. synthetic fixture</p></footer>'

# Detail pages carry realistic boilerplate weight (real announcement pages
# are tens of KB of chrome around the content): JUNK_BLOCKS sidebar divs per
# detail page. Classes never collide with parser selectors.
JUNK_BLOCKS = 100


def _junk(rng: random.Random) -> str:
    items = "".join(
        f'<div class="sb-item"><a href="#sb{i}">{_esc(_sentence(rng, 2, 6))}</a>'
        f"<span>{rng.randint(1, 999)}</span></div>"
        for i in range(JUNK_BLOCKS)
    )
    return f'<aside class="sidebar">{items}</aside>'


def _wrap(title: str, inner: str, junk: str = "") -> str:
    return (
        f"<html><head><meta charset=\"utf-8\"><title>{_esc(title)}</title></head>"
        f"<body>{_NAV}\n{inner}\n{junk}{_FOOTER}</body></html>"
    )


def _block_html(rng: random.Random, blocks: list) -> list[str]:
    """-> canonical block html list (img srcs randomly relative; the
    canonical truth stays absolute in the span metadata)."""
    out = []
    for bk, payload in blocks:
        if bk == "image":
            # half the time render a relative src; canonical truth stays absolute
            src = payload
            if rng.random() < 0.5:
                src = "/" + payload.split("/", 3)[3]
            out.append(f'<img src="{src}">')
        else:
            tag = rng.choice(_BLOCK_TAGS)
            out.append(f"<{tag}>{_esc(payload)}</{tag}>")
    return out


def _detail_urls(board: dict, post: dict) -> tuple[str, str]:
    """-> (canonical detail url, href as rendered in the list page)."""
    kind, host, sch, bid = board["board_kind"], board["host"], board["scheme"], board["board_id"]
    pid = post["post_id"]
    if kind == "gnuboard":
        if post.get("private"):
            href = f"/private/board.php?bo_table={bid}&wr_id={pid}"
            return canonicalize(f"{sch}://{host}{href}"), href
        href = f"board.php?bo_table={bid}&wr_id={pid}"
        return canonicalize(f"{sch}://{host}/bbs/board.php?bo_table={bid}&wr_id={pid}"), href
    if kind in ("wordpress", "wordpress_card"):
        path = board.get("path_prefix", f"/{bid}")
        href = f"{path}/view?slug={pid}"
        return canonicalize(f"{sch}://{host}{href}"), href
    if kind == "ssucatch":
        href = f"/category/{bid}/post/{pid}"
        return canonicalize(f"{sch}://{host}{href}"), href
    if kind == "offset":
        href = f"view.do?idx={pid}"
        return canonicalize(f"{sch}://{host}/{bid}/view.do?idx={pid}"), href
    if kind == "euckr":
        href = f"view.php?num={pid}"
        return canonicalize(f"{sch}://{host}/{bid}/view.php?num={pid}"), href
    if kind == "lexical":
        u = canonicalize(f"{sch}://{host}/api/{bid}/doc/{pid}")
        return u, u
    # embedded kinds: the post URL is informational, never fetched
    u = canonicalize(f"{sch}://{host}/{bid}/p/{pid}")
    return u, u


def _list_url(board: dict, page_no: int, cursor=None) -> str:
    kind, host, sch, bid = board["board_kind"], board["host"], board["scheme"], board["board_id"]
    limit = board["posts_limit"]
    if kind == "gnuboard":
        return canonicalize(f"{sch}://{host}/bbs/board.php?bo_table={bid}&page={page_no}")
    if kind in ("wordpress", "wordpress_card"):
        path = board.get("path_prefix", f"/{bid}")
        return canonicalize(f"{sch}://{host}{path}/page/{page_no}")
    if kind == "ssucatch":
        return canonicalize(f"{sch}://{host}/category/{bid}?paged={page_no}")
    if kind == "offset":
        return canonicalize(f"{sch}://{host}/{bid}/list.do?offset={(page_no - 1) * board['page_size']}")
    if kind == "euckr":
        return canonicalize(f"{sch}://{host}/{bid}/list.php?page={page_no}")
    if kind == "json_api":
        return canonicalize(f"{sch}://{host}/api/{bid}/posts?size={limit}")
    if kind == "cursor":
        if cursor is None:
            return canonicalize(f"{sch}://{host}/api/{bid}/notices")
        return canonicalize(f"{sch}://{host}/api/{bid}/notices?LastNoticeIndex={cursor}")
    if kind == "lexical":
        return canonicalize(f"{sch}://{host}/api/{bid}/list?size={limit}")
    if kind == "study":
        return canonicalize(f"{sch}://{host}/api/{bid}/xhr/list?page={page_no}")
    if kind == "sso":
        token = board.get("token", "")
        return canonicalize(f"{sch}://{host}/api/{bid}/secure/posts?size={limit}&sToken={token}")
    raise ValueError(kind)


def _render_list_page(rng: random.Random, board: dict, page_url: str,
                      rows: list[dict], page_no: int = 1, total_pages: int = 1) -> bytes:
    kind = board["board_kind"]
    fmt = board["date_format"]
    if kind == "gnuboard":
        trs = ['<tr><th>분류</th><th>제목</th><th>글쓴이</th><th>날짜</th></tr>']
        for p in rows:
            cat = "공지" if p["pinned"] else (p["category"][0] if p["category"] else "")
            author = p["author"] or ""
            trs.append(
                f'<tr><td class="td_num2"><p>{_esc(cat)}</p></td>'
                f'<td class="td_subject"><div><a href="{p["href"]}">{_esc(p["title"])}</a></div></td>'
                f'<td class="td_name sv_use"><span>{_esc(author)}</span></td>'
                f'<td class="td_date">{p["list_date"]}</td></tr>'
            )
        inner = f'<div id="bo_list"><table><tbody>{"".join(trs)}</tbody></table></div>'
        return _wrap(board["board_id"], inner).encode("utf-8")
    if kind == "wordpress":
        trs = []
        for i, p in enumerate(rows):
            first = "공지" if p["pinned"] else str(1000 - i)
            trs.append(
                f'<tr><td class="num">{first}</td>'
                f'<td class="subject"><a href="{p["href"]}">{_esc(p["title"])}</a></td>'
                f'<td class="date">{p["list_date"]}</td></tr>'
            )
        inner = f'<table class="board_list"><tbody>{"".join(trs)}</tbody></table>'
        return _wrap(board["board_id"], inner).encode("utf-8")
    if kind == "wordpress_card":
        cards = []
        for p in rows:
            badge = '<span class="badge">공지</span>' if p["pinned"] else ""
            cards.append(
                f'<div class="card"><div class="board_tit">{badge}'
                f'<a href="{p["href"]}">{_esc(p["title"])}</a></div>'
                f'<div class="etc_info"><span class="date"><span class="date_val">{p["list_date"]}</span></span></div></div>'
            )
        inner = f'<div class="card_wrap">{"".join(cards)}</div>'
        return _wrap(board["board_id"], inner).encode("utf-8")
    if kind == "ssucatch":
        lis = [
            f'<li class="notice-item"><a href="{p["href"]}">'
            f'<span class="notice-title">{_esc(p["title"])}</span></a></li>'
            for p in rows
        ]
        inner = f'<div class="notice-lists"><ul>{"".join(lis)}</ul></div>'
        return _wrap(board["board_id"], inner).encode("utf-8")
    if kind == "offset":
        if not rows:
            trs = ['<tr><td colspan="4">게시물이 없습니다</td></tr>']
        else:
            trs = []
            for i, p in enumerate(rows):
                cls = ' class="notice"' if p["pinned"] else ""
                no = "공지" if p["pinned"] else str(500 - i)
                trs.append(
                    f'<tr{cls}><td class="no">{no}</td>'
                    f'<td class="subject"><a href="{p["href"]}">{_esc(p["title"])}</a></td>'
                    f'<td class="writer">{_esc(p["author"] or "")}</td>'
                    f'<td class="date">{p["list_date"]}</td></tr>'
                )
        inner = (f'<table class="board"><tbody>{"".join(trs)}</tbody></table>'
                 f'<div class="pageinfo">페이지정보 : {page_no} / {total_pages}</div>')
        return _wrap(board["board_id"], inner).encode("utf-8")
    if kind == "euckr":
        trs = [
            f'<tr><td class="subject"><a href="{p["href"]}">{_esc(p["title"])}</a></td>'
            f'<td class="date">{p["list_date"]}</td></tr>'
            for p in rows
        ]
        nxt = (f'<div class="paginate"><a class="next" href="list.php?page={page_no + 1}">다음</a></div>'
               if page_no < total_pages else '<div class="paginate"></div>')
        inner = f'<table class="board"><tbody>{"".join(trs)}</tbody></table>{nxt}'
        return _wrap(board["board_id"], inner).encode("euc-kr", errors="replace")
    raise ValueError(kind)


def _api_item(board: dict, p: dict) -> dict:
    fmt = board["date_format"]
    item = {
        "id": p["post_id"],
        "title": p["title"],
        "author": p["author"],
        "date": _fmt_date(p["kst"], fmt),
        "category": p["category"],
        "url": p["detail_url"],
        "content_html": p["content"],
        "attachments": [{"url": a["url"], "name": a["name"]} for a in p["attachments"]],
    }
    if p["updated_at"] is not None:
        item["updated"] = _fmt_date(p["updated_at"] + KST, fmt)
    if p["description"]:
        item["summary"] = p["description"]
    return item


def _render_detail_page(rng: random.Random, board: dict, p: dict) -> bytes:
    kind, fmt = board["board_kind"], board["date_format"]
    blocks_html = p["blocks_html"]
    body = "\n".join(blocks_html)
    if kind == "gnuboard":
        atts = "".join(
            f'<li><a href="{a["render_href"]}"><strong>{_esc(a["name"])}</strong></a></li>'
            for a in p["attachments"]
        )
        cat = p["category"][0] if p["category"] else ""
        inner = (
            f'<article><div id="bo_v_title"><span class="bo_v_cate">{_esc(cat)}</span> '
            f'<span class="bo_v_tit">{_esc(p["title"])}</span></div>'
            f'<div id="bo_v_info"><span class="sv_member">{_esc(p["author"] or "")}</span>'
            f'<span class="if_date">{_fmt_date(p["kst"], fmt)}</span></div>'
            f'<div id="bo_v_con">\n{body}\n</div>'
            f'<div id="bo_v_file"><ul>{atts}</ul></div></article>'
        )
        return _wrap(p["title"], inner, junk=_junk(rng)).encode("utf-8")
    if kind in ("wordpress", "wordpress_card"):
        inner = (
            f'<table class="t_view"><tbody><tr><td><p class="title">{_esc(p["title"])}</p></td></tr></tbody></table>'
            f'<ul class="date_w"><dd>{_fmt_date(p["kst"], fmt)}</dd><dd>조회 {rng.randint(10, 999)}</dd></ul>'
            f'<div class="td_box">\n{body}\n</div>'
        )
        return _wrap(p["title"], inner, junk=_junk(rng)).encode("utf-8")
    if kind == "ssucatch":
        labels = "".join(f'<span class="label">{_esc(c)}</span>' for c in p["category"])
        atts = "".join(
            f'<a download href="{a["url"]}">{_esc(a["name"])}</a>' for a in p["attachments"]
        )
        inner = (
            f'<div class="notice_wrap"><div class="label-group">{labels}</div>'
            f'<h2 class="notice_title">{_esc(p["title"])}</h2>'
            f'<div class="notice_date">{_fmt_date(p["kst"], fmt)}</div>'
            f'<div class="notice_content">\n{body}\n</div>'
            f'<div class="download-list">{atts}</div></div>'
        )
        return _wrap(p["title"], inner, junk=_junk(rng)).encode("utf-8")
    if kind == "offset":
        date_html = (
            f'<span class="date">{_fmt_date(p["kst"], fmt)}</span>' if p["detail_date"] else ""
        )
        atts = "".join(
            f'<li><a href="javascript:download(\'{a["dl_no"]}\',\'{a["name"]}\')">{_esc(a["name"])}</a></li>'
            for a in p["attachments"]
        )
        inner = (
            f'<div class="view_head"><h3>{_esc(p["title"])}</h3>'
            f'<span class="writer">{_esc(p["author"] or "")}</span>{date_html}</div>'
            f'<div class="view_body">\n{body}\n</div>'
            f'<ul class="file_list">{atts}</ul>'
        )
        return _wrap(p["title"], inner, junk=_junk(rng)).encode("utf-8")
    if kind == "euckr":
        meta_rows = "".join(
            f"<tr><th>{_esc(k)}</th><td>{_esc(v)}</td></tr>" for k, v in p["metadata"]
        )
        inner = (
            f'<div class="view_title">{_esc(p["title"])}</div>'
            f'<table class="info">{meta_rows}</table>'
            f'<div class="view_content">\n{body}\n</div>'
        )
        return _wrap(p["title"], inner, junk=_junk(rng)).encode("euc-kr", errors="replace")
    if kind == "lexical":
        return p["content"].encode("utf-8")
    raise ValueError(kind)


# --------------------------------------------------------------------------
# lexical content


def _lexicalize(rng: random.Random, p: dict) -> None:
    """Rebuild a post's content as a Lexical editor-state document; spans
    follow ssufid_ray.functions.lexical semantics (computed here from the
    node metadata, not by running the renderer)."""
    nodes: list[dict] = []
    spans: list[dict] = []

    def text_node_children(text: str) -> list[dict]:
        if len(text) > 10 and rng.random() < 0.5:
            k = text.index(" ", 5) if " " in text[5:] else len(text)
            return [{"type": "text", "text": text[:k]}, {"type": "text", "text": text[k:]}]
        return [{"type": "text", "text": text}]

    for bk, payload in p["blocks"]:
        if bk == "image":
            src = payload
            if rng.random() < 0.5:
                src = "/" + payload.split("/", 3)[3]
            nodes.append({"type": "image", "src": src, "altText": "", "width": 640,
                          "height": 0, "maxWidth": 800, "showCaption": False})
            spans.append({"kind": "image", "text": "", "media_ref": payload, "offset": -1})
        else:
            t = rng.choice(["paragraph", "paragraph", "heading"])
            node = {"type": t, "children": text_node_children(payload)}
            if t == "heading":
                node["tag"] = "h2"
            nodes.append(node)
            spans.append({"kind": "text", "text": payload, "media_ref": "", "offset": -1})
    r = rng.random()
    if r < 0.25:
        nodes.append({"type": "horizontalrule"})  # no span
    elif r < 0.5:
        items = [_sentence(rng, 2, 6) for _ in range(rng.randint(2, 3))]
        nodes.append({"type": "list", "listType": "bullet", "children": [
            {"type": "listitem", "children": [{"type": "text", "text": it}]} for it in items
        ]})
        for it in items:
            spans.append({"kind": "text", "text": it, "media_ref": "", "offset": -1})
    elif r < 0.65:
        rows = [[_sentence(rng, 1, 3), _sentence(rng, 1, 3)] for _ in range(2)]
        nodes.append({"type": "table", "children": [
            {"type": "tablerow", "children": [
                {"type": "tablecell", "children": [{"type": "text", "text": c}]} for c in row
            ]} for row in rows
        ]})
        for row in rows:
            spans.append({"kind": "text", "text": " | ".join(row), "media_ref": "", "offset": -1})
    for i, s in enumerate(spans):
        s["offset"] = i
    p["content"] = json.dumps({"root": {"type": "root", "children": nodes}}, ensure_ascii=False)
    p["spans"] = spans
    p["attachments"] = []  # thumbnail derived from spans in _doc_row


# --------------------------------------------------------------------------
# board post generation


_DETAIL_KINDS = {"gnuboard", "wordpress", "wordpress_card", "ssucatch", "offset",
                 "euckr", "lexical"}


def _gen_board_posts(rng: random.Random, board: dict, pool: dict) -> list[dict]:
    kind, fmt = board["board_kind"], board["date_format"]
    n_posts = board["n_posts"]
    cur_kst = datetime(2026, 6, 1, 10, 37) - timedelta(hours=rng.randint(0, 96))
    id_start = n_posts + rng.randint(10, 500)
    posts: list[dict] = []
    last_truth = None
    pinned_idx = set()
    if board["pinned_count"] and n_posts > board["page_size"]:
        pinned_idx = set(rng.sample(range(min(10, n_posts)), min(board["pinned_count"], 3)))
    for j in range(n_posts):
        detail_date = True
        if kind == "offset":
            detail_date = rng.random() < 0.7
        minute_res = fmt in _MINUTE_FORMATS and not (fmt == "dual_dash" and not detail_date)
        if minute_res:
            cur_kst = cur_kst - timedelta(minutes=rng.randint(45, 300))
            kst = _round_for_format(cur_kst, fmt)
        else:
            cur_kst = cur_kst - timedelta(days=rng.randint(1, 2))
            kst = cur_kst.replace(hour=0, minute=0, second=0, microsecond=0)
        while last_truth is not None and kst >= last_truth:
            cur_kst = cur_kst - timedelta(days=1)
            kst = kst - timedelta(days=1)
        last_truth = kst
        p = _gen_post(rng, board, j, kst, pool, pinned=(j in pinned_idx))
        p["detail_date"] = detail_date
        if kind in ("wordpress", "wordpress_card"):
            p["post_id"] = f"{board['board_id']}-{id_start - j}"
        else:
            p["post_id"] = str(id_start - j)
        if kind == "gnuboard":
            p["private"] = rng.random() < 0.08
        p["flaky"] = kind in _DETAIL_KINDS and rng.random() < 0.03
        p["permfail"] = kind in _DETAIL_KINDS and not p["flaky"] and rng.random() < 0.012
        if kind == "euckr":
            p["author"] = p["author"] or "관리자"
            p["metadata"] = [
                ("작성자", p["author"]),
                ("작성일", _fmt_date(kst, fmt)),
                ("조회수", str(rng.randint(1, 5000))),
            ]
        else:
            p["metadata"] = []
        blocks_html = _block_html(rng, p["blocks"])
        p["blocks_html"] = blocks_html
        p["content"] = "\n".join(blocks_html)
        for a in p["attachments"]:
            a["render_href"] = (
                "/" + a["url"].split("/", 3)[3] if rng.random() < 0.5 else a["url"]
            )
            a["dl_no"] = str(rng.randint(100, 9999))
        if kind == "offset":
            # js-download names must be ASCII (the href survives URL-encoding)
            for a in p["attachments"]:
                a["name"] = f"form_{rng.randint(1, 99)}.{a['url'].rsplit('.', 1)[1]}"
                a["mime_type"] = guess_mime(a["name"])
                a["url"] = canonicalize(
                    f"{board['scheme']}://{board['host']}/download.php?name={a['name']}&no={a['dl_no']}"
                )
            # rebuild attachment spans with the download.php urls
            spans = [s for s in p["spans"] if s["kind"] != "attachment"]
            for a in p["attachments"]:
                spans.append({"kind": "attachment", "text": "", "media_ref": a["url"], "offset": -1})
            for i, s in enumerate(spans):
                s["offset"] = i
            p["spans"] = spans
        p["detail_url"], p["href"] = _detail_urls(board, p)
        p["list_date"] = (
            p["kst"].strftime("%Y-%m-%d") if fmt == "dual_dash" else _fmt_date(p["kst"], fmt)
        )
        if kind == "lexical":
            _lexicalize(rng, p)
        posts.append(p)
    return posts


def _doc_row(board: dict, p: dict) -> dict:
    spans = [dict(s) for s in p["spans"]]
    return {
        "doc_id": f"{board['board_id']}/{p['post_id']}",
        "plugin_id": board["board_id"],
        "post_id": p["post_id"],
        "url": p["detail_url"],
        "author": p["author"],
        "title": p["title"],
        "description": p["description"],
        "category": p["category"],
        "created_at": p["created_at"],
        "updated_at": p["updated_at"],
        "thumbnail": next((s["media_ref"] for s in spans if s["kind"] == "image"), None),
        "content": p["content"],
        "attachments": [
            {"url": a["url"], "name": a["name"], "mime_type": a["mime_type"]}
            for a in p["attachments"]
        ],
        "metadata": list(p["metadata"]),
        "spans": spans,
    }


# --------------------------------------------------------------------------
# the crawl walk (oracle)


class _HostSim:
    def __init__(self, rng: random.Random, host: str, disallow: tuple[str, ...]):
        self.rng = rng
        self.host = host
        self.disallow = disallow
        self.seen: set[str] = set()
        self.seq = 0
        self.pages: dict[str, dict] = {}
        self.oracle: list[dict] = []
        self.docs: list[dict] = []

    def blocked(self, url: str) -> bool:
        from urllib.parse import urlsplit

        path = urlsplit(url).path
        return any(path.startswith(d) for d in self.disallow)

    def page(self, url: str, body: bytes, content_type: str, status=200, flaky=False):
        if url not in self.pages:
            self.pages[url] = {
                "url": url, "host": self.host, "status": status,
                "content_type": content_type, "body": body,
                "fetch_ms": self.rng.randint(5, 50), "flaky": flaky,
            }

    def record(self, url: str, seq: int, doc_id: str | None, outcome: str):
        self.oracle.append({"url": url, "host": self.host, "fetch_seq": seq,
                            "doc_id": doc_id, "outcome": outcome})

    def fetch_list(self, url: str, body: bytes, content_type: str):
        self.seen.add(url)
        self.record(url, self.seq, None, "fetched")
        self.seq += 1
        self.page(url, body, content_type)


def _simulate_board(sim: _HostSim, board: dict, posts: list[dict]) -> None:
    rng = sim.rng
    kind = board["board_kind"]
    limit = board["posts_limit"]
    ps = board["page_size"]
    pins = [p for p in posts if p["pinned"]]
    regs = [p for p in posts if not p["pinned"]]
    html_ct = "text/html; charset=utf-8"
    if kind == "euckr":
        html_ct = "text/html; charset=euc-kr"
    json_ct = "application/json"

    def page_rows(k: int) -> list[dict]:
        if (k - 1) * ps >= len(regs):
            return []
        return pins + regs[(k - 1) * ps : k * ps]

    collected: list[dict] = []

    if board.get("list_permfail"):
        # Board whose list walk fails permanently — the board-level-retry
        # fixture (core/mod.rs:38-93 run_with_retry): the engine must retry
        # the whole walk RETRY_COUNT times, keep ONE error_retry record
        # (attempts are deterministic replays), surface a crawl_failed
        # event, and contribute no documents.
        url = _list_url(board, 1)
        sim.seen.add(url)
        sim.record(url, sim.seq, None, "error_retry")
        sim.seq += 1
        sim.page(url, b"server error", html_ct, status=500)
        return

    if kind in ("gnuboard", "wordpress", "wordpress_card", "offset", "euckr"):
        page = 1
        distinct: set[str] = set()
        total_pages = max(1, -(-len(regs) // ps))  # S6/S7 bound for offset/euckr
        while True:
            url = _list_url(board, page)
            if sim.blocked(url):
                sim.seen.add(url)
                sim.record(url, -1, None, "robots_blocked")
                break
            rows = page_rows(page)
            sim.fetch_list(url, _render_list_page(rng, board, url, rows,
                                                  page_no=page,
                                                  total_pages=total_pages), html_ct)
            collected += rows
            distinct |= {p["detail_url"] for p in rows}
            if kind in ("offset", "euckr"):
                # pageinfo / next-button stop: the crawler never fetches an
                # empty trailing page (chemeng:341-372, ee:203-207)
                if page >= total_pages or len(distinct) >= limit or page >= PAGE_CAP:
                    break
            elif not rows or len(distinct) >= limit or page >= PAGE_CAP:
                break
            page += 1
    elif kind == "ssucatch":
        for page in range(1, limit // ps + 2):  # lib.rs:261-265 upfront pages
            url = _list_url(board, page)
            rows = page_rows(page)
            sim.fetch_list(url, _render_list_page(rng, board, url, rows), html_ct)
            collected += rows
    elif kind == "json_api":
        url = _list_url(board, 1)
        items = posts[: limit]
        body = json.dumps({"items": [_api_item(board, p) for p in items]},
                          ensure_ascii=False).encode("utf-8")
        sim.fetch_list(url, body, json_ct)
        for p in items:
            sim.docs.append(_doc_row(board, p))
        return
    elif kind == "cursor":
        cursor = None
        taken = 0
        while True:
            url = _list_url(board, 1, cursor=cursor)
            items = posts[taken : taken + ps]
            has_next = taken + len(items) < len(posts)
            body = json.dumps(
                {"items": [_api_item(board, p) for p in items], "hasNext": has_next},
                ensure_ascii=False,
            ).encode("utf-8")
            sim.fetch_list(url, body, json_ct)
            for p in items[: max(0, limit - taken)]:
                sim.docs.append(_doc_row(board, p))
            taken += len(items)
            cursor = items[-1]["post_id"] if items else None
            if not has_next or taken >= limit or not items:
                break
        return
    elif kind == "lexical":
        url = _list_url(board, 1)
        items = posts[: limit]
        meta_items = [
            {"id": p["post_id"], "title": p["title"], "author": p["author"],
             "date": _fmt_date(p["kst"], board["date_format"])}
            for p in items
        ]
        sim.fetch_list(url, json.dumps({"items": meta_items}, ensure_ascii=False).encode("utf-8"), json_ct)
        collected = items
    elif kind == "study":
        from ssufid_ray.functions.codec import encode_payload

        shell_url = canonicalize(f"{board['scheme']}://{board['host']}/api/{board['board_id']}/xhr")
        # lz-string-UTF16 output contains '<'/'&' — must be entity-escaped
        # inside the textarea (html.parser has no RCDATA mode for textarea)
        shell = _wrap(board["board_id"],
                      f'<div class="app"><textarea id="model">'
                      f'{_esc(encode_payload({"pageSize": ps}).decode("utf-8"))}'
                      f'</textarea></div>')
        sim.fetch_list(shell_url, shell.encode("utf-8"), html_ct)
        page, taken = 1, 0
        while True:
            url = _list_url(board, page)
            items = posts[taken : taken + ps]
            has_next = taken + len(items) < len(posts)
            body = encode_payload({"items": [_api_item(board, p) for p in items],
                                   "hasNext": has_next})
            sim.fetch_list(url, body, "application/octet-stream")
            for p in items[: max(0, limit - taken)]:
                sim.docs.append(_doc_row(board, p))
            taken += len(items)
            page += 1
            if not has_next or taken >= limit or not items:
                break
        return
    elif kind == "sso":
        # full SSO chain (sso.rs:26-92): login form (hidden fields) ->
        # submit (sToken cookie + redirect) -> landing (session token) ->
        # authenticated list. The list URL embeds the FINAL token only.
        api = f"{board['scheme']}://{board['host']}/api/{board['board_id']}"
        ff = board["form_fields"]
        login_url = canonicalize(f"{api}/sso/login")
        login = _wrap(board["board_id"],
                      '<form class="sso" method="post">'
                      f'<input type="hidden" name="in_tp_bit" value="{ff["in_tp_bit"]}">'
                      f'<input type="hidden" name="rqst_caus_cd" value="{ff["rqst_caus_cd"]}">'
                      '</form>')
        sim.fetch_list(login_url, login.encode("utf-8"), html_ct)
        submit_url = canonicalize(
            f"{api}/sso/submit?in_tp_bit={ff['in_tp_bit']}&rqst_caus_cd={ff['rqst_caus_cd']}")
        landing_url = canonicalize(f"{api}/sso/landing?sToken={board['mid_token']}")
        submit = (f'<script>document.cookie="sToken={board["mid_token"]}";'
                  f'location.href="{landing_url}"</script>')
        sim.fetch_list(submit_url, submit.encode("utf-8"), html_ct)
        landing = _wrap(board["board_id"],
                        f'<div class="session"><textarea id="sToken">'
                        f'{board["token"]}</textarea></div>')
        sim.fetch_list(landing_url, landing.encode("utf-8"), html_ct)
        url = _list_url(board, 1)
        items = posts[: limit]
        body = json.dumps({"items": [_api_item(board, p) for p in items]},
                          ensure_ascii=False).encode("utf-8")
        sim.fetch_list(url, body, json_ct)
        for p in items:
            sim.docs.append(_doc_row(board, p))
        return
    else:
        raise ValueError(kind)

    # ---- detail issue loop (shared spec; engine must reproduce exactly)
    slots = 0
    for p in collected:
        url = p["detail_url"]
        if url in sim.seen:
            sim.record(url, -1, None, "dup_skipped")
            continue
        sim.seen.add(url)
        if slots >= limit:
            continue
        doc_id = f"{board['board_id']}/{p['post_id']}"
        if sim.blocked(url):
            sim.record(url, -1, None, "robots_blocked")
            slots += 1
            continue
        ct = "application/json" if kind == "lexical" else (
            "text/html; charset=euc-kr" if kind == "euckr" else "text/html; charset=utf-8")
        if p["permfail"]:
            sim.record(url, sim.seq, None, "error_retry")
            sim.seq += 1
            sim.page(url, b"server error", "text/html", status=500)
            slots += 1
            continue
        sim.record(url, sim.seq, doc_id, "fetched")
        sim.seq += 1
        sim.page(url, _render_detail_page(rng, board, p), ct, flaky=p["flaky"])
        sim.docs.append(_doc_row(board, p))
        slots += 1


# --------------------------------------------------------------------------
# calendar fixture (separate pipeline; SURVEY §3.2)

CAL_HOST = "calendar.ssu.ac.kr"
CAL_PLUGIN = "ssu-calendar"
CAL_YEARS = (2025, 2026)

_WEEKDAYS = "월화수목금토일"
_SEPS = ("~", "–", "—", "－", "〜")


def _gen_calendar(rng: random.Random) -> tuple[dict[str, dict], list[dict], list[dict]]:
    """-> (pages, oracle_rows, truth_events)."""
    from ssufid_ray.functions.dates import event_id

    pages: dict[str, dict] = {}
    oracle: list[dict] = []
    truth: dict[str, dict] = {}
    seq = 0
    for year in CAL_YEARS:
        rows_html = []
        events = []
        for _ in range(14):
            sm, sd = rng.randint(1, 12), rng.randint(1, 27)
            start = datetime(year, sm, sd)
            dur = rng.choice([0, 0, rng.randint(1, 20)])
            end = start + timedelta(days=dur)
            events.append((start, end))
        # cross-year event on the earlier page (lib.rs:468-475)
        if year == CAL_YEARS[0]:
            events.append((datetime(year, 12, 28), datetime(year + 1, 1, 3)))
        for start, end in events:
            title = _sentence(rng, 2, 5).rstrip(".")
            sep = rng.choice(_SEPS)
            wd = lambda d: _WEEKDAYS[d.weekday()]
            stok = f"{start.month}.{start.day}"
            if rng.random() < 0.7:
                stok += f"({wd(start)})"
            if end == start:
                raw = stok
            else:
                if end.month == start.month and end.year == start.year and rng.random() < 0.4:
                    etok = f"{end.day}"
                else:
                    etok = f"{end.month:02d}.{end.day:02d}"
                    if rng.random() < 0.5:
                        etok += f"({wd(end)})"
                raw = f"{stok} {sep} {etok}"
            repeat = 2 if rng.random() < 0.15 else 1  # in-page dup -> id dedup
            for _ in range(repeat):
                rows_html.append(
                    f'<tr><td class="date">{raw}</td><td class="title">{_esc(title)}</td></tr>'
                )
            starts_at = start - KST
            ends_at = end.replace(hour=23, minute=59, second=59) - KST
            eid = event_id(CAL_PLUGIN, starts_at, ends_at, title)
            truth.setdefault(eid, {
                "id": eid, "title": title, "description": None,
                "starts_at": starts_at, "ends_at": ends_at,
                "location": None, "url": None, "plugin_id": CAL_PLUGIN,
            })
        url = canonicalize(f"https://{CAL_HOST}/calendar?years={year}")
        body = _wrap(
            f"calendar {year}",
            f'<table class="calendar"><tbody>{"".join(rows_html)}</tbody></table>',
        ).encode("utf-8")
        pages[url] = {"url": url, "host": CAL_HOST, "status": 200,
                      "content_type": "text/html; charset=utf-8", "body": body,
                      "fetch_ms": rng.randint(5, 50), "flaky": False}
        oracle.append({"url": url, "host": CAL_HOST, "fetch_seq": seq,
                       "doc_id": None, "outcome": "fetched"})
        seq += 1
    return pages, oracle, list(truth.values())


# --------------------------------------------------------------------------
# incremental-merge fixture (J1 semantics, core/mod.rs:336-385)

MERGE_NOW = datetime(2026, 6, 2, 3, 0, 0)  # injectable clock; UTC


def _build_merge_fixture(rng: random.Random, crawled: list[dict],
                         uncrawled: list[dict]) -> tuple[list, list, list]:
    cache, expect, final = [], [], []
    for doc in crawled:
        r = rng.random()
        if r < 0.28:  # unchanged -> skip, old row kept
            cache.append(dict(doc))
            expect.append({"doc_id": doc["doc_id"], "outcome": "skipped"})
            final.append(dict(doc))
        elif r < 0.34:  # trim-variant -> contents_eq true -> skip (post.rs:50-55)
            old = dict(doc)
            old["title"] = doc["title"] + "  "
            old["content"] = "\n" + doc["content"] + " "
            cache.append(old)
            expect.append({"doc_id": doc["doc_id"], "outcome": "skipped"})
            final.append(old)
        elif r < 0.46:  # content changed -> update, created_at preserved
            old = dict(doc)
            old["content"] = doc["content"] + "\n<p>outdated line</p>"
            old["created_at"] = doc["created_at"] - timedelta(hours=1)
            old["updated_at"] = None
            cache.append(old)
            expect.append({"doc_id": doc["doc_id"], "outcome": "updated"})
            new = dict(doc)
            if doc["updated_at"] is None:
                # mod.rs:371-382: only without a crawler-supplied updated_at
                # does the old created_at survive (with a `now` stamp); else
                # the new post is inserted wholesale.
                new["created_at"] = old["created_at"]
                new["updated_at"] = MERGE_NOW
            final.append(new)
        else:  # absent from cache -> created
            expect.append({"doc_id": doc["doc_id"], "outcome": "created"})
            final.append(dict(doc))
    for doc in uncrawled[:: max(1, len(uncrawled) // 40 or 1)]:
        cache.append(dict(doc))
        expect.append({"doc_id": doc["doc_id"], "outcome": "preserved"})
        final.append(dict(doc))
    return cache, expect, final


# --------------------------------------------------------------------------
# top level

CORPUS_VERSION = 13


def generate_corpus(out_dir: str, scale: float = 1.0, seed: int = 42,
                    force: bool = False) -> dict:
    out = Path(out_dir)
    meta = storage.read_manifest(str(out / "meta.json"))
    if (
        meta is not None and not force
        and meta.get("scale") == scale and meta.get("seed") == seed
        and meta.get("version") == CORPUS_VERSION
    ):
        return meta

    rng = random.Random(seed)
    boards = _board_layout(rng)
    posts_limit = max(8, int(round(100 * scale)))
    for b in boards:
        b["posts_limit"] = posts_limit
        b["n_posts"] = int(round(posts_limit * b["size_factor"]))
    # edge boards: one empty, one fully robots-blocked
    zero = next(b for b in boards if b["board_kind"] == "offset" and b["host"] != boards[0]["host"])
    zero["n_posts"] = 0
    blocked = next(b for b in boards if b["board_kind"] == "wordpress" and b["host"] != boards[0]["host"])
    blocked["path_prefix"] = f"/private/{blocked['board_id']}"
    blocked["base_url"] = canonicalize(
        f"{blocked['scheme']}://{blocked['host']}/private/{blocked['board_id']}")
    # board-level-retry fixture: a gnuboard whose list page 1 always 500s
    listfail = next(b for b in boards if b["board_kind"] == "gnuboard"
                    and b["host"] != boards[0]["host"])
    listfail["list_permfail"] = True

    import hashlib as _hl

    pools: dict[str, dict] = {}
    for b in boards:
        if b["board_kind"] == "sso":
            b["token"] = "tok" + _hl.blake2b(b["board_id"].encode(), digest_size=6).hexdigest()
            # intermediate sToken cookie value — deliberately different from
            # the session token so skipping the redirect hop fails auth
            b["mid_token"] = "mid" + _hl.blake2b(
                (b["board_id"] + "/mid").encode(), digest_size=6).hexdigest()
            b["form_fields"] = {
                "in_tp_bit": _hl.blake2b((b["board_id"] + "/tp").encode(),
                                         digest_size=3).hexdigest(),
                "rqst_caus_cd": "03",
            }
        if b["host"] not in pools:
            pools[b["host"]] = _make_media_pool(rng, b["scheme"], b["host"])
        b["posts"] = _gen_board_posts(rng, b, pools[b["host"]])
        b["priority_date"] = max(
            (p["created_at"] for p in b["posts"]), default=datetime(1970, 1, 1))

    hosts: list[str] = []
    for b in boards:
        if b["host"] not in hosts:
            hosts.append(b["host"])

    all_pages: list[dict] = []
    all_oracle: list[dict] = []
    all_docs: list[dict] = []
    all_seen: list[dict] = []
    for host in hosts:
        host_boards = [b for b in boards if b["host"] == host]
        sch = host_boards[0]["scheme"]
        sim = _HostSim(rng, host, ("/private/",))
        robots_url = canonicalize(f"{sch}://{host}/robots.txt")
        robots_body = b"User-agent: *\nDisallow: /private/\n"
        if rng.random() < 0.25:  # some hosts advertise a Crawl-delay
            robots_body += f"Crawl-delay: {rng.choice([1, 2])}\n".encode()
        sim.fetch_list(robots_url, robots_body, "text/plain")
        ordered = sorted(host_boards, key=lambda b: b["board_id"])
        ordered = sorted(ordered, key=lambda b: b["priority_date"], reverse=True)
        for b in ordered:
            _simulate_board(sim, b, b["posts"])
        all_pages.extend(sim.pages.values())
        all_oracle.extend(sim.oracle)
        all_docs.extend(sim.docs)
        all_seen.extend({"url": u, "host": host} for u in sorted(sim.seen))

    cal_pages, cal_oracle, cal_truth = _gen_calendar(rng)
    all_pages.extend(cal_pages.values())
    all_oracle.extend(cal_oracle)

    crawled_ids = {d["doc_id"] for d in all_docs}
    uncrawled = []
    for b in boards:
        for p in b["posts"]:
            if f"{b['board_id']}/{p['post_id']}" not in crawled_ids:
                uncrawled.append(_doc_row(b, p))
    cache, expect, final = _build_merge_fixture(rng, all_docs, uncrawled)

    # ---- write everything
    out.mkdir(parents=True, exist_ok=True)
    seeds_rows = [
        {k: b[k] for k in ("board_id", "host", "base_url", "board_kind", "date_format",
                           "id_param", "page_size", "posts_limit", "politeness_ms",
                           "priority_date")}
        for b in boards
    ]
    storage.write_table(pa.Table.from_pylist(seeds_rows, schema=SEED_SCHEMA),
                        str(out / "seeds.parquet"))
    (out / "pages").mkdir(exist_ok=True)
    by_host: dict[str, list[dict]] = {}
    for p in all_pages:
        by_host.setdefault(p["host"], []).append(p)
    for host, rows in by_host.items():
        storage.write_table(pa.Table.from_pylist(rows, schema=PAGE_STORE_SCHEMA),
                            str(out / "pages" / f"{host}.parquet"))
    storage.write_table(pa.Table.from_pylist(all_oracle, schema=CRAWL_ORACLE_SCHEMA),
                        str(out / "oracle.parquet"))
    storage.write_table(pa.Table.from_pylist(all_docs, schema=POSTS_SCHEMA),
                        str(out / "truth_posts.parquet"))
    docs_slim = [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in all_docs]
    from ssufid_ray.schema import DOCUMENTS_SCHEMA

    storage.write_table(pa.Table.from_pylist(docs_slim, schema=DOCUMENTS_SCHEMA),
                        str(out / "truth_documents.parquet"))
    storage.write_table(pa.Table.from_pylist(cache, schema=POSTS_SCHEMA),
                        str(out / "cache_prev.parquet"))
    storage.write_table(pa.Table.from_pylist(final, schema=POSTS_SCHEMA),
                        str(out / "merge_final.parquet"))
    storage.write_table(
        pa.Table.from_pylist(
            expect,
            schema=pa.schema([("doc_id", pa.string()), ("outcome", pa.string())]),
        ),
        str(out / "merge_expect.parquet"),
    )
    storage.write_table(pa.Table.from_pylist(cal_truth, schema=CALENDAR_SCHEMA),
                        str(out / "truth_calendar.parquet"))
    storage.write_table(
        pa.Table.from_pylist(
            all_seen, schema=pa.schema([("url", pa.string()), ("host", pa.string())])
        ),
        str(out / "seen_truth.parquet"),
    )

    fetched = sum(1 for r in all_oracle if r["outcome"] in ("fetched", "error_retry"))
    meta = {
        "version": CORPUS_VERSION,
        "scale": scale,
        "seed": seed,
        "posts_limit": posts_limit,
        "n_boards": len(boards),
        "n_hosts": len(hosts) + 1,
        "n_pages": len(all_pages),
        "n_docs": len(all_docs),
        "n_oracle_rows": len(all_oracle),
        "n_fetches": fetched,
        "merge_now": MERGE_NOW.isoformat(),
        "disallow": ["/private/"],
        "cal_years": list(CAL_YEARS),
        "retry_count": RETRY_COUNT,
        "failed_boards": [b["board_id"] for b in boards
                          if b.get("list_permfail")],
    }
    storage.write_manifest(str(out / "meta.json"), meta)
    return meta


def default_corpus_dir(scale: float, seed: int = 42) -> str:
    return f"/tmp/ssufid_corpus/s{scale}_r{seed}_v{CORPUS_VERSION}"


def ensure_corpus(scale: float = 1.0, seed: int = 42) -> tuple[str, dict]:
    d = default_corpus_dir(scale, seed)
    return d, generate_corpus(d, scale=scale, seed=seed)
