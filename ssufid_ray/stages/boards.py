"""Board strategies: the plugin-per-board surface (SURVEY §2.11).

The reference registers ~56 Rust plugins built from a handful of protocol
families (gnuboard_plugin!/wordpress_plugin! macros + custom boards,
/root/reference/packages/cli/src/macros.rs:1-119,
plugins/common/src/lib.rs:4-116). Here a *board* is one row of the seed
table (`BoardSpec`) and a *strategy* is the protocol family implementation:
list-URL templating + pagination control, list-row metadata resolution,
detail-page parsing into (post fields, ordered spans).

Strategies are pure w.r.t. inputs (bytes in, records out) and are compiled
once per parser actor (selector cache in ssufid_ray.functions.html). Each
strategy documents the reference plugin(s) it covers.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime

from ssufid_ray.functions.dates import parse_board_date
from ssufid_ray.functions.html import Element, normalize_text, parse_html
from ssufid_ray.functions.lexical import lexical_to_spans
from ssufid_ray.functions.spans import (
    append_attachment_spans,
    content_html_of,
    first_image,
    spans_from_container,
)
from ssufid_ray.functions.textnorm import guess_mime
from ssufid_ray.urlnorm import canonicalize, join, query_param


@dataclass
class BoardSpec:
    board_id: str
    host: str
    base_url: str
    board_kind: str
    date_format: str
    id_param: str
    page_size: int
    posts_limit: int
    politeness_ms: int
    priority_date: datetime

    @classmethod
    def from_row(cls, row: dict) -> "BoardSpec":
        return cls(**{k: row[k] for k in cls.__dataclass_fields__})


@dataclass
class RowMeta:
    post_id: str
    url: str  # canonical detail URL ('' for embedded kinds)
    title: str = ""
    author: str | None = None
    category: list[str] = field(default_factory=list)
    pinned: bool = False
    date_str: str = ""


@dataclass
class ListParse:
    rows: list[RowMeta] = field(default_factory=list)
    has_more: bool = True  # protocol-level "a next page may exist"
    embedded: list[dict] | None = None  # full post records for API kinds


PAGE_CAP = 50  # reference safety bounds: 50 (biz:393-398, me:294-297), 200 (chemeng:428)


def make_post(
    spec: BoardSpec,
    post_id: str,
    url: str,
    title: str,
    created_at: datetime,
    spans: list[dict],
    *,
    author: str | None = None,
    description: str | None = None,
    category: list[str] | None = None,
    updated_at: datetime | None = None,
    content: str = "",
    attachments: list[dict] | None = None,
    metadata: list[tuple[str, str]] | None = None,
) -> dict:
    attachments = attachments or []
    spans = append_attachment_spans(list(spans), attachments)
    return {
        "doc_id": f"{spec.board_id}/{post_id}",
        "plugin_id": spec.board_id,
        "post_id": post_id,
        "url": url,
        "author": author,
        "title": title,
        "description": description,
        "category": category or [],
        "created_at": created_at,
        "updated_at": updated_at,
        "thumbnail": first_image(spans),
        "content": content,
        "attachments": attachments,
        "metadata": metadata or [],
        "spans": spans,
    }


def _attachment(url: str, name: str | None) -> dict:
    """Attachment::from_guess (post.rs:13-21): mime inferred from name/url."""
    return {"url": url, "name": name, "mime_type": guess_mime(name or url)}


# =========================================================== gnuboard (S1/M1/M3)


class GnuboardStrategy:
    """Gnuboard boards (gnuboard/mod.rs:84-232): ?page=N list loop,
    #bo_list table rows, #bo_v_* detail page, 2-digit-year dates."""

    kind = "gnuboard"
    protocol = "paged"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        sep = "&" if "?" in spec.base_url else "?"
        return canonicalize(f"{spec.base_url}{sep}page={page_no}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("utf-8"))
        rows: list[RowMeta] = []
        for tr in doc.select("#bo_list table > tbody > tr"):
            if tr.select_one("th") is not None:  # header row (F2)
                continue
            a = tr.select_one("td.td_subject > div > a")
            if a is None:
                continue
            href = a.get("href")
            url = join(page_url, href)
            post_id = query_param(url, spec.id_param)
            if not post_id:  # id must be non-empty (metadata.rs:24-71)
                continue
            cat_el = tr.select_one("td.td_num2 > p")
            cat = normalize_text(cat_el.text()) if cat_el else ""
            author_el = tr.select_one("td.td_name.sv_use > span")
            rows.append(
                RowMeta(
                    post_id=post_id,
                    url=url,
                    title=normalize_text(a.text()),
                    author=(normalize_text(author_el.text()) or None) if author_el else None,
                    category=[cat] if cat else [],
                    pinned=(cat == "공지"),
                )
            )
        return ListParse(rows=rows, has_more=bool(rows))

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        doc = parse_html(body.decode("utf-8"))
        title_el = doc.select_one("#bo_v_title > span.bo_v_tit")
        date_el = doc.select_one("#bo_v_info .if_date")
        con = doc.select_one("#bo_v_con")
        if title_el is None or date_el is None or con is None:
            raise ValueError(f"malformed gnuboard detail page: {url}")
        created = parse_board_date(normalize_text(date_el.text()), spec.date_format)
        attachments = []
        for a in doc.select("#bo_v_file > ul > li > a"):
            name_el = a.select_one("strong")
            attachments.append(
                _attachment(join(url, a.get("href")),
                            normalize_text(name_el.text()) if name_el else None)
            )
        spans = spans_from_container(con, url)
        return make_post(
            spec, meta.post_id, url,
            title=normalize_text(title_el.text()),
            created_at=created,
            spans=spans,
            author=meta.author,
            category=meta.category,
            content=content_html_of(con),
            attachments=attachments,
        )


# ========================================================== wordpress (S2/M2/M4)


class WordpressStrategy:
    """WordPress boards (wordpress/mod.rs:86-228): /page/N list loop with
    pinned ('공지') over-fetch, table rows, detail t_view page."""

    kind = "wordpress"
    protocol = "paged"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/page/{page_no}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("utf-8"))
        rows: list[RowMeta] = []
        for tr in doc.select("table.board_list > tbody > tr"):
            tds = tr.element_children()
            if not tds or tds[0].tag == "th" or len(tds) < 3:  # F2 skip
                continue
            first_text = normalize_text(tds[0].text())
            pinned = "공지" in first_text  # wordpress/metadata.rs:44-47
            a = tr.select_one("a")
            if a is None:
                continue
            url = join(page_url, a.get("href"))
            post_id = query_param(url, spec.id_param)
            if not post_id:
                continue
            rows.append(
                RowMeta(post_id=post_id, url=url, title=normalize_text(a.text()),
                        pinned=pinned, category=["공지"] if pinned else [])
            )
        # NO_ENTRY sentinel: an empty page ends pagination (mod.rs:100-107)
        return ListParse(rows=rows, has_more=bool(rows))

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        doc = parse_html(body.decode("utf-8"))
        title_el = doc.select_one("table.t_view p.title")
        date_el = doc.select_one("ul.date_w dd")
        con = doc.select_one("div.td_box")
        if title_el is None or date_el is None or con is None:
            raise ValueError(f"malformed wordpress detail page: {url}")
        created = parse_board_date(normalize_text(date_el.text()), spec.date_format)
        spans = spans_from_container(con, url)
        return make_post(
            spec, meta.post_id, url,
            title=normalize_text(title_el.text()),
            created_at=created,
            spans=spans,
            category=["공지"] if meta.pinned else [],  # mod.rs:222-224
            content=content_html_of(con),
        )


class WordpressCardStrategy(WordpressStrategy):
    """Card-DOM WordPress variant (mgmt.rs:41-107): div.card_wrap cards,
    href on the <a> itself, date under .etc_info."""

    kind = "wordpress_card"
    protocol = "paged"

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("utf-8"))
        rows: list[RowMeta] = []
        for card in doc.select("div.card_wrap > div.card"):
            a = card.select_one(".board_tit a")
            if a is None:
                continue
            url = join(page_url, a.get("href"))
            post_id = query_param(url, spec.id_param)
            if not post_id:
                continue
            badge = card.select_one(".badge")
            pinned = badge is not None and "공지" in normalize_text(badge.text())
            rows.append(
                RowMeta(post_id=post_id, url=url, title=normalize_text(a.text()),
                        pinned=pinned, category=["공지"] if pinned else [])
            )
        return ListParse(rows=rows, has_more=bool(rows))


# ============================================================ ssucatch (S4/M5)


class SsucatchStrategy:
    """SSU:Catch (plugins/ssucatch/src/lib.rs:146-295): pages computed
    upfront (limit/page_size + 1), span.label categories, Korean long dates,
    [download] attachments."""

    kind = "ssucatch"
    protocol = "upfront"

    @property
    def upfront_pages(self):  # computed per spec by the scout
        return True

    def num_pages(self, spec: BoardSpec) -> int:
        return spec.posts_limit // spec.page_size + 1  # lib.rs:261-265

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}?paged={page_no}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("utf-8"))
        rows: list[RowMeta] = []
        for li in doc.select("div.notice-lists li.notice-item"):
            a = li.select_one("a")
            if a is None:  # F2
                continue
            url = join(page_url, a.get("href"))
            post_id = url.rstrip("/").rsplit("/", 1)[-1]
            rows.append(RowMeta(post_id=post_id, url=url,
                                title=normalize_text(a.text())))
        return ListParse(rows=rows, has_more=bool(rows))

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        doc = parse_html(body.decode("utf-8"))
        title_el = doc.select_one("h2.notice_title")
        date_el = doc.select_one("div.notice_date")
        con = doc.select_one("div.notice_content")
        if title_el is None or date_el is None or con is None:
            raise ValueError(f"malformed ssucatch detail page: {url}")
        categories = [normalize_text(s.text()) for s in doc.select("span.label")]
        created = parse_board_date(normalize_text(date_el.text()), spec.date_format)
        attachments = [
            _attachment(join(url, a.get("href")), normalize_text(a.text()) or None)
            for a in doc.select("div.download-list a[download]")
        ]
        spans = spans_from_container(con, url)
        return make_post(
            spec, meta.post_id, url,
            title=normalize_text(title_el.text()),
            created_at=created,
            spans=spans,
            category=[c for c in categories if c],
            content=content_html_of(con),
            attachments=attachments,
        )


# ====================================================== offset boards (S5/M6)

_JS_DOWNLOAD = re.compile(r"javascript:download\('([^']*)'\s*,\s*'([^']*)'\)")
_PAGEINFO = re.compile(r"페이지정보\s*:\s*(\d+)\s*/\s*(\d+)")


class OffsetStrategy:
    """Offset-paged boards (chemeng:109-120, ee:178-182, inso:82-87):
    offset=(page-1)*PAGE_SIZE lists; total-pages discovery from the
    '페이지정보 : X / Y' free text bounds the loop (S6, chemeng:341-372);
    javascript:download(no,name) attachment hrefs resolved to download.php
    URLs (ee:221-324)."""

    kind = "offset"
    protocol = "paged"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        offset = (page_no - 1) * spec.page_size
        return canonicalize(f"{spec.base_url.rstrip('/')}/list.do?offset={offset}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("utf-8"))
        rows: list[RowMeta] = []
        for tr in doc.select("table.board tbody > tr"):
            tds = tr.element_children()
            if len(tds) < 4:  # 1-cell empty sentinel row (soar.rs:48-50) / header
                continue
            a = tr.select_one("td.subject a")
            if a is None or a.get("href").startswith("javascript:void"):
                continue
            url = join(page_url, a.get("href"))
            post_id = query_param(url, spec.id_param)
            if not post_id:
                continue
            notice = "notice" in (tr.get("class") or "")
            rows.append(
                RowMeta(post_id=post_id, url=url, title=normalize_text(a.text()),
                        pinned=notice, category=["공지"] if notice else [],
                        date_str=normalize_text(tds[-1].text()))
            )
        # S6: "페이지정보 : cur / total" bounds the pagination loop
        m = _PAGEINFO.search(body.decode("utf-8"))
        if m:
            has_more = int(m.group(1)) < int(m.group(2))
        else:
            has_more = bool(rows)  # fallback bound (chemeng:418-436)
        return ListParse(rows=rows, has_more=has_more)

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        doc = parse_html(body.decode("utf-8"))
        title_el = doc.select_one("div.view_head h3")
        date_el = doc.select_one("div.view_head span.date")
        writer_el = doc.select_one("div.view_head span.writer")
        con = doc.select_one("div.view_body")
        if title_el is None or con is None:
            raise ValueError(f"malformed offset detail page: {url}")
        # fallback to list-row date when detail omits it (chemeng:271-317 J3)
        date_str = normalize_text(date_el.text()) if date_el else meta.date_str
        created = parse_board_date(date_str, spec.date_format)
        attachments = []
        for a in doc.select("ul.file_list a"):
            m = _JS_DOWNLOAD.match(a.get("href", ""))
            if m:  # ee:221-324 javascript:download(no, name) -> download.php
                no, name = m.group(1), m.group(2)
                dl = join(url, f"/download.php?name={name}&no={no}")
                attachments.append(_attachment(dl, name))
            else:
                attachments.append(_attachment(join(url, a.get("href")),
                                               normalize_text(a.text()) or None))
        spans = spans_from_container(con, url)
        return make_post(
            spec, meta.post_id, url,
            title=normalize_text(title_el.text()),
            created_at=created,
            spans=spans,
            author=(normalize_text(writer_el.text()) or None) if writer_el else None,
            category=meta.category,
            content=content_html_of(con),
            attachments=attachments,
        )


# ======================================================== EUC-KR board (S12)


class EuckrStrategy:
    """EUC-KR-encoded board (ssudorm, plugins/ssudorm/src/lib.rs:101-117):
    bytes decoded euc-kr before parsing; 'key : value' metadata cells
    (lib.rs:230-288)."""

    kind = "euckr"
    protocol = "paged"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/list.php?page={page_no}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        doc = parse_html(body.decode("euc-kr", errors="replace"))
        rows: list[RowMeta] = []
        for tr in doc.select("table.board tbody > tr"):
            a = tr.select_one("td.subject a") or tr.select_one("a")
            if a is None:
                continue
            url = join(page_url, a.get("href"))
            post_id = query_param(url, spec.id_param)
            if not post_id:
                continue
            rows.append(RowMeta(post_id=post_id, url=url, title=normalize_text(a.text())))
        # S7: stop when the next button is missing (ee:53-54,203-207)
        has_more = doc.select_one("div.paginate a.next") is not None
        return ListParse(rows=rows, has_more=has_more)

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        doc = parse_html(body.decode("euc-kr", errors="replace"))
        title_el = doc.select_one("div.view_title")
        con = doc.select_one("div.view_content")
        if title_el is None or con is None:
            raise ValueError(f"malformed euckr detail page: {url}")
        metadata: list[tuple[str, str]] = []
        author = None
        created = None
        for tr in doc.select("table.info tr"):
            th, td = tr.select_one("th"), tr.select_one("td")
            if th is None or td is None:
                continue
            k, v = normalize_text(th.text()), normalize_text(td.text())
            metadata.append((k, v))
            if k == "작성자":
                author = v
            elif k == "작성일":
                created = parse_board_date(v, spec.date_format)
        if created is None:
            raise ValueError(f"missing 작성일 in euckr detail page: {url}")
        spans = spans_from_container(con, url)
        return make_post(
            spec, meta.post_id, url,
            title=normalize_text(title_el.text()),
            created_at=created,
            spans=spans,
            author=author,
            content=content_html_of(con),
            metadata=metadata,
        )


# ================================================== JSON API kinds (S8/S9)


def _post_from_api(spec: BoardSpec, item: dict, list_url: str) -> dict:
    post_id = str(item["id"])
    url = item.get("url") or join(list_url, f"/{spec.board_id}/view/{post_id}")
    created = parse_board_date(item["date"], spec.date_format)
    updated = (
        parse_board_date(item["updated"], spec.date_format)
        if item.get("updated")
        else None
    )
    content_html = item.get("content_html", "")
    con = parse_html(f"<div id='c'>{content_html}</div>").select_one("#c")
    spans = spans_from_container(con, url)
    attachments = [
        _attachment(join(url, a["url"]), a.get("name")) for a in item.get("attachments", [])
    ]
    return make_post(
        spec, post_id, url,
        title=item["title"].strip(),
        created_at=created,
        updated_at=updated,
        spans=spans,
        author=item.get("author"),
        description=item.get("summary"),
        category=list(item.get("category", [])),
        content=content_html,
        attachments=attachments,
    )


class JsonApiStrategy:
    """Single-request JSON APIs (startup:17-35, stu:20-56, oasis:17-36):
    one ?size=limit request, posts embedded in the response."""

    kind = "json_api"
    protocol = "single"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/posts?size={spec.posts_limit}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        data = json.loads(body.decode("utf-8"))
        posts = [_post_from_api(spec, item, page_url) for item in data["items"]]
        return ListParse(rows=[], has_more=False, embedded=posts)


class CursorStrategy:
    """Cursor pagination (ssfilm, plugins/ssfilm/src/lib.rs:18-59):
    ?LastNoticeIndex=<cursor of last row>; inherently serial per board."""

    kind = "cursor"
    protocol = "cursor"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int, cursor: str | None = None) -> str:
        base = spec.base_url.rstrip("/")
        if cursor is None:
            return canonicalize(f"{base}/notices")
        return canonicalize(f"{base}/notices?LastNoticeIndex={cursor}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        data = json.loads(body.decode("utf-8"))
        posts = [_post_from_api(spec, item, page_url) for item in data["items"]]
        lp = ListParse(rows=[], has_more=bool(data.get("hasNext")), embedded=posts)
        lp.cursor = str(data["items"][-1]["id"]) if data["items"] else None  # type: ignore[attr-defined]
        return lp


class LexicalStrategy:
    """Lexical editor-state boards (media/mediamba, plugins/media/src/lib.rs:21-94):
    JSON list + per-post Lexical detail document rendered in-process."""

    kind = "lexical"
    protocol = "single"
    upfront_pages = None

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/list?size={spec.posts_limit}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        data = json.loads(body.decode("utf-8"))
        rows = []
        for item in data["items"]:
            post_id = str(item["id"])
            url = canonicalize(f"{spec.base_url.rstrip('/')}/doc/{post_id}")
            rows.append(RowMeta(post_id=post_id, url=url, title=item["title"].strip(),
                                author=item.get("author"), date_str=item["date"]))
        return ListParse(rows=rows, has_more=False)

    def parse_detail(self, spec: BoardSpec, body: bytes, url: str, meta: RowMeta) -> dict:
        state_json = body.decode("utf-8")
        spans = lexical_to_spans(state_json, url)
        created = parse_board_date(meta.date_str, spec.date_format)
        return make_post(
            spec, meta.post_id, url,
            title=meta.title,
            created_at=created,
            spans=spans,
            author=meta.author,
            content=state_json,  # normative payload is the span list; content keeps the source
        )


class StudyStrategy:
    """Compressed-XHR board (S10, plugins/study/src/lib.rs:23-124): an HTML
    shell page carries the initial state in textarea#model; list pages are
    opaque compressed blobs (real lz-string UTF-16 codec (functions/codec.py), see
    functions/codec.py) decoded by the fetch path before parsing."""

    kind = "study"
    protocol = "shell_paged"
    upfront_pages = None

    def shell_url(self, spec: BoardSpec) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/xhr")

    def parse_shell(self, spec: BoardSpec, body: bytes) -> dict:
        from ssufid_ray.functions.codec import decode_payload

        doc = parse_html(body.decode("utf-8"))
        model_el = doc.select_one("textarea#model")
        if model_el is None:
            raise ValueError("study shell page missing textarea#model")
        # the textarea holds an lz-string-UTF16 blob (HTML-escaped in the
        # page; .text() returns it entity-decoded) — NOT ascii
        return decode_payload(model_el.text().strip().encode("utf-8"))

    def list_url(self, spec: BoardSpec, page_no: int) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/xhr/list?page={page_no}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        from ssufid_ray.functions.codec import decode_payload

        data = decode_payload(body)
        posts = [_post_from_api(spec, item, page_url) for item in data["items"]]
        return ListParse(rows=[], has_more=bool(data.get("hasNext")), embedded=posts)


class SsoStrategy:
    """Authenticated board (S11): the full SSO session chain of
    plugins/ssupath/src/sso.rs:26-92 —

      1. GET the login form, scrape its HIDDEN FIELDS
         (in_tp_bit / rqst_caus_cd, sso.rs:74-94; missing => CantLoadForm)
      2. submit them: the response sets the sToken COOKIE and redirects
         (sso.rs:53-57); a response without the cookie carries an
         alert("...") failure message instead (sso.rs:58-66)
      3. follow the redirect with the cookie to land the session; the
         landing page yields the session token used on every subsequent
         request — per-worker session state (T5)

    The intermediate cookie value is NOT the session token: skipping the
    redirect hop leaves you unauthenticated (the replay test asserts
    this)."""

    kind = "sso"
    protocol = "sso_chain"
    upfront_pages = None

    def login_url(self, spec: BoardSpec) -> str:
        return canonicalize(f"{spec.base_url.rstrip('/')}/sso/login")

    def parse_login_form(self, spec: BoardSpec, body: bytes) -> dict:
        """sso.rs parse_login_form: both hidden inputs are required."""
        doc = parse_html(body.decode("utf-8"))
        fields = {}
        for name in ("in_tp_bit", "rqst_caus_cd"):
            el = doc.select_one(f'input[name="{name}"]')
            if el is None or "value" not in el.attrs:
                raise ValueError(f"sso login form missing {name}")  # CantLoadForm
            fields[name] = el.attrs["value"]
        return fields

    def submit_url(self, spec: BoardSpec, fields: dict) -> str:
        q = "&".join(f"{k}={fields[k]}" for k in ("in_tp_bit", "rqst_caus_cd"))
        return canonicalize(f"{spec.base_url.rstrip('/')}/sso/submit?{q}")

    def parse_submit(self, spec: BoardSpec, body: bytes) -> tuple[str, str]:
        """-> (sToken cookie value, redirect URL). Mirrors sso.rs:53-70:
        no cookie => surface the page's alert(...) message."""
        text = body.decode("utf-8")
        m = re.search(r'document\.cookie="sToken=([^";]*)"', text)
        r = re.search(r'location\.href="([^"]+)"', text)
        if m is None or not m.group(1):
            am = re.search(r'alert\("([^"]*)"\)', text)
            raise ValueError(
                f"sso token missing: {am.group(1) if am else 'Internal Error'}")
        if r is None:
            raise ValueError("sso submit response missing redirect")
        return m.group(1), canonicalize(r.group(1))

    def parse_landing(self, spec: BoardSpec, body: bytes) -> str:
        doc = parse_html(body.decode("utf-8"))
        tok = doc.select_one("textarea#sToken")
        if tok is None:
            raise ValueError("sso landing page missing sToken")
        return normalize_text(tok.text())

    def list_url(self, spec: BoardSpec, page_no: int, token: str = "") -> str:
        return canonicalize(
            f"{spec.base_url.rstrip('/')}/secure/posts?size={spec.posts_limit}&sToken={token}")

    def parse_list(self, spec: BoardSpec, body: bytes, page_url: str) -> ListParse:
        data = json.loads(body.decode("utf-8"))
        posts = [_post_from_api(spec, item, page_url) for item in data["items"]]
        return ListParse(rows=[], has_more=False, embedded=posts)


STRATEGIES = {
    s.kind: s
    for s in (
        GnuboardStrategy(),
        WordpressStrategy(),
        WordpressCardStrategy(),
        SsucatchStrategy(),
        OffsetStrategy(),
        EuckrStrategy(),
        JsonApiStrategy(),
        CursorStrategy(),
        LexicalStrategy(),
        StudyStrategy(),
        SsoStrategy(),
    )
}


def strategy_for(kind: str):
    return STRATEGIES[kind]


def register_strategy(strategy) -> None:
    """User-extension surface (SURVEY §2.11 ≙ register_plugins!,
    /root/reference/packages/cli/src/macros.rs:1-119): adding a board kind =
    one strategy object + seed rows with its `board_kind`. The engine
    (frontier, fetch, dedup, merge, sinks) is generic over it.

    Custom strategies pick a pagination protocol via the `protocol` class
    attribute — one of "paged", "upfront", "single", "cursor",
    "shell_paged", "login_single", "sso_chain" (defaults to "single") —
    and implement the methods that protocol calls (see the built-in
    strategies)."""
    STRATEGIES[strategy.kind] = strategy
