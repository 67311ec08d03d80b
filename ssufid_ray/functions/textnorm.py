"""Text/record normalization helpers shared by parse, merge and sinks."""

from __future__ import annotations

import mimetypes


def contents_eq(a: dict, b: dict) -> bool:
    """The reference's change-detection predicate
    (/root/reference/packages/ssufid/src/core/post.rs:50-55): compares
    TRIMMED id, title, category, content only — author/attachments/dates do
    not trigger an update."""
    if a["post_id"].strip() != b["post_id"].strip():
        return False
    if a["title"].strip() != b["title"].strip():
        return False
    # category is compared UNTRIMMED (post.rs:53 `self.category ==
    # other.category`): a whitespace-only category change IS an update
    if list(a.get("category") or []) != list(b.get("category") or []):
        return False
    return (a.get("content") or "").strip() == (b.get("content") or "").strip()


def calendar_contents_eq(a: dict, b: dict) -> bool:
    """Calendar change detection compares ALL fields, trimmed
    (/root/reference/packages/ssufid/src/core/calendar.rs:56-65)."""
    def t(v):
        return v.strip() if isinstance(v, str) else v

    keys = ("id", "title", "description", "starts_at", "ends_at", "location", "url")
    return all(t(a.get(k)) == t(b.get(k)) for k in keys)


def guess_mime(filename_or_url: str) -> str | None:
    """Mime inference from filename (post.rs:13-21, rss.rs:52-55)."""
    mt, _ = mimetypes.guess_type(filename_or_url)
    return mt


def description_fallback(description: str | None, content_text: str) -> str:
    """RSS description fallback: first 50 chars of content + '...' when
    description is missing and content is longer than 50 chars; short
    content passes through whole (rss.rs:17-22 char_indices().nth(50))."""
    if description is not None:
        return description
    if len(content_text) > 50:
        return content_text[:50] + "..."
    return content_text
