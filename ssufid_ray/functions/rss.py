"""RSS 2.0 renderer (K2), porting the reference's channel/item semantics
(/root/reference/packages/ssufid/src/core/rss.rs:13-101):

  - description = post description, falling back to the first 50 chars of
    content (rss.rs:17-22)
  - guid = post id, isPermaLink="false" (rss.rs:28-31)
  - one <category> per category entry (rss.rs:39-49)
  - thumbnail -> <enclosure url=... type=mime-guess> (rss.rs:51-61)
  - <atom:updated> extension when updated_at present (rss.rs:66-77)
  - channel carries atom + content namespaces (rss.rs:82-101)
  - pubDate RFC2822 (+0000; timestamps stored UTC)
"""

from __future__ import annotations

from datetime import datetime
from xml.sax.saxutils import escape

from ssufid_ray.functions.textnorm import description_fallback, guess_mime


def _rfc2822(dt: datetime) -> str:
    return dt.strftime("%a, %d %b %Y %H:%M:%S +0000")


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def render_item(post: dict) -> str:
    parts = ["<item>"]
    parts.append(f"<title>{escape(post['title'])}</title>")
    parts.append(f"<link>{escape(post['url'])}</link>")
    desc = description_fallback(post.get("description"), post.get("content") or "")
    parts.append(f"<description>{escape(desc)}</description>")
    # rss.rs:33 builder.content(...) -> <content:encoded> (full body)
    parts.append(
        f"<content:encoded>{escape(post.get('content') or '')}</content:encoded>")
    if post.get("author"):
        parts.append(f"<author>{escape(post['author'])}</author>")
    parts.append(f'<guid isPermaLink="false">{escape(post["post_id"])}</guid>')
    for cat in post.get("category") or []:
        parts.append(f"<category>{escape(cat)}</category>")
    parts.append(f"<pubDate>{_rfc2822(post['created_at'])}</pubDate>")
    thumb = post.get("thumbnail")
    if thumb:
        mime = guess_mime(thumb) or "image/*"
        parts.append(f'<enclosure url="{escape(thumb)}" length="0" type="{mime}"/>')
    if post.get("updated_at"):
        parts.append(f"<atom:updated>{_iso(post['updated_at'])}</atom:updated>")
    parts.append("</item>")
    return "".join(parts)


def render_channel(title: str, link: str, description: str, posts: list[dict]) -> str:
    head = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom" '
        'xmlns:content="http://purl.org/rss/1.0/modules/content/">'
        "<channel>"
        f"<title>{escape(title)}</title>"
        f"<link>{escape(link)}</link>"
        f"<description>{escape(description)}</description>"
    )
    items = "".join(render_item(p) for p in posts)
    return head + items + "</channel></rss>"
