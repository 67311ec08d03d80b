"""Span extraction: HTML content containers -> ordered (kind, text,
media_ref, offset) sequences.

This is the engine's normative content model (the driver `input_hint`
schema). It mirrors the reference's content semantics: gnuboard content =
ordered child elements of the container
(/root/reference/plugins/common/src/common/gnuboard/mod.rs:174-184), the
thumbnail = first image (mod.rs:169-172), attachments = trailing refs
(mod.rs:186-195).

Segmentation spec (shared with the corpus generator at the *format* level —
the generator derives ground truth from its generation metadata, never by
re-parsing; SURVEY §7.4):
  - iterate element children of the content container in document order
  - <img>                -> ("image", "", resolved src)
  - any other element    -> ("text", normalize_text(all inner text), "")
                            skipped entirely when normalized text is empty
  - attachments are appended AFTER content spans, in attachment-list order,
    as ("attachment", "", url)
  - offsets are dense 0..n-1 over the final sequence
"""

from __future__ import annotations

from ssufid_ray.functions.html import Element, normalize_text
from ssufid_ray.urlnorm import join


def spans_from_container(container: Element, base_url: str) -> list[dict]:
    spans: list[dict] = []
    for child in container.element_children():
        if child.tag == "img":
            src = child.get("src")
            if src:
                spans.append(_span("image", "", join(base_url, src)))
        else:
            txt = normalize_text(child.text())
            if txt:
                spans.append(_span("text", txt, ""))
    return spans


def append_attachment_spans(spans: list[dict], attachments: list[dict]) -> list[dict]:
    for att in attachments:
        spans.append(_span("attachment", "", att["url"]))
    return _reoffset(spans)


def _span(kind: str, text: str, media_ref: str) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": -1}


def _reoffset(spans: list[dict]) -> list[dict]:
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def first_image(spans: list[dict]) -> str | None:
    """Thumbnail rule: first image span's media_ref (gnuboard mod.rs:169-172)."""
    for s in spans:
        if s["kind"] == "image":
            return s["media_ref"]
    return None


def content_html_of(container: Element) -> str:
    """The reference's content string: child elements' HTML joined with \\n
    (gnuboard/mod.rs:181-184)."""
    return "\n".join(c.outer_html() for c in container.element_children())


def text_of_spans(spans: list[dict]) -> str:
    """Concatenated text content (used for RSS description fallback)."""
    return " ".join(s["text"] for s in spans if s["kind"] == "text")
