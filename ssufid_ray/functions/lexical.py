"""Lexical editor-state JSON -> ordered span sequence.

The reference ships Lexical-state content (media/mediamba boards) to an
out-of-process Deno renderer that produces HTML
(/root/reference/lexical-parser/src/main.ts:20-49; serialized ImageNode =
{altText, height, maxWidth, showCaption, src, width},
lexical-parser/src/nodes/ImageNode.tsx:32-42). We render the node tree
straight to spans in-process (SURVEY §2.3 M12) — no subprocess, no HTML
intermediate.

Node semantics:
  paragraph / heading / quote  -> one text span of the concatenated text
                                  children (empty -> skipped)
  list                         -> one text span PER list item
  image / inline-image         -> image span (media_ref = src)
  horizontalrule               -> skipped (no content)
  table                        -> one text span per row: cells joined ' | '
"""

from __future__ import annotations

import json

from ssufid_ray.functions.dates import normalize_whitespace
from ssufid_ray.urlnorm import join


def _text_of(node: dict) -> str:
    if node.get("type") in ("text", "linebreak"):
        return node.get("text", "") if node.get("type") == "text" else " "
    out = []
    for c in node.get("children", []):
        out.append(_text_of(c))
    return "".join(out)


def lexical_to_spans(state_json: str, base_url: str) -> list[dict]:
    state = json.loads(state_json)
    root = state.get("root", {})
    spans: list[dict] = []

    def emit(kind: str, text: str = "", media_ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": -1})

    def walk(node: dict) -> None:
        t = node.get("type")
        if t in ("paragraph", "heading", "quote"):
            txt = normalize_whitespace(_text_of(node))
            if txt:
                emit("text", txt)
        elif t == "list":
            for item in node.get("children", []):
                txt = normalize_whitespace(_text_of(item))
                if txt:
                    emit("text", txt)
        elif t in ("image", "inline-image"):
            src = node.get("src", "")
            if src:
                emit("image", media_ref=join(base_url, src))
        elif t == "table":
            for row in node.get("children", []):
                cells = [normalize_whitespace(_text_of(c)) for c in row.get("children", [])]
                txt = " | ".join(c for c in cells)
                if txt.strip(" |"):
                    emit("text", txt)
        elif t == "horizontalrule":
            pass
        else:  # root or unknown containers: recurse
            for c in node.get("children", []):
                walk(c)

    for child in root.get("children", []):
        walk(child)
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans
