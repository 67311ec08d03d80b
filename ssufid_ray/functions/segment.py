"""Text segmentation: ONE shared rule for turning flat text into fixed-word
text spans (used by the flagship pipeline, the span_docs query and the
dual-layout reader — and mirrored by the span_docs DuckDB oracle, so the
chunk size is part of the oracle contract)."""

from __future__ import annotations

SPAN_WORDS = 10


def segment_text(text: str) -> list[str]:
    """Fixed SPAN_WORDS-token chunks; empty/whitespace text -> ['']."""
    toks = (text or "").split()
    return [" ".join(toks[i : i + SPAN_WORDS])
            for i in range(0, max(1, len(toks)), SPAN_WORDS)]
