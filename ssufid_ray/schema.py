"""Arrow schemas for every table the engine reads or writes.

The span-document schema is the driver `input_hint` schema and mirrors the
reference's interleaved content model (text blocks + <img> media blocks,
/root/reference/plugins/common/src/common/gnuboard/mod.rs:174-195; Lexical
node trees /root/reference/lexical-parser/src/main.ts:20-49).

The post schema mirrors SsufidPost
(/root/reference/packages/ssufid/src/core/post.rs:24-41) with timestamps
normalized to UTC (reference assumes KST +9 at parse time, e.g.
gnuboard/mod.rs:206-216).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- span docs

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),  # "text" | "image" | "attachment"
        ("text", pa.string()),  # paragraph text for kind=text, "" otherwise
        ("media_ref", pa.string()),  # URL for media kinds, "" for text
        ("offset", pa.int32()),  # 0..n-1 dense order within the doc
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),  # "<board_id>/<post_id>"
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ---------------------------------------------------------------- posts

ATTACHMENT_STRUCT = pa.struct(
    [
        ("url", pa.string()),
        ("name", pa.string()),
        ("mime_type", pa.string()),
    ]
)

POSTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("plugin_id", pa.string()),
        ("post_id", pa.string()),
        ("url", pa.string()),
        ("author", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("category", pa.list_(pa.string())),
        ("created_at", pa.timestamp("us")),  # UTC-naive (Arrow/DuckDB convention)
        ("updated_at", pa.timestamp("us")),
        ("thumbnail", pa.string()),
        ("content", pa.string()),  # raw HTML (reference keeps HTML string)
        ("attachments", pa.list_(ATTACHMENT_STRUCT)),
        ("metadata", pa.map_(pa.string(), pa.string())),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ---------------------------------------------------------------- calendar

CALENDAR_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("starts_at", pa.timestamp("us")),
        ("ends_at", pa.timestamp("us")),
        ("location", pa.string()),
        ("url", pa.string()),
        ("plugin_id", pa.string()),
    ]
)

# ---------------------------------------------------------------- seeds

SEED_SCHEMA = pa.schema(
    [
        ("board_id", pa.string()),
        ("host", pa.string()),
        ("base_url", pa.string()),
        ("board_kind", pa.string()),  # gnuboard|wordpress|wordpress_card|ssucatch|offset|cursor|json_api|lexical|euckr
        ("date_format", pa.string()),
        ("id_param", pa.string()),
        ("page_size", pa.int32()),
        ("posts_limit", pa.int32()),
        ("politeness_ms", pa.int32()),
        ("priority_date", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------- page store

PAGE_STORE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),  # canonical
        ("host", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
        ("fetch_ms", pa.int32()),
        ("flaky", pa.bool_()),  # True => first attempt returns 500, retry succeeds
    ]
)

# ---------------------------------------------------------------- oracle

CRAWL_ORACLE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("fetch_seq", pa.int64()),  # per-host deterministic order
        ("doc_id", pa.string()),  # null for list/robots pages
        ("outcome", pa.string()),  # fetched|robots_blocked|dup_skipped|error_retry
    ]
)

# ---------------------------------------------------------------- frontier

FETCH_TASK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("board_id", pa.string()),
        ("kind", pa.string()),  # robots|list|detail
        ("page_no", pa.int32()),
        ("row_idx", pa.int32()),
        ("fetch_seq", pa.int64()),
        ("attempt", pa.int32()),
    ]
)

# ---------------------------------------------------------------- metrics

METRICS_SCHEMA = pa.schema(
    [
        ("generation", pa.int32()),
        ("plugin_id", pa.string()),
        ("event_type", pa.string()),  # crawl_success|crawl_failed|post_created|post_updated|parse_skipped|robots_blocked|dup_skipped|fetch_retry
        ("count", pa.int64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
