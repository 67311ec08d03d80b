"""Key/value table parsing + frontmatter construction (M15/M16).

The reference's ssupath plugin parses <tr><th>k</th><td>v</td></tr> tables
into ordered maps (/root/reference/plugins/ssupath/src/model/table.rs:27-51),
zips header rows against data rows for typed division tables
(table.rs:161-268), and renders program/course metadata as YAML-ish
frontmatter ahead of the content (model.rs:276-342). Pure functions used by
the euckr/sso strategies' metadata handling and available to user plugins.
"""

from __future__ import annotations

from ssufid_ray.functions.html import Element, normalize_text
from ssufid_ray.functions.dates import parse_calendar_range  # noqa: F401  (re-export convenience)


def parse_kv_table(table_el: Element) -> list[tuple[str, str]]:
    """<tr><th>k</th><td>v</td></tr> rows -> ordered (k, v) pairs; rows
    missing either cell are skipped (table.rs:27-51)."""
    out: list[tuple[str, str]] = []
    for tr in table_el.select("tr"):
        th, td = tr.select_one("th"), tr.select_one("td")
        if th is None or td is None:
            continue
        out.append((normalize_text(th.text()), normalize_text(td.text())))
    return out


def parse_header_zip_table(table_el: Element) -> list[dict[str, str]]:
    """Header-row + data-rows table -> list of {header: cell} dicts
    (division tables, table.rs:161-268). Short rows are padded with ''."""
    rows = table_el.select("tr")
    if not rows:
        return []
    headers = [normalize_text(c.text()) for c in rows[0].element_children()]
    out = []
    for tr in rows[1:]:
        cells = [normalize_text(c.text()) for c in tr.element_children()]
        cells += [""] * (len(headers) - len(cells))
        out.append(dict(zip(headers, cells)))
    return out


def render_frontmatter(metadata: list[tuple[str, str]], content: str) -> str:
    """YAML-ish frontmatter block ahead of the content (model.rs:276-342).
    Values containing ':' or newlines are quoted."""
    lines = ["---"]
    for k, v in metadata:
        if ":" in v or "\n" in v or v != v.strip():
            v = '"' + v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n") + '"'
        lines.append(f"{k}: {v}")
    lines.append("---")
    return "\n".join(lines) + "\n" + content


def parse_datetime_range(raw: str, year: int):
    """'A ~ B' two-datetime parse with alternate formats
    (ssupath/utils.rs:100-126) — delegated to the shared Korean range
    normalizer."""
    return parse_calendar_range(raw, year)
