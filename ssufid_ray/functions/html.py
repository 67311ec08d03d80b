"""Minimal HTML DOM + CSS-selector engine (stdlib html.parser only).

The reference uses the Rust `scraper` crate with compiled `Selector` sets
(e.g. /root/reference/plugins/common/src/common/gnuboard/mod.rs:21-43,
plugins/ssucatch/src/lib.rs:32-48). This sandbox has no bs4/lxml, so we
implement the small selector subset the board parsers need:

    tag  .class  #id  tag.class  a[download]  and combinators ' ' (descendant)
    and '>' (child), comma-free.

Selectors are compiled once per parser actor (__init__), matching the
reference's LazyLock selector statics (T3 in SURVEY §2.5).
"""

from __future__ import annotations

import re
import types
from html import unescape
from html.parser import HTMLParser

# shared by every attribute-less element: a read-only proxy (not a bare
# dict) so an accidental `el.attrs[k] = v` raises immediately instead of
# corrupting all attribute-less elements process-wide. The read API
# (.get / in / .items) is identical to dict.
_NO_ATTRS: types.MappingProxyType = types.MappingProxyType({})

VOID_TAGS = {"img", "br", "hr", "meta", "input", "link", "area", "base", "col",
             "embed", "source", "track", "wbr"}


class Element:
    # NO parent backref: nothing reads it, and parent<->children cycles
    # forced a full gc trace over every parsed page's tree (~20% of parse
    # time); downward-only references free by refcount the moment the
    # tree goes out of scope
    __slots__ = ("tag", "attrs", "children", "id_map", "class_map")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.id_map: dict[str, Element] | None = None  # document root only
        self.class_map: dict[str, list[Element]] | None = None

    # -- accessors ---------------------------------------------------------
    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def get(self, attr: str, default: str = "") -> str:
        return self.attrs.get(attr, default)

    def text(self) -> str:
        """All descendant text, concatenated (scraper's el.text() analogue)."""
        out: list[str] = []
        stack: list[Element | str] = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                out.append(node)
            else:
                stack.extend(reversed(node.children))
        return "".join(out)

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def inner_html(self) -> str:
        return "".join(
            c.outer_html() if isinstance(c, Element) else _escape_text(c)
            for c in self.children
        )

    def outer_html(self) -> str:
        attrs = "".join(
            f' {k}="{v}"' if v != "" else f" {k}" for k, v in self.attrs.items()
        )
        if self.tag in VOID_TAGS:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{self.inner_html()}</{self.tag}>"

    # -- selection ---------------------------------------------------------
    def select(self, selector: str) -> list["Element"]:
        return compile_selector(selector).select(self)

    def select_one(self, selector: str) -> "Element | None":
        hits = self.select(selector)
        return hits[0] if hits else None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.tag} id={self.id!r} class={self.classes}>"


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {})
        self.root.id_map = {}
        self.root.class_map = {}
        self.stack = [self.root]

    def _index(self, el: "Element") -> None:
        eid = el.attrs.get("id")
        if eid:
            self.root.id_map.setdefault(eid, []).append(el)
        cls = el.attrs.get("class")
        if cls:
            for c in cls.split():
                self.root.class_map.setdefault(c, []).append(el)

    _IMPLIED_CLOSE = {
        "p": {"p"},
        "li": {"li"},
        "option": {"option"},
        "tr": {"tr", "td", "th"},
        "td": {"td", "th"},
        "th": {"td", "th"},
    }

    def handle_starttag(self, tag, attrs):
        closes = self._IMPLIED_CLOSE.get(tag)
        while closes and len(self.stack) > 1 and self.stack[-1].tag in closes:
            self.stack.pop()
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._index(el)
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._index(el)
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the nearest matching open tag; tolerate stray closers
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html_stdlib(html: str) -> Element:
    """Reference implementation on stdlib html.parser — kept as the A/B
    oracle for the fast scanner below (test_html compares them on goldens,
    corpus pages and generated fragments)."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------- fast scanner
#
# html.parser spends ~90% of the fetch stage's CPU in per-tag regex
# machinery (parse_starttag/updatepos). This scanner produces the SAME
# tree for the HTML subset the engine sees (well-formed board pages):
# start/end/self-closing tags, comments, declarations, processing
# instructions, script/style rawtext (no entity decoding inside, like
# html.parser's CDATA mode), entity decoding in data and attribute values,
# lowercased tag/attribute names, html.parser's tolerant attribute syntax.

# Attr grammar notes (vs html.parser's attrfind_tolerant):
# - POSSESSIVE quantifiers throughout (*+/++/?+): each attr parses in
#   exactly one way, so a failing tag match is a single forward pass.
#   The backtracking form was EXPONENTIAL on unterminated attr lists
#   ("<div a= a= a= ..." with no '>'): the optional value group could
#   match-or-skip per attr, and a failed overall match explored every
#   combination. Possessiveness changes no accepted tag: values exclude
#   the chars ('>', whitespace) the tail needs, so giving characters
#   back can never turn a failure into a match.
# - '<' is EXCLUDED from attr names and unquoted values (html.parser
#   tolerates it there): otherwise a failed tag attempt scans to the
#   next whitespace-free '<'-run end — O(page) per '<' inside broken
#   regions like unterminated scripts, O(page^2) overall. A page using
#   '<' in an attr token now fails the master pattern and defers to
#   html.parser via the text check, which is the correctness contract.
_ATTR = re.compile(
    r"[\s/]*+([^\s/>=<]++)(?:\s*+=\s*+(?:\"([^\"]*+)\"|'([^']*+)'|([^\s><]*+)))?+")
_ATTRS_PAT = (r"((?:[\s/]++[^\s/>=<]++"
              r"(?:\s*+=\s*+(?:\"[^\"]*+\"|'[^']*+'|[^\s><]*+))?+)*+)")
# ONE alternation, ONE C pass per document via .split(): the per-tag
# Match objects, .group()/.end() calls and str.find('<') scans of the
# positional loop this replaced were ~20% of the whole parse kernel
# (19M Match allocations per 29k pages, cProfile r5). Groups:
#   1 script attrs  2 script rawtext   3 style attrs  4 style rawtext
#   5 end-tag name  6 start-tag name   7 start attrs  8 closing slash
#   9 comment body (captured so the stride is fixed; never read)
# script/style rawtext is folded INTO the master pattern (lazy body up
# to the first case-insensitive close, html.parser's CDATA rule), so
# the assembly loop below needs no source offsets — which is what lets
# it run off a flat .split() list instead of per-position matching.
_MASTER = re.compile(
    "<(?:"
    # rawtext attrs are ATOMIC (?>...): without it, `<script f=''/>`
    # backtracks the unquoted-value branch to swallow the closing slash
    # and a SELF-closing script wrongly enters rawtext mode — atomicity
    # fails this alternative over to the generic one, which carries the
    # explicit (/?) slash group (html.parser's startendtag rule)
    "(?i:script)(?![^\t\n\r\f />\x00])(?>" + _ATTRS_PAT +
    r")\s*>((?s:.*?))</\s*(?i:script)[^>]*"
    "|(?i:style)(?![^\t\n\r\f />\x00])(?>" + _ATTRS_PAT +
    r")\s*>((?s:.*?))</\s*(?i:style)[^>]*"
    r"|/\s*([a-zA-Z][^\s>]*)\s*"
    "|([a-zA-Z][^\t\n\r\f />\x00]*)" + _ATTRS_PAT + r"\s*(/?)"
    r"|!--((?s:.*?))--"
    r"|(?:!(?!\[|--)|\?)[^>]*"
    ")>")
_N_GROUPS = _MASTER.groups
_STRIDE = _N_GROUPS + 1
# a '<' left in TEXT that the grammar would have acted on (tag letter —
# unicode isalpha, matching the old scanner's nxt.isalpha() deferral on
# e.g. '<한글' — or '/', '!', '?') means the master pattern failed on a
# form outside its tolerant grammar: defer to html.parser. A bare '<'
# before spaces/digits stays text, exactly like html.parser.
_TEXT_LT = re.compile(r"<(?=[!?/])|<(?=[^\W\d])")
_RAWTEXT = {"script", "style"}
_IMPLIED_CLOSE = _TreeBuilder._IMPLIED_CLOSE


def parse_html(html: str) -> Element:
    """Fast scan; falls back to the stdlib reference builder whenever the
    scanner meets a tag form outside its tolerant grammar (stray '='
    attributes, malformed closers, truncated tags) — those are exactly the
    inputs where html.parser's recovery could build a different tree, so
    the reference parser decides."""
    root = _fast_scan(html)
    if root is None:
        return parse_html_stdlib(html)
    return root


def _parse_attrs(raw_attrs: str) -> dict[str, str] | None:
    attrs: dict[str, str] = {}
    # findall tuples use "" (not None) for absent groups: an attr with no
    # value and one with ="" both land on "", the html.parser value
    for name, v2, v3, v4 in _ATTR.findall(raw_attrs):
        if v4 and v4[0] in "\"'":
            # an UNQUOTED value token starting with a quote char means a
            # quote opened and never closed before the tag's '>' —
            # html.parser keeps scanning for the close quote and, at
            # EOF, emits the whole tag as text: defer to it (None)
            return None
        v = v2 or v3 or v4
        if v and "&" in v:
            v = unescape(v)
        if not name.islower():
            name = name.lower()
        attrs[name] = v  # duplicate attr: last wins
    return attrs


def _fast_scan(html: str) -> Element | None:
    parts = _MASTER.split(html)
    root = Element("#document", {})
    root.id_map = {}
    root.class_map = {}
    id_map, class_map = root.id_map, root.class_map
    stack = [root]
    s = parts[0]
    if s:
        if "<" in s and _TEXT_LT.search(s):
            return None  # form outside the grammar: defer to html.parser
        if "&" in s:
            s = unescape(s)
        stack[-1].children.append(s)
    implied_get = _IMPLIED_CLOSE.get
    # repeated attribute strings (boilerplate rows, list markup) parse
    # once per page and SHARE the dict — attrs are never mutated after
    # build (all consumers are .get/in/items reads, the _NO_ATTRS
    # contract), so sharing is safe and cuts both findall calls and
    # allocation churn (the same-box memory-subsystem derate lever)
    attr_memo: dict[str, dict[str, str]] = {}
    n = len(parts)
    i = 1
    while i < n:
        name = parts[i + 5]
        if name is not None:  # generic start tag
            if not name.islower():
                name = name.lower()
            raw_attrs = parts[i + 6]
            self_closing = parts[i + 7] == "/"
            if not self_closing:
                if name in _RAWTEXT:
                    # script/style arriving via the GENERIC alternative
                    # means the rawtext alternative failed — an
                    # unterminated region: defer to html.parser
                    return None
                closes = implied_get(name)
                while closes and len(stack) > 1 and stack[-1].tag in closes:
                    stack.pop()
            if raw_attrs:
                attrs = attr_memo.get(raw_attrs)
                if attrs is None:
                    attrs = _parse_attrs(raw_attrs)
                    if attrs is None:  # unterminated quote: defer
                        return None
                    attr_memo[raw_attrs] = attrs
                el = Element(name, attrs)
                eid = attrs.get("id")
                if eid:
                    id_map.setdefault(eid, []).append(el)
                cls = attrs.get("class")
                if cls:
                    for c in cls.split():
                        class_map.setdefault(c, []).append(el)
            else:  # attr-less: shared empty attrs, no id/class lookups
                el = Element(name, _NO_ATTRS)
            stack[-1].children.append(el)
            if not self_closing and name not in VOID_TAGS:
                stack.append(el)
        else:
            name = parts[i + 4]
            if name is not None:  # end tag
                if not name.islower():
                    name = name.lower()
                for j in range(len(stack) - 1, 0, -1):
                    if stack[j].tag == name:
                        del stack[j:]
                        break
            else:
                raw = parts[i + 1]  # g2: script rawtext body
                if raw is not None:
                    tag, raw_attrs = "script", parts[i]  # g1
                else:
                    raw = parts[i + 3]  # g4: style rawtext body
                    tag, raw_attrs = "style", parts[i + 2]  # g3
                if raw is not None:
                    attrs = _parse_attrs(raw_attrs) if raw_attrs else _NO_ATTRS
                    if attrs is None:  # unterminated quote: defer
                        return None
                    el = Element(tag, attrs)
                    eid = attrs.get("id")
                    if eid:
                        id_map.setdefault(eid, []).append(el)
                    cls = attrs.get("class")
                    if cls:
                        for c in cls.split():
                            class_map.setdefault(c, []).append(el)
                    stack[-1].children.append(el)
                    if raw:
                        el.children.append(raw)  # raw: no entity decoding
                # else: comment or decl/PI — dropped entirely
        s = parts[i + _N_GROUPS]
        if s:
            if "<" in s and _TEXT_LT.search(s):
                return None
            if "&" in s:
                s = unescape(s)
            stack[-1].children.append(s)
        i += _STRIDE
    return root


# -------------------------------------------------------------- selectors

_SIMPLE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*|\*)?"
    r"(?P<id>#[-\w]+)?"
    r"(?P<classes>(?:\.[-\w]+)+)?"
    r'(?P<attr>\[[-\w]+(?:="[^"]*")?\])?$'
)


class _Step:
    __slots__ = ("tag", "id", "classes", "attr", "attr_value", "child_only")

    def __init__(self, token: str, child_only: bool):
        m = _SIMPLE.match(token)
        if not m:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.id = m.group("id")[1:] if m.group("id") else None
        self.classes = m.group("classes")[1:].split(".") if m.group("classes") else []
        self.attr = None
        self.attr_value = None  # None = presence-only [attr]
        if m.group("attr"):
            inner = m.group("attr")[1:-1]
            if '="' in inner:  # [name="value"] exact match
                self.attr, _, val = inner.partition("=")
                self.attr_value = val[1:-1]
            else:
                self.attr = inner
        self.child_only = child_only

    def matches(self, el: Element) -> bool:
        if self.tag and el.tag != self.tag:
            return False
        if self.id and el.id != self.id:
            return False
        if self.classes:
            cls = el.classes
            if any(c not in cls for c in self.classes):
                return False
        if self.attr is not None:
            if self.attr not in el.attrs:
                return False
            if self.attr_value is not None and el.attrs.get(self.attr) != self.attr_value:
                return False
        return True


class Selector:
    """A compiled selector: sequence of steps with ' ' / '>' combinators."""

    def __init__(self, selector: str):
        self.source = selector
        tokens = re.split(r"\s*(>)\s*|\s+", selector.strip())
        self.steps: list[_Step] = []
        child_next = False
        for tok in tokens:
            if tok is None or tok == "":
                continue
            if tok == ">":
                child_next = True
                continue
            self.steps.append(_Step(tok, child_next))
            child_next = False
        if not self.steps:
            raise ValueError(f"empty selector: {selector!r}")

    def select(self, root: Element) -> list[Element]:
        current = [root]
        steps = self.steps
        # fast path: id/class index jump for the first step on a parsed
        # document root (descendant-of-root = any element, so index lookup
        # is semantically identical to the full-tree walk)
        first = steps[0]
        if not first.child_only and getattr(root, "id_map", None) is not None:
            if first.id is not None:
                cand = root.id_map.get(first.id, [])
                current = [el for el in cand if first.matches(el)]
                steps = steps[1:]
            elif first.classes:
                cand = root.class_map.get(first.classes[0], [])
                current = [el for el in cand if first.matches(el)]
                steps = steps[1:]
            if not current:
                return []
        for step in steps:
            nxt: list[Element] = []
            seen: set[int] = set()
            for base in current:
                if step.child_only:
                    candidates = base.element_children()
                else:
                    candidates = _descendants(base)
                for el in candidates:
                    if step.matches(el) and id(el) not in seen:
                        seen.add(id(el))
                        nxt.append(el)
            current = nxt
            if not current:
                return []
        return current


def _descendants(el: Element) -> list[Element]:
    out: list[Element] = []
    stack = list(reversed(el.element_children()))
    while stack:
        node = stack.pop()
        out.append(node)
        stack.extend(reversed(node.element_children()))
    return out


_SELECTOR_CACHE: dict[str, Selector] = {}


def compile_selector(selector: str) -> Selector:
    sel = _SELECTOR_CACHE.get(selector)
    if sel is None:
        sel = Selector(selector)
        _SELECTOR_CACHE[selector] = sel
    return sel


def normalize_text(s: str) -> str:
    return unescape(re.sub(r"\s+", " ", s)).strip()
