from ssufid_ray.functions.html import normalize_text, parse_html

SAMPLE = """
<html><body>
<div id="bo_list"><table><tbody>
  <tr><td class="td_num2"><p>공지</p></td>
      <td class="td_subject"><div><a href="view.php?wr_id=10">First post</a></div></td>
      <td class="td_name sv_use"><span>alice</span></td>
      <td class="td_date">24-03-15</td></tr>
  <tr><td class="td_num2"><p>일반</p></td>
      <td class="td_subject"><div><a href="view.php?wr_id=11">Second</a></div></td>
      <td class="td_name sv_use"><span>bob</span></td>
      <td class="td_date">24-03-14</td></tr>
</tbody></table></div>
<div id="bo_v_con">
  <p>Intro paragraph</p>
  <img src="http://h.kr/img/1.png">
  <p>More &amp; more</p>
</div>
<div id="bo_v_file"><ul>
  <li><a href="/dl?f=1"><strong>spec.pdf</strong></a></li>
</ul></div>
</body></html>
"""


def test_select_rows_and_cells():
    doc = parse_html(SAMPLE)
    rows = doc.select("#bo_list table > tbody > tr")
    assert len(rows) == 2
    links = [r.select_one("td.td_subject > div > a") for r in rows]
    assert [a.get("href") for a in links] == ["view.php?wr_id=10", "view.php?wr_id=11"]
    assert normalize_text(links[0].text()) == "First post"
    authors = [normalize_text(r.select_one("td.td_name.sv_use > span").text()) for r in rows]
    assert authors == ["alice", "bob"]


def test_content_children_and_entities():
    doc = parse_html(SAMPLE)
    con = doc.select_one("#bo_v_con")
    kids = con.element_children()
    assert [k.tag for k in kids] == ["p", "img", "p"]
    assert normalize_text(kids[2].text()) == "More & more"
    assert kids[1].get("src") == "http://h.kr/img/1.png"


def test_attr_selector_and_strong():
    doc = parse_html(SAMPLE)
    files = doc.select("#bo_v_file > ul > li > a")
    assert len(files) == 1
    assert normalize_text(files[0].select_one("strong").text()) == "spec.pdf"


def test_unclosed_tags_tolerated():
    doc = parse_html("<div><p>a<p>b</div><span>c</span>")
    ps = doc.select("div p")
    assert [normalize_text(p.text()) for p in ps] == ["a", "b"]
    assert normalize_text(doc.select_one("span").text()) == "c"


def test_inner_outer_html_roundtrip():
    doc = parse_html('<div id="x"><p>hi <b>there</b></p><img src="u"></div>')
    div = doc.select_one("#x")
    assert div.inner_html() == '<p>hi <b>there</b></p><img src="u">'
    reparsed = parse_html(div.outer_html())
    assert reparsed.select_one("#x b").text() == "there"


def test_fast_parser_matches_stdlib_reference():
    """The fast scanner must produce the same tree as the html.parser
    reference builder (adjacent text runs merged) on tricky fragments and
    real corpus pages."""
    from ssufid_ray.functions.html import parse_html, parse_html_stdlib

    def canon(el):
        kids, buf = [], ""
        for c in el.children:
            if isinstance(c, str):
                buf += c
            else:
                if buf:
                    kids.append(("#t", buf))
                    buf = ""
                kids.append(canon(c))
        if buf:
            kids.append(("#t", buf))
        return (el.tag, tuple(sorted(el.attrs.items())), tuple(kids))

    cases = [
        '<div id="a" class="x y"><p>one<p>two</p><img src="i.png"><br></div>',
        '<table><tr><th>h</th><td>1<tr><td>2</table>',
        '<a href="x?a=1&amp;b=2" download>R&amp;D &lt;tag&gt;</a>',
        '<script>if (a<b && c>d) { x="</div>"; }</script><p>after</p>',
        "<input type='hidden' name=foo value=bar><input checked>",
        '<!-- comment <p>no</p> --><!DOCTYPE html><?pi junk?><p>ok</p>',
        '<div><span>a < b</span> 3 > 2</div>',
        '<select><option>a<option>b</select>',
        '<textarea>1 &lt; 2 &amp; stuff</textarea>',
        '<div CLASS="UP" ID="Mix"><P>upper</P></div>',
        '<x-custom attr="v"/>text<y/>',
        '<div att1="a" att1="b">dup</div>',
        '<style>.a > .b { red; }</style><p>s</p>',
        '회의 &amp; 안내 <b>굵게</b> 보통',
        '<div><p>unclosed<div><p>nest</div></div>',
        '<ul><li>a<li>b</ul><hr><li>stray</li>',
    ]
    for h in cases:
        assert canon(parse_html(h)) == canon(parse_html_stdlib(h)), h


def test_fast_parser_matches_stdlib_on_corpus_pages(corpus):
    import pyarrow.parquet as pq
    from pathlib import Path

    from ssufid_ray.functions.html import parse_html, parse_html_stdlib

    def flat(el, out):
        out.append((el.tag, tuple(sorted(el.attrs.items()))))
        txt = ""
        for c in el.children:
            if isinstance(c, str):
                txt += c
            else:
                if txt:
                    out.append(txt)
                    txt = ""
                flat(c, out)
        if txt:
            out.append(txt)
        return out

    (d, _meta) = corpus
    n = 0
    for f in sorted(Path(d, "pages").glob("*.parquet"))[:6]:
        t = pq.read_table(f, columns=["body", "content_type"])
        for b, ct in zip(t["body"].to_pylist(), t["content_type"].to_pylist()):
            if "html" not in ct:
                continue
            h = b.decode("euc-kr" if "euc-kr" in ct else "utf-8",
                         errors="replace")
            assert flat(parse_html(h), []) == flat(parse_html_stdlib(h), [])
            n += 1
    assert n > 50


def test_fast_parser_matches_stdlib_fuzz():
    """Composed pseudo-HTML fuzz: the fast scanner either produces the
    stdlib tree exactly (text runs merged) or defers (returns the stdlib
    tree via parse_html's fallback) — never a silently different tree."""
    import random

    from ssufid_ray.functions.html import parse_html, parse_html_stdlib

    def canon(el):
        kids, buf = [], ""
        for c in el.children:
            if isinstance(c, str):
                buf += c
            else:
                if buf:
                    kids.append(("#t", buf))
                    buf = ""
                kids.append(canon(c))
        if buf:
            kids.append(("#t", buf))
        return (el.tag, tuple(sorted(el.attrs.items())), tuple(kids))

    rng = random.Random(20260820)
    tags = ["div", "p", "span", "a", "li", "td", "tr", "table", "ul",
            "img", "br", "B", "SCRIPT", "style", "x-el"]
    frags = ["text ", "한글 텍스트 ", "&amp; ", "&lt;x&gt; ", "a < b ", "3>2 ",
             "<!-- c <p>x</p> -->", "<!DOCTYPE html>", "<?pi da?>", "&#65;",
             "<script>var a=1<2;</script>", "<style>.a>.b{}</style>", "\n  "]
    attrs = ["", ' id="i%d"', ' class="c%d 공지"', " href='u?a=1&amp;b=%d'",
             " checked", " data-x=v%d", ' TITLE="T %d"']

    def gen(depth):
        out = []
        for _ in range(rng.randint(1, 6)):
            r = rng.random()
            if r < 0.35 or depth > 4:
                out.append(rng.choice(frags))
            elif r < 0.5:
                t = rng.choice(tags)
                a = rng.choice(attrs)
                out.append(f"<{t}{a % rng.randint(0, 9) if '%' in a else a}/>")
            else:
                t = rng.choice(tags)
                a = rng.choice(attrs)
                a = a % rng.randint(0, 9) if "%" in a else a
                inner = "".join(gen(depth + 1))
                close = f"</{t}>" if rng.random() < 0.8 else ""
                out.append(f"<{t}{a}>{inner}{close}")
        return out

    for _ in range(300):
        h = "".join(gen(0))
        assert canon(parse_html(h)) == canon(parse_html_stdlib(h)), h


def test_fast_parser_bounded_on_adversarial_input():
    """Broken tag forms must fail the fast scanner in bounded time (the
    backtracking attr grammar was exponential on unterminated attr lists
    and O(page^2) on '<' runs inside unterminated scripts) and defer to
    the html.parser reference, never hang or silently diverge."""
    import time

    from ssufid_ray.functions.html import _fast_scan

    cases = {
        "<div " + "a= " * 4000: None,                       # exp. blowup form
        "<script>" + "x<y " * 20000: None,                  # O(n^2) form
        "<div a='" + "b " * 30000: None,                    # unterminated quote
        "<div " + "a= " * 4000 + ">x</div>": "tree",        # valid, attr flood
        "<script>" + "x<y " * 20000 + "</script>z": "tree", # valid rawtext
    }
    for h, want in cases.items():
        t0 = time.perf_counter()
        r = _fast_scan(h)
        dt = time.perf_counter() - t0
        assert dt < 1.0, f"scanner took {dt:.2f}s on {h[:40]!r}..."
        assert (r is None) == (want is None), h[:40]
