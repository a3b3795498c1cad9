"""Differential tests: the fast regex tag scanner (html_extract._fast_feed)
must produce the same extract() output as the stdlib HTMLParser tokenizer it
replaced, across edge cases, random markup, and the bench corpus' HTML docs.
"""

import random

from pdfextraction_ray import html_extract as H


def _stdlib_extract(html: str, **kw) -> dict:
    parser = H._PageParser(kw.get("min_text_chars", H.MIN_TEXT_CHARS),
                           kw.get("max_link_density", H.MAX_LINK_DENSITY))
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    blocks = (parser.blocks_in_container
              if parser.container_seen and parser.blocks_in_container
              else parser.blocks)
    pieces, spans, pos = [], [], 0
    for tag, text in blocks:
        if pieces:
            pos += len(H.BLOCK_JOIN)
        pieces.append(text)
        spans.append({"start": pos, "end": pos + len(text), "kind": tag})
        pos += len(text)
    return {"extracted_text": H.BLOCK_JOIN.join(pieces), "spans": spans,
            "blocks": blocks, "tables": parser.tables}


EDGE_CASES = [
    '<DIV CLASS="X &amp; Y"><p>a&amp;b and enough text to pass the length bar</p></div>',
    '<main><p>one<br/>two<br />and some more text to clear the bar</p></main>',
    '<script>if (a<b) {"</p>"}</script><main><p>after script body, long enough text here</p></main>',
    '<!-- c --><!DOCTYPE html><?pi?><main><p>decl and comment skipped, text keeps going</p></main>',
    '<main><p>a &lt; b and <1notag> text that is long enough to keep in the output</p></main>',
    "<main><p class=unquoted id='q'>unquoted attributes with sufficient text length</p></main>",
    '<main><p>a&nbsp;b&#65;c&unknown;d plus extra words to clear the length bar</p></main>',
    '<main><p\nclass="m">newline inside the tag, and adequate paragraph text</p></main>',
    '<table><caption>T</caption><tr><th>H1</th><th>H2</th></tr><tr><td>1<td>2</table>',
    '<main><p>trailing open bracket < and then more than enough words here</p></main>',
    '<style>h1 { color: red; }</style><main><p>styles ignored; this text stays here</p></main>',
    '<main><p/>self closed paragraph<p>real paragraph with plenty of characters</p></main>',
    '<svg><circle/></svg><main><p>svg is blocked, but this block is kept intact</p></main>',
    '<main><p>linkish <a href="#">x</a\t> and the rest of a long paragraph here</p></main>',
    '<main><p data-x="1" checked>boolean attribute; the text is long enough too</p></main>',
    '<INPUT TYPE="checkbox" CHECKED/><main><P ID=V>uppercase tags with enough text here</P></main>',
    '<main><p>broken <p attr="unclosed',
    '<script>x</scriptmore>y</script><main><p>cdata terminator needed a real end tag</p></main>',
    '<main><h2><a href="/x">Linked Heading</a></h2><p>body text that is long enough</p></main>',
    '<div class="sidebar"><p>blocked sidebar text that would otherwise be kept</p></div>'
    '<main><p>kept main text with a sufficient number of characters in it</p></main>',
    "",
    "just plain text without any markup at all, long enough to be a block if wrapped",
    # marked sections terminate at ']]>' / ']>' in the stdlib, not the first
    # '>' — the fast scanner must fall back (ADVICE r2)
    '<main><p>before <![CDATA[a > b]]> after, with enough words to pass the length bar</p></main>',
    '<main><p><![if !IE]>cond<![endif]> plus plenty of ordinary text to clear the bar</p></main>',
    '<main><p><![CDATA[unterminated cdata and then a lot of trailing text here',
]


def test_fast_scanner_matches_stdlib_on_edge_cases():
    ex = H.HtmlMainContentExtractor()
    for case in EDGE_CASES:
        assert ex.extract(case) == _stdlib_extract(case), case[:60]


def test_fast_scanner_matches_stdlib_on_random_markup():
    rng = random.Random(123)
    tags = ["p", "div", "span", "li", "ul", "h2", "td", "tr", "table", "a",
            "main", "article", "nav", "script", "style", "br", "img"]
    words = ["alpha", "beta", "gamma", "&amp;", "&#65;", "delta epsilon zeta",
             "x < y", "quite a few more words to lengthen the text"]
    ex = H.HtmlMainContentExtractor()
    for _ in range(300):
        parts = []
        for _ in range(rng.randint(1, 30)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.35:
                attr = rng.choice(["", ' class="x"', ' class="sidebar"',
                                   " id=plain", ' href="/l"', " checked"])
                parts.append(f"<{t}{attr}>")
            elif r < 0.6:
                parts.append(f"</{t}>")
            elif r < 0.9:
                parts.append(rng.choice(words))
            else:
                parts.append(rng.choice(["<!-- c -->", "<", "<1bad>", "</ >",
                                         "<?pi?>", "<!DOCTYPE html>"]))
        doc = "".join(parts)
        assert ex.extract(doc) == _stdlib_extract(doc), doc[:80]


def test_fast_scanner_matches_stdlib_on_fixture_corpus():
    from pdfextraction_ray.fixtures import build_corpus_table
    from pdfextraction_ray.payload import KIND_HTML, decode_html, payload_kind

    table = build_corpus_table(400, seed=31)
    ex = H.HtmlMainContentExtractor()
    checked = 0
    for payload in table.column("html").to_pylist():
        if payload_kind(payload) != KIND_HTML:
            continue
        doc = decode_html(payload)
        assert ex.extract(doc) == _stdlib_extract(doc)
        checked += 1
    assert checked >= 100


def test_fast_scanner_matches_stdlib_on_adversarial_junk():
    """Character-soup fuzz targeting tokenizer edges (comment terminators,
    stray quotes/brackets, NULs, non-ASCII): 12,000 docs, exact parity."""
    junk = list("<>/&=\"' ;abpPmMdDiv!-?\n\t\x00é€") + [
        "script", "style", "main", "p", "amp;", "#65;", "--", "<!--", "-->",
        "--!>", "-- >"]
    ex = H.HtmlMainContentExtractor()
    for seed in (99, 7, 12345):
        rng = random.Random(seed)
        for _ in range(4000):
            doc = "".join(rng.choice(junk) for _ in range(rng.randint(0, 120)))
            assert ex.extract(doc) == _stdlib_extract(doc), doc[:80]
