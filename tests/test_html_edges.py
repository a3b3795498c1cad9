"""HTML extractor behavior on markup edge cases (beyond the golden snapshots):
entities, comments, nested containers, link-density boundaries, blocked-class
variants."""

from pdfextraction_ray.html_extract import extract_main_content


def test_entities_decoded():
    html = "<main><p>Fish &amp; chips cost &lt;5&gt; pounds at the corner shop.</p></main>"
    out = extract_main_content(html)
    assert "Fish & chips cost <5> pounds" in out["extracted_text"]


def test_comments_ignored():
    html = ("<main><p>Real paragraph content with plenty of characters here.</p>"
            "<!-- <p>commented out paragraph that should not appear</p> --></main>")
    out = extract_main_content(html)
    assert "commented out" not in out["extracted_text"]
    assert "Real paragraph" in out["extracted_text"]


def test_nested_main_article_no_double_count():
    html = ("<main><article><p>Body paragraph with more than twenty five chars.</p>"
            "</article></main>")
    out = extract_main_content(html)
    assert out["extracted_text"].count("Body paragraph") == 1


def test_link_density_boundary():
    text = "word " * 10  # 50 chars
    dense = f'<main><p><a href="/x">{text}</a></p></main>'          # density 1
    sparse = f'<main><p>{text}<a href="/x">link</a> {text}</p></main>'
    assert extract_main_content(dense)["extracted_text"] == ""
    assert extract_main_content(sparse)["extracted_text"] != ""


def test_heading_kept_despite_links():
    html = '<main><h2><a href="/x">Linked Heading</a></h2></main>'
    out = extract_main_content(html)
    assert out["extracted_text"] == "Linked Heading"
    assert out["spans"][0]["kind"] == "h2"


def test_blocked_class_and_id_variants():
    body = "Twenty five characters of body text or more right here."
    for marker in ('class="sidebar"', 'id="comments"', 'class="x promo-box y"',
                   'class="AD-banner"'):
        html = f"<div {marker}><p>{body}</p></div><main><p>{body}</p></main>"
        out = extract_main_content(html)
        assert out["extracted_text"].count(body[:20]) == 1, marker
    # similar-but-not-blocked class keeps content
    html = f'<div class="advanced"><p>{body}</p></div>'
    assert body[:20] in extract_main_content(html)["extracted_text"]


def test_table_inside_nav_still_captured_but_text_stripped():
    html = ('<nav><table><tr><th>H</th></tr><tr><td>v</td></tr></table></nav>'
            '<main><p>Body text paragraph with enough characters to be kept.</p></main>')
    out = extract_main_content(html)
    assert out["tables"] and out["tables"][0]["headers"] == ["H"]
    assert "v" not in out["extracted_text"]


def test_unclosed_everything():
    html = "<main><p>An unclosed paragraph with quite a few characters in it"
    out = extract_main_content(html)
    assert "unclosed paragraph" in out["extracted_text"]


def test_min_text_chars_tunable_changes_output():
    """Constructor thresholds must actually reach the parser (regression:
    they were stored but _close_node read the module constants)."""
    from pdfextraction_ray.html_extract import HtmlMainContentExtractor
    body = "Thirty-ish characters of text."  # 30 chars: >=25, <40
    html = f"<main><p>{body}</p></main>"
    assert body in HtmlMainContentExtractor().extract(html)["extracted_text"]
    strict = HtmlMainContentExtractor(min_text_chars=40).extract(html)
    assert strict["extracted_text"] == ""


def test_max_link_density_tunable_changes_output():
    from pdfextraction_ray.html_extract import HtmlMainContentExtractor
    linked = "linked anchor text chars"
    plain = "plain words here too"
    html = f'<main><p><a href="/x">{linked}</a> {plain}</p></main>'
    # ~55% link chars: dropped at the default 1/3 cap, kept at 0.9
    assert HtmlMainContentExtractor().extract(html)["extracted_text"] == ""
    loose = HtmlMainContentExtractor(max_link_density=0.9).extract(html)
    assert linked in loose["extracted_text"]
