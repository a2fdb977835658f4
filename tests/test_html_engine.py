"""Unit tests for the pure-Python extraction core.

Each test pins a semantic the reference implements (file:line cited in
the implementation docstrings), including the quirk-ledger behaviors
(SURVEY.md appendix) that must stay faithful.
"""

from web_scraper_spark.html.clean import (
    clean_html,
    clean_html_str,
    extract_images,
    extract_og_metadata,
    extract_text,
)
from web_scraper_spark.html.dom import parse_html
from web_scraper_spark.html.markdown import format_markdown_document, html_to_markdown


def test_drop_tags_removed():
    html = "<body><script>x()</script><p>keep</p><nav>menu</nav><aside>side</aside></body>"
    assert extract_text(html) == "keep"


def test_comments_removed():
    html = "<body><p>a</p><!-- secret --><p>b</p></body>"
    out = clean_html_str(html)
    assert "secret" not in out
    assert extract_text(html) == "a b"


def test_attr_whitelist():
    html = '<body><a href="/x" onclick="evil()" data-y="1" alt="t">link</a></body>'
    out = clean_html_str(html)
    assert 'href="/x"' in out
    assert "onclick" not in out and "data-y" not in out
    assert 'alt="t"' in out


def test_li_dedup_first_seen_and_empty_quirk():
    # Q13: first empty li kept, later empty dropped; duplicate text dropped.
    html = "<body><ul><li>a</li><li></li><li>a</li><li>b</li><li> </li></ul></body>"
    doc, _ = clean_html(html)
    lis = doc.find_all("li")
    texts = [li.get_text(strip=True) for li in lis]
    assert texts == ["a", "", "b"]


def test_span_cascade_into_last(idx=None):
    # Q7: run of adjacent spans accumulates left→right into the last.
    html = "<body><div><span>a</span><span>b</span><span>c</span></div></body>"
    doc, _ = clean_html(html)
    spans = doc.find_all("span")
    assert len(spans) == 1
    assert spans[0].get_text() == "a b c"


def test_span_cascade_skips_empty():
    html = "<body><div><span>a</span><span></span><span>c</span></div></body>"
    doc, _ = clean_html(html)
    spans = doc.find_all("span")
    # empty middle span breaks the merge chain: a stays, c stays
    assert [s.get_text(strip=True) for s in spans] == ["a", "", "c"]


def test_og_metadata():
    html = (
        '<head><meta property="og:title" content="T"/>'
        '<meta property="og:description" content="D"/>'
        '<meta property="og:image" content=""/></head>'
    )
    og = extract_og_metadata(parse_html(html))
    assert og == {"og_title": "T", "og_description": "D"}  # empty content skipped


def test_whitespace_normalized_in_text_nodes():
    html = "<body><p>  a   b \n\n c  </p></body>"
    assert extract_text(html) == "a b c"


def test_extract_images_urljoin_and_dims():
    html = (
        '<body><img src="/i.png" alt="A" width="10"/>'
        '<img src="https://cdn.x/y.jpg"/><img alt="nosrc"/></body>'
    )
    imgs = extract_images(html, "https://h.example/base/page")
    assert imgs == [
        {"url": "https://h.example/i.png", "alt": "A", "width": "10", "height": None},
        {"url": "https://cdn.x/y.jpg", "alt": "", "width": None, "height": None},
    ]


def test_markdown_main_content_cascade():
    html = "<body><p>outer</p><main><p>inner</p></main></body>"
    md = html_to_markdown(html)
    assert "inner" in md and "outer" not in md


def test_markdown_heading_and_duplication_quirk():
    # Q5: heading text re-emitted by the re-pushed text child.
    md = html_to_markdown("<body><h2>Title</h2></body>")
    assert "## Title" in md
    assert md.count("Title") == 2


def test_markdown_link_and_inline():
    md = html_to_markdown('<body><p>see <a href="/d">docs</a></p></body>')
    assert "[docs](/d)" in md
    # paragraph get_text(strip=True) joins segments with no separator
    assert "seedocs" in md


def test_markdown_code_backticks():
    assert "`x`" in html_to_markdown("<body><code>x</code></body>")
    assert "``a`b``" in html_to_markdown("<body><code>a`b</code></body>")


def test_markdown_pre_language_last_wins():
    html = '<body><pre class="language-python"><code class="language-sql">SELECT 1</code></pre></body>'
    md = html_to_markdown(html)
    assert "```sql\nSELECT 1\n```" in md


def test_markdown_pre_consumes_children():
    md = html_to_markdown("<body><pre><code>line</code></pre></body>")
    assert md.count("line") == 1


def test_markdown_list():
    md = html_to_markdown("<body><ol><li>a</li><li>b</li></ol></body>")
    assert "1. a\n2. b" in md


def test_markdown_table():
    html = "<body><table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table></body>"
    md = html_to_markdown(html)
    assert "| h1 | h2 |" in md
    assert "| --- | --- |" in md
    assert "| a | b |" in md


def test_markdown_blockquote():
    md = html_to_markdown("<body><blockquote>quoted words</blockquote></body>")
    assert "> quoted words" in md


def test_markdown_hr_br():
    md = html_to_markdown("<body><p>a</p><hr/><p>b</p></body>")
    assert "---" in md


def test_markdown_postprocess_newlines():
    md = html_to_markdown("<body><p>a</p><p>b</p><h2>c</h2></body>")
    assert "\n\n\n" not in md


def test_markdown_document_assembly():
    doc = format_markdown_document(
        title='A "quoted" title',
        url="https://h/x",
        content_html="<p>body</p>",
        date="2025-01-01",
        og_description='desc "q"',
    )
    assert doc.startswith("---\n")
    assert 'title: "A \\"quoted\\" title"' in doc
    assert 'source: "https://h/x"' in doc
    assert 'description: "desc \\"q\\""' in doc
    assert "Source: [https://h/x](https://h/x)" in doc


def test_markdown_document_error_path():
    doc = format_markdown_document("T", "https://h/x", "")
    assert doc.startswith("# Error: T")


def test_get_text_strip_join_semantics():
    # get_text(strip=True) joins stripped segments with no separator
    doc = parse_html("<li>a <b>b</b></li>")
    assert doc.find("li").get_text(strip=True) == "ab"
