"""Markdown conversion golden tests — lock in the reference's traversal
semantics including its quirks (markdown_formatter.py:85-283)."""

from web_scraper_ray.kernel.markdown import format_markdown, html_to_markdown


def test_headings_and_blank_line_regex():  # markdown_formatter.py:155-159,126
    md = html_to_markdown("<body><p>intro</p><h2>Head</h2></body>")
    # blank line forced before heading
    assert "\n\n## Head" in md


def test_heading_text_duplicated_by_traversal():
    # handled elements do NOT skip children -> text emitted twice
    # (markdown_formatter.py:276-283; SURVEY.md M15 quirk)
    md = html_to_markdown("<body><h1>Only</h1></body>")
    assert md.count("Only") == 2


def test_inline_elements():  # markdown_formatter.py:166-192
    md = html_to_markdown('<body><p><a href="u">t</a> <strong>s</strong> <em>e</em></p></body>')
    assert "[t](u)" in md and "**s**" in md and "*e*" in md


def test_anchor_without_text_uses_href():
    md = html_to_markdown('<body><a href="u"></a></body>')
    assert "[u](u)" in md


def test_img_alt_default():  # markdown_formatter.py:171-175
    md = html_to_markdown('<body><img src="s.png"></body>')
    assert "![Image](s.png)" in md


def test_code_backtick_doubling():  # markdown_formatter.py:187-192
    md = html_to_markdown("<body><code>a`b</code></body>")
    assert "``a`b``" in md


def test_pre_language_class_detection():  # markdown_formatter.py:194-210
    md = html_to_markdown('<body><pre><code class="language-python">x=1</code></pre></body>')
    assert "```python\nx=1\n```" in md
    md2 = html_to_markdown('<body><pre class="language-js">y</pre></body>')
    assert "```js\ny\n```" in md2


def test_pre_children_skipped():
    md = html_to_markdown("<body><pre><code>z</code></pre></body>")
    # no duplicate emission and no stray backtick-inline form
    assert md.count("z") == 1


def test_blockquote_prefixing():  # markdown_formatter.py:212-217
    md = html_to_markdown("<body><blockquote>q line</blockquote></body>")
    assert "> q line" in md


def test_lists_markers_top_level_only():  # markdown_formatter.py:219-231
    md = html_to_markdown(
        "<body><ul><li>a<ul><li>inner</li></ul></li><li>b</li></ul>"
        "<ol><li>x</li><li>y</li></ol></body>"
    )
    assert "- ainner" in md  # nested li text folded into parent (get_text)
    assert "- b" in md
    assert "1. x" in md and "2. y" in md


def test_table_with_separator_rule():  # markdown_formatter.py:233-268
    md = html_to_markdown(
        "<body><table><tr><th>k</th><th>value col</th></tr>"
        "<tr><td>1</td><td>v</td></tr></table></body>"
    )
    assert "| k | value col |" in md
    assert "| --- | --------- |" in md  # max(3, len) dashes
    assert "| 1 | v |" in md


def test_hr_br():
    md = html_to_markdown("<body><p>a</p><hr><p>b</p></body>")
    assert "---" in md


def test_newline_collapse():  # markdown_formatter.py:123
    md = html_to_markdown("<body><p>a</p><br><br><br><p>b</p></body>")
    assert "\n\n\n" not in md


def test_main_content_chain():  # markdown_formatter.py:104-114
    assert "inmain" in html_to_markdown("<body><p>out</p><main><p>inmain</p></main></body>")
    assert "out" not in html_to_markdown("<body><p>out</p><main><p>inmain</p></main></body>")
    assert "art" in html_to_markdown("<body><article><p>art</p></article></body>")
    assert "idc" in html_to_markdown('<body><div id="content"><p>idc</p></div><p>no</p></body>')
    assert "clsc" in html_to_markdown('<body><div class="content wide"><p>clsc</p></div></body>')
    assert "rolem" in html_to_markdown('<body><div role="main"><p>rolem</p></div></body>')
    assert "plainbody" in html_to_markdown("<body><p>plainbody</p></body>")


def test_empty_html():
    assert html_to_markdown("") == ""


def test_format_markdown_envelope():  # markdown_formatter.py:27-83
    record = {
        "content": "<p>c</p>",
        "content_html": "<body><p>c</p></body>",
        "title": 'A "quoted" title',
        "url": "https://e.x/p",
        "date": "2025-03-28",
        "og_metadata": {"og_description": 'desc "q"'},
        "images": [{"url": "https://e.x/i.png", "alt": "pic"}],
    }
    md = format_markdown(record, include_images=True, image_map={"https://e.x/i.png": "/local/i.png"})
    assert md.startswith("---\n")
    assert 'title: "A \\"quoted\\" title"' in md
    assert 'source: "https://e.x/p"' in md
    assert 'description: "desc \\"q\\""' in md
    assert '# A "quoted" title' in md
    assert "Source: [https://e.x/p](https://e.x/p)" in md
    assert "## Images" in md
    assert "![pic](/local/i.png)" in md


def test_format_markdown_failure_record():  # markdown_formatter.py:29-30
    md = format_markdown({"title": "T", "url": "u", "content": ""})
    assert md == "# Error: T\n\nFailed to fetch content from u"


def test_markdown_roundtrip_equivalence():
    """The fast path (merge_adjacent_text + markdown_from_doc) must be
    byte-identical to the reference-faithful reparse path
    (html_to_markdown(serialize(cleaned))) — property-checked over a
    slice of the synthetic corpus + crafted adjacent-text cases."""
    from web_scraper_ray.corpus import page_html, url_of
    from web_scraper_ray.dom import merge_adjacent_text, parse
    from web_scraper_ray.kernel.clean import clean_document
    from web_scraper_ray.kernel.markdown import html_to_markdown, markdown_from_doc

    def both(html):
        doc, _ = clean_document(parse(html))
        serialized = doc.serialize()
        slow = html_to_markdown(serialized)
        merge_adjacent_text(doc)
        fast = markdown_from_doc(doc)
        return slow, fast

    for i in range(60):
        slow, fast = both(page_html(7, i, 200, 20))
        assert slow == fast, f"divergence at corpus page {i}"

    crafted = [
        # adjacent text nodes from span removal / li dedup paths
        "<body><p><span>a</span><span>b</span>tail</p></body>",
        "<body><ul><li>x</li><li>x</li></ul>after</body>",
        "<body><p>a &amp; b &lt;c&gt;</p><div></div></body>",
        "<body><pre><code>if x &lt; 2: pass</code></pre></body>",
        "<body>just text</body>",
        "",
    ]
    for html in crafted:
        if not html:
            continue
        slow, fast = both(html)
        assert slow == fast, f"divergence on {html!r}"


def test_post_regex_idempotence():
    """markdown_formatter.py:123-126 post-regexes are idempotent —
    re-running the converter's cleanup over its own output changes
    nothing (SURVEY.md §5.4)."""
    import re

    from web_scraper_ray.corpus import page_html, url_of
    from web_scraper_ray.kernel.extract import extract_page

    multi_nl = re.compile(r"\n{3,}")
    heading_gap = re.compile(r"([^\n])\n(#{1,6} )")
    for i in range(25):
        md = extract_page(page_html(3, i, 100, 10), url_of(3, i, 10))["text"]
        again = heading_gap.sub(r"\1\n\n\2", multi_nl.sub("\n\n", md))
        assert again == md, i
