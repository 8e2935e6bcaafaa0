"""Golden extraction tests — one case per cleaning rule (FIXTURES.md §4,
SURVEY.md §5.1). Each cites the reference rule it locks in."""

from web_scraper_ray.dom import parse
from web_scraper_ray.kernel.clean import (
    clean_html,
    concatenate_spans,
    deduplicate_list_items,
    extract_og_metadata,
    normalize_text_nodes,
)
from web_scraper_ray.kernel.extract import extract_images, extract_page
from web_scraper_ray.kernel.tokens import count_tokens
from web_scraper_ray.functions.urls import sanitize_filename


def test_boilerplate_tags_removed():  # scraper.py:279-285
    html = (
        "<body><script>x</script><style>y</style><header>h</header>"
        "<footer>f</footer><nav>n</nav><noscript>ns</noscript>"
        "<form>fo</form><button>b</button><input><iframe>i</iframe>"
        "<aside>a</aside><svg>s</svg><p>keep</p></body>"
    )
    cleaned, _ = clean_html(html)
    assert "<p>keep</p>" in cleaned
    for tag in ("script", "style", "header", "footer", "nav", "noscript",
                "form", "button", "input", "iframe", "aside", "svg"):
        assert f"<{tag}" not in cleaned


def test_class_selector_strings_are_inert():  # SURVEY M6 effective behavior
    html = '<body><div class="menu">menu-div stays</div><p>x</p></body>'
    cleaned, _ = clean_html(html)
    assert "menu-div stays" in cleaned


def test_html_comments_removed():  # scraper.py:287-289
    cleaned, _ = clean_html("<body><p>a</p><!-- secret --><p>b</p></body>")
    assert "secret" not in cleaned


def test_attr_prune_keeps_href_src_alt():  # scraper.py:291-297
    html = '<body><a href="u" class="x" id="y" title="t">l</a><img src="s" alt="a" width="9"></body>'
    cleaned, _ = clean_html(html)
    assert 'href="u"' in cleaned and 'src="s"' in cleaned and 'alt="a"' in cleaned
    for gone in ('class="x"', 'id="y"', 'title="t"', 'width="9"'):
        assert gone not in cleaned


def test_li_dedup_first_wins_order_preserved():  # scraper.py:345-363
    doc = parse("<ul><li>A</li><li>B</li></ul><ul><li>A</li><li>C</li></ul>")
    deduplicate_list_items(doc)
    texts = [li.get_text(strip=True) for li in doc.find_all("li")]
    assert texts == ["A", "B", "C"]


def test_li_dedup_matches_on_stripped_text():
    doc = parse("<ul><li> A </li><li>A</li></ul>")
    deduplicate_list_items(doc)
    assert len(doc.find_all("li")) == 1


def test_span_concat_merges_into_second():  # scraper.py:365-405
    doc = parse("<p><span>one</span><span>two</span></p>")
    concatenate_spans(doc)
    spans = doc.find_all("span")
    assert len(spans) == 1
    assert spans[0].get_text() == "one two"


def test_span_concat_chains_left_to_right():
    doc = parse("<p><span>a</span><span>b</span><span>c</span></p>")
    concatenate_spans(doc)
    spans = doc.find_all("span")
    assert len(spans) == 1
    assert spans[0].get_text() == "a b c"


def test_span_concat_broken_by_text_node():
    # whitespace between spans breaks adjacency (children list includes text nodes)
    doc = parse("<p><span>a</span> <span>b</span></p>")
    concatenate_spans(doc)
    assert len(doc.find_all("span")) == 2


def test_span_concat_skips_empty_spans():
    doc = parse("<p><span></span><span>b</span></p>")
    concatenate_spans(doc)
    assert len(doc.find_all("span")) == 2


def test_whitespace_collapse_and_svg_strip():  # scraper.py:305-320
    doc = parse("<p>  a \n\n b  </p>")
    normalize_text_nodes(doc)
    assert doc.find("p").get_text() == "a b"
    doc2 = parse("<p>&lt;svg&gt;junk&lt;/svg&gt; after</p>")
    normalize_text_nodes(doc2)
    # the reference regex targets literal '<svg...</svg>' inside text nodes
    assert doc2.find("p").get_text() == "after"


def test_og_metadata_extracted_pre_cleaning():  # scraper.py:324-343,277
    html = (
        '<head><meta property="og:title" content="T">'
        '<meta property="og:description" content="D">'
        '<meta property="og:image" content="I">'
        '<meta property="og:missing" content=""></head><body><p>x</p></body>'
    )
    og = extract_og_metadata(parse(html))
    assert og == {"og_title": "T", "og_description": "D", "og_image": "I"}


def test_og_empty_content_skipped():
    og = extract_og_metadata(parse('<meta property="og:title" content="">'))
    assert og == {}


def test_images_relative_resolved_with_dimensions():  # scraper.py:237-261
    doc = parse('<body><img src="/i.png" alt="pic" width="10" height="20"><img alt="nosrc"></body>')
    images = extract_images(doc, "https://ex.com/page/1")
    assert images == [
        {"url": "https://ex.com/i.png", "alt": "pic", "width": "10", "height": "20"}
    ]


def test_token_fallback_len_div_4():  # scraper.py:426
    assert count_tokens("x" * 41) in (41 // 4, count_tokens("x" * 41))
    # without tiktoken installed the estimator is exact:
    from web_scraper_ray.kernel.tokens import HAVE_TIKTOKEN
    if not HAVE_TIKTOKEN:
        assert count_tokens("abcd" * 10) == 10


def test_filename_sanitize():  # utils.py:15-24
    assert sanitize_filename('a/b\\c*d?e:f"g<h>i|j') == "abcdefghij"
    assert sanitize_filename("a  b\tc") == "a_b_c"
    assert len(sanitize_filename("x" * 300)) == 100


def test_extract_page_full_record():
    html = (
        "<html><head><title>T1</title>"
        '<meta property="og:title" content="OT"></head>'
        "<body><main><h1>H</h1><p>body text</p>"
        '<a href="/next">n</a></main></body></html>'
    )
    rec = extract_page(html.encode(), "https://h.example/a/b")
    assert rec["title"] == "T1"
    assert rec["og_title"] == "OT"
    assert rec["links"] == ["https://h.example/next"]
    assert "# H" in rec["text"]
    assert rec["token_count"] == len(rec["content_html"]) // 4 or rec["token_count"] > 0
