"""DOM layer unit tests (web_scraper_ray/dom.py)."""

from web_scraper_ray.dom import CommentNode, Node, TextNode, parse


def test_parse_basic_tree():
    doc = parse("<div><p>hello <b>world</b></p></div>")
    div = doc.find("div")
    assert div is not None
    p = div.find("p")
    assert p.get_text() == "hello world"


def test_get_text_strip_matches_bs4_semantics():
    # bs4 get_text(strip=True) strips each string and drops empties,
    # joining with '' — "a " + "b" -> "ab"
    doc = parse("<p>a <b>b</b></p>")
    assert doc.find("p").get_text(strip=True) == "ab"
    assert doc.find("p").get_text() == "a b"


def test_void_elements_do_not_nest():
    doc = parse("<p>one<br>two<img src='x.png'>three</p>")
    p = doc.find("p")
    assert p.get_text() == "onetwothree"
    assert [c.name for c in p.children if c.name] == ["br", "img"]


def test_comments_are_text_subclass_like_bs4():
    doc = parse("<div><!-- note -->text</div>")
    comments = [n for n in doc.find_all(string=True) if isinstance(n, CommentNode)]
    assert len(comments) == 1
    assert comments[0].text == " note "
    # comments excluded from get_text (bs4 behavior)
    assert doc.find("div").get_text() == "text"


def test_entity_decoding_and_minimal_reescape():
    doc = parse("<p>a &amp; b &lt;c&gt;</p>")
    assert doc.find("p").get_text() == "a & b <c>"
    assert "a &amp; b &lt;c&gt;" in doc.serialize()


def test_attr_handling_and_class_multivalue():
    doc = parse('<div class="content box" id="main" data-x="1">t</div>')
    d = doc.find("div", {"class": "content"})
    assert d is not None
    assert doc.find("div", {"class": "box"}) is not None
    assert doc.find("div", {"class": "content box"}) is None  # token match only
    assert doc.find("div", {"id": "main"}) is d


def test_find_recursive_false():
    doc = parse("<ul><li>a<ul><li>nested</li></ul></li><li>b</li></ul>")
    ul = doc.find("ul")
    direct = ul.find_all("li", recursive=False)
    assert [li.get_text(strip=True).startswith(p) for li, p in zip(direct, ("a", "b"))]
    assert len(direct) == 2
    assert len(ul.find_all("li")) == 3


def test_decompose_and_replace_with():
    doc = parse("<div><span>x</span><p>keep</p></div>")
    doc.find("span").decompose()
    assert doc.find("span") is None
    doc.find("p").replace_with("plain")
    assert doc.find("div").get_text() == "plain"


def test_string_property_forwarding():
    doc = parse("<p><b>only</b></p>")
    assert doc.find("p").string == "only"
    doc2 = parse("<p>a<b>b</b></p>")
    assert doc2.find("p").string is None


def test_string_setter_replaces_children():
    doc = parse("<span><i>a</i>b</span>")
    span = doc.find("span")
    span.string = "new"
    assert span.get_text() == "new"
    assert len(span.children) == 1


def test_mismatched_end_tag_ignored():
    doc = parse("<div>a</span>b</div>")
    assert doc.find("div").get_text() == "ab"


def test_serialize_roundtrip_stable():
    html = '<div alt="a&quot;b"><p>x &amp; y</p><br/><img src="i.png" alt="z"/></div>'
    once = parse(html).serialize()
    twice = parse(once).serialize()
    assert once == twice


def test_valueless_attrs_normalize_to_empty_string():
    # bs4's html.parser builder stores <a href> as href="" (html.parser
    # itself yields None); the markdown kernel then renders [click]()
    doc = parse("<body><a href>click</a></body>")
    a = doc.find("a")
    assert a.get("href", "") == ""
    assert 'href=""' in doc.serialize()
    from web_scraper_ray.kernel.markdown import html_to_markdown

    assert "[click]()" in html_to_markdown("<body><p>x</p><a href>click</a></body>")
