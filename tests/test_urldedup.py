"""URL canonicalization + canonical dedup (ops/urldedup.py). The
DuckDB value parity is pinned by test_queries_oracle.py
(canonical_urls); these are the rule-level unit checks."""

import pandas as pd

from web_scraper_ray.ops.urldedup import canonical_dedup, canonicalize_series


def test_canonicalize_rules():
    s = pd.Series([
        "https://A.Example:443/x?b=2&a=1#frag",  # all rules at once
        "https://a.example/x?a=1&b=2",           # already canonical
        "HTTP://a.example:80",                   # scheme case, :80, no path
        "not-a-url",                             # no :// → unchanged
        "https://a.example/x?",                  # empty query drops '?'
        "https://a.example/x?b&&a",              # empty tokens dropped
        "https://a.example/x?a=1?b=2",           # second '?' is data
        None,
    ])
    out = canonicalize_series(s).tolist()
    assert out == [
        "https://a.example/x?a=1&b=2",
        "https://a.example/x?a=1&b=2",
        "http://a.example/",
        "not-a-url",
        "https://a.example/x",
        "https://a.example/x?a&b",
        "https://a.example/x?a=1?b=2",
        "",
    ]


def test_canonicalize_idempotent():
    s = pd.Series([
        "https://A.Example:443/x?b=2&a=1#frag",
        "HTTP://a.example:80/p/q?z&y",
        "https://a.example/",
    ])
    once = canonicalize_series(s)
    twice = canonicalize_series(once)
    assert once.tolist() == twice.tolist()


def test_canonicalize_idempotent_fuzz():
    """Property: canonicalization is idempotent on arbitrary
    url-shaped strings (the crawl-admission invariant, extended to
    the query-sorting strong form)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.text(alphabet="abcZ09/?&=#:._-", max_size=25)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(frag, min_size=1, max_size=8))
    def check(parts):
        s = pd.Series(["https://Host.EX:443/" + "".join(parts),
                       "http://h:80" + "".join(parts)])
        once = canonicalize_series(s)
        assert canonicalize_series(once).tolist() == once.tolist()

    check()


def test_canonical_dedup_elects_min(ray_session):
    import ray.data

    ds = ray.data.from_items([
        {"url": "https://A.example/x#f"},
        {"url": "https://a.example/x"},
        {"url": "https://a.example/x?b=1&a=1"},
        {"url": "https://a.example/x?a=1&b=1"},
        {"url": "https://b.example/"},
    ])
    out = (canonical_dedup(ds).to_pandas()
           .sort_values("canonical").reset_index(drop=True))
    assert out["canonical"].tolist() == [
        "https://a.example/x",
        "https://a.example/x?a=1&b=1",
        "https://b.example/",
    ]
    # representative is the bytewise-min ORIGINAL spelling
    assert out["url"].tolist() == [
        "https://A.example/x#f",
        "https://a.example/x?a=1&b=1",
        "https://b.example/",
    ]
    assert out["n_variants"].tolist() == [2, 2, 1]


def test_canonicalize_duplicate_index_labels():
    """Rows sharing an index label canonicalize independently — the
    query-param explode/rejoin works on positions, not labels."""
    import pandas as pd

    from web_scraper_ray.ops.urldedup import canonicalize_series

    s = pd.Series(
        ["https://h.example/p?b=2&a=1", "https://h.example/q?d=4&c=3"],
        index=[0, 0],
    )
    out = canonicalize_series(s)
    assert list(out.index) == [0, 0]
    assert out.tolist() == [
        "https://h.example/p?a=1&b=2",
        "https://h.example/q?c=3&d=4",
    ]
