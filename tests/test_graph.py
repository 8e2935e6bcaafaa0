"""Link-graph ops (ops/graph.py): edges, degrees, PageRank, top-indegree.

The PageRank gate is a sequential reference model (same fixed-point
integer arithmetic, plain dicts) — the engine must equal it exactly at
any bucket count, the same discipline test_crawl.py applies to the
frontier."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from web_scraper_ray.ops import graph


def _ref_pagerank(edges, iters=4, dp=85, scale=10**12):
    """Sequential twin of ops/graph.py:pagerank (dict arithmetic)."""
    edges = sorted(set(edges))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    base = (100 - dp) * scale // (100 * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iters):
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        dang_share = dang // n
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {v: base + dp * (incoming[v] + dang_share) // 100
                for v in nodes}
    return rank


_EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "e"),  # e is dangling
    ("f", "f"),              # self-loop, f also dangling-free
    ("g", "a"),              # g has out-link, no in-link
]


def _edges_ds(edges):
    return ray.data.from_pandas(pd.DataFrame(
        {"src": [s for s, _ in edges], "dst": [d for _, d in edges]}))


@pytest.mark.parametrize("mode,n_buckets", [("bucketed", 1),
                                            ("bucketed", 7),
                                            ("broadcast", 32)])
def test_pagerank_equals_sequential_model(ray_session, mode, n_buckets):
    got = graph.pagerank(_edges_ds(_EDGES), iters=4, mode=mode,
                         n_buckets=n_buckets).to_pandas()
    want = _ref_pagerank(_EDGES, iters=4)
    assert dict(zip(got["node"], got["pr"])) == want


def test_pagerank_bucketed_exact_above_2_53(ray_session):
    """Regression: bucketed fold must not roundtrip incoming sums
    through float64 — at scale=10**16 sums exceed 2^53 and a
    .map().fillna() lookup silently rounds them."""
    got = graph.pagerank(_edges_ds(_EDGES), iters=4, mode="bucketed",
                         scale=10**16, n_buckets=3).to_pandas()
    want = _ref_pagerank(_EDGES, iters=4, scale=10**16)
    assert dict(zip(got["node"], got["pr"])) == want


def test_pagerank_mass_conserved(ray_session):
    scale = 10**12
    got = graph.pagerank(_edges_ds(_EDGES), iters=3, scale=scale).to_pandas()
    # flooring leaks < 1 unit per node per division; mass stays ~scale
    assert abs(int(got["pr"].sum()) - scale) < 100 * len(got)


def test_pagerank_sink_beats_source(ray_session):
    got = graph.pagerank(_edges_ds(_EDGES), iters=4).to_pandas()
    pr = dict(zip(got["node"], got["pr"]))
    assert pr["c"] > pr["g"]  # c has 3 in-links, g has none


def _ref_hits(edges, iters=4, scale=10**12):
    """Sequential twin of ops/graph.py:hits."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: scale // n for v in nodes}

    def norm(raw):
        tot = sum(raw.values())
        return {v: (raw[v] * scale // tot if tot else 0) for v in raw}

    for _ in range(iters):
        ar = {v: 0 for v in nodes}
        for s, d in edges:
            ar[d] += hub[s]
        auth = norm(ar)
        hr = {v: 0 for v in nodes}
        for s, d in edges:
            hr[s] += auth[d]
        hub = norm(hr)
    return auth, hub


def test_hits_equals_sequential_model(ray_session):
    got = graph.hits(_edges_ds(_EDGES), iters=4).to_pandas()
    want_a, want_h = _ref_hits(_EDGES, iters=4)
    assert dict(zip(got["node"], got["auth"])) == want_a
    assert dict(zip(got["node"], got["hub"])) == want_h


def test_hits_bucketed_equals_broadcast(ray_session):
    """The 100-TB message-passing regime is bit-identical to the
    broadcast regime (same fixed-point arithmetic, different physical
    plan) — the pagerank regime-parity contract, extended to HITS."""
    b = graph.hits(_edges_ds(_EDGES), iters=4,
                   mode="broadcast").to_pandas()
    k = graph.hits(_edges_ds(_EDGES), iters=4, mode="bucketed",
                   n_buckets=3).to_pandas()
    bd = b.sort_values("node").reset_index(drop=True)
    kd = k.sort_values("node").reset_index(drop=True)
    assert bd["node"].tolist() == kd["node"].tolist()
    assert bd["auth"].tolist() == kd["auth"].tolist()
    assert bd["hub"].tolist() == kd["hub"].tolist()

    import pytest

    with pytest.raises(ValueError):
        graph.hits(_edges_ds(_EDGES), mode="nope").to_pandas()


def test_edges_with_outdeg_and_nodes(ray_session):
    ed = graph.edges_with_outdeg(_edges_ds(_EDGES)).to_pandas()
    assert dict(zip(ed["src"], ed["outdeg"]))["a"] == 2
    assert len(ed) == len(_EDGES)
    nodes = graph.graph_nodes(
        graph.edges_with_outdeg(_edges_ds(_EDGES))).to_pandas()
    deg = dict(zip(nodes["node"], nodes["outdeg"]))
    assert deg == {"a": 2, "b": 1, "c": 1, "d": 2, "e": 0,
                   "f": 1, "g": 1}


def test_host_components(ray_session):
    """Two link-connected host families + an isolated host: components
    equal a sequential union-find, with the min-md5 host as the
    canonical representative."""
    import hashlib

    urls = {h: f"https://{h}/p" for h in
            ["a.example", "b.example", "c.example",
             "d.example", "e.example", "f.example"]}
    edges = [
        (urls["a.example"], urls["b.example"]),
        (urls["b.example"], urls["c.example"]),   # {a,b,c}
        (urls["d.example"], urls["e.example"]),   # {d,e}
        (urls["f.example"], urls["f.example"]),   # self-link: isolated
    ]
    got = graph.host_components(_edges_ds(edges)).to_pandas()
    comp = dict(zip(got["host"], got["component"]))

    def md5i(h):
        return int.from_bytes(hashlib.md5(h.encode()).digest()[:8],
                              "big") >> 1

    rep_abc = min(["a.example", "b.example", "c.example"], key=md5i)
    rep_de = min(["d.example", "e.example"], key=md5i)
    assert comp == {"a.example": rep_abc, "b.example": rep_abc,
                    "c.example": rep_abc, "d.example": rep_de,
                    "e.example": rep_de, "f.example": "f.example"}


def test_top_indegree(ray_session):
    got = graph.top_indegree(_edges_ds(_EDGES), k=3).to_pandas()
    ref = (pd.DataFrame(_EDGES, columns=["src", "dst"])
           .groupby("dst").size().reset_index(name="indegree")
           .sort_values(["indegree", "dst"], ascending=[False, True]))
    assert list(got["node"]) == list(ref["dst"].head(3))
    assert list(got["indegree"]) == list(ref["indegree"].head(3))


def test_anchor_texts_order_and_multiplicity(ray_session, tmp_path):
    """Anchors fold per target in (src, in-page position) order;
    duplicate links keep their multiplicity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        {"url": "https://a.example/1",
         "html": ('<a href="/t">first</a><a href="/t">second</a>'
                  '<a href="https://b.example/x">cross</a>')},
        {"url": "https://b.example/2",
         "html": '<a href="https://a.example/t">other-site</a>'},
    ]
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(pa.table({
        "url": [r["url"] for r in rows],
        "html": [r["html"].encode() for r in rows]}), d / "p.parquet")
    got = graph.anchor_texts(str(d)).to_pandas().set_index("dst")
    assert got.loc["https://a.example/t", "anchors"] == (
        "first\nsecond\nother-site")
    assert got.loc["https://a.example/t", "n_anchors"] == 3
    assert got.loc["https://b.example/x", "anchors"] == "cross"


def test_link_edges_on_corpus(ray_session, tmp_path):
    """Kernel-extracted edges equal a regex pass over the same HTML
    (the SQL oracle's derivation) — per-page distinct, absolute."""
    import re

    from web_scraper_ray.corpus import build_corpus

    out = str(tmp_path / "corpus")
    build_corpus(out, n_pages=60, n_hosts=6, seed=7, n_seeds=10,
                 links_per_page=5, use_ray=False)
    got = graph.link_edges(f"{out}/pages").to_pandas()
    pages = pd.concat([
        pd.read_parquet(f) for f in
        sorted((tmp_path / "corpus" / "pages").glob("*.parquet"))
    ])
    want = set()
    for url, html in zip(pages["url"], pages["html"]):
        scheme_host = url.split("/", 3)
        for href in re.findall(r'<a href="([^"]+)"',
                               bytes(html).decode()):
            absu = href if "://" in href else (
                scheme_host[0] + "//" + scheme_host[2] + href)
            want.add((url, absu))
    assert set(zip(got["src"], got["dst"])) == want


def test_graph_from_crawl_output_parity(ray_session, tmp_path):
    """The production path (edges/anchors read off the crawl's round
    outputs — the links/anchors columns the extraction pass already
    materialized) equals the standalone second-parse path
    (link_edges/anchor_texts over raw pages) restricted to the fetched
    pages. This is what lets pagerank/anchor corpora run WITHOUT
    re-parsing the corpus DOM."""
    import pyarrow.parquet as pq

    from web_scraper_ray.corpus import build_corpus
    from web_scraper_ray.crawl import CrawlConfig, run_crawl

    corpus = str(tmp_path / "corpus")
    build_corpus(corpus, n_pages=80, n_hosts=8, seed=11, n_seeds=12,
                 links_per_page=5, use_ray=False)
    ckpt = str(tmp_path / "ckpt")
    run_crawl(f"{corpus}/pages", f"{corpus}/seeds.parquet", ckpt,
              robots_path=f"{corpus}/robots.parquet",
              config=CrawlConfig(max_depth=2))

    files = graph._crawl_output_files(ckpt)
    assert files
    fetched = set()
    for f in files:
        fetched.update(pq.read_table(f, columns=["url"])
                       .column("url").to_pylist())
    assert fetched  # the crawl fetched something

    # edges: from-output == page-derived, restricted to fetched srcs
    got = graph.edges_from_output(ckpt).to_pandas()
    full = graph.link_edges(f"{corpus}/pages").to_pandas()
    want = {(s, d) for s, d in zip(full["src"], full["dst"])
            if s in fetched}
    assert set(zip(got["src"], got["dst"])) == want
    assert len(got) == len(want)  # distinct, no dup rows

    # anchors: from-output == page-derived restricted to fetched srcs
    got_a = (graph.anchors_from_output(ckpt).to_pandas()
             .sort_values("dst").reset_index(drop=True))
    pages_fetched = ray.data.read_parquet(
        f"{corpus}/pages", columns=["url", "html"]).filter(
        lambda r: r["url"] in fetched)
    import web_scraper_ray.ops.graph as g

    # rebuild the page-derived anchor corpus over ONLY fetched pages
    # by writing them to a scratch dir (anchor_texts takes a path)
    sub_dir = tmp_path / "fetched_pages"
    sub_dir.mkdir()
    pages_fetched.write_parquet(str(sub_dir))
    want_a = (g.anchor_texts(str(sub_dir)).to_pandas()
              .sort_values("dst").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_a, want_a)
