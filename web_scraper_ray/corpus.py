"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the tables described in FIXTURES.md — no external data, no
wall-clock, no unseeded randomness:

* ``pages``  — ``(url:string, warc_ts:timestamp[us], html:binary,
  text:string, lang:string)`` exactly per ``BASELINE.json.input_hint``.
  ``html`` is templated per URL and embeds every construct the cleaning
  kernel must handle plus ``<a href>`` out-links (the crawl graph);
  ``text`` is the extraction kernel's own output, computed at corpus
  build time — the byte-identical per-row oracle (SURVEY.md §5.2).
* ``seeds``  — ``(seed_index:int64, url:string)`` incl. invalid URLs and
  duplicates.
* ``robots`` — ``(host:string, disallow_prefixes:list<string>,
  crawl_delay_ms:int64)``.

Every per-page quantity derives from ``random.Random(f"{seed}:{i}")`` so
generation is order-independent and safely parallelizable (Ray is used
for the html+text columns when a session is available; the per-row
function is pure, so parallel == sequential output).

Host skew is Zipf-ish (``host_of``): a few hot hosts take a large share
of pages, exercising the frontier's hot-host handling.
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from .kernel.extract import extract_page

EPOCH = datetime(2025, 3, 28, 0, 0, 0)  # fixed; tz-naive like the testdata tables
KERNEL_V = 2  # bump when kernel output could change (invalidates corpus cache)
SECTIONS = ("articles", "tags", "category", "docs", "blog")
LANGS = ("en", "de", "fr", "es", "ja")

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data stream crawl frontier shard batch arrow parquet "
    "café naïve 東京 résumé Größe"  # unicode exercises utf-8 + entity paths
).split()

MAIN_CONTAINERS = (
    '<main>{body}</main>',
    '<article>{body}</article>',
    '<div id="content">{body}</div>',
    '<div class="content box">{body}</div>',
    '<div role="main">{body}</div>',
    '{body}',  # body-only fallback (markdown_formatter.py:110 chain tail)
)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def host_of(seed: int, i: int, n_hosts: int, zipf_s: float = 3.0) -> int:
    """Zipf-ish host index for page i: u**zipf_s concentrates mass on
    low host indices (hot hosts)."""
    u = (_h(f"{seed}:host:{i}") % (10 ** 9)) / 10 ** 9
    return int(n_hosts * (u ** zipf_s)) % n_hosts


def section_of(seed: int, i: int) -> str:
    return SECTIONS[_h(f"{seed}:sec:{i}") % len(SECTIONS)]


def url_of(seed: int, i: int, n_hosts: int, zipf_s: float = 3.0) -> str:
    h = host_of(seed, i, n_hosts, zipf_s)
    return f"https://host{h:04d}.example/{section_of(seed, i)}/{i:06d}"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def page_html(seed: int, i: int, n_pages: int, n_hosts: int,
              zipf_s: float = 3.0, links_per_page: int = 4) -> str:
    """Deterministic HTML for page i, embedding every kernel construct
    (FIXTURES.md §1) and the out-link edges of the crawl graph."""
    rng = random.Random(f"{seed}:{i}")
    url = url_of(seed, i, n_hosts, zipf_s)
    title = f"Page {i:06d} — {_sentence(rng, 3)}"

    # out-links: mix of absolute, relative, duplicate, off-corpus, ignorable
    n_links = rng.randrange(0, links_per_page + 2)
    links = []
    for _ in range(n_links):
        j = rng.randrange(n_pages)
        target = url_of(seed, j, n_hosts, zipf_s)
        kind = rng.randrange(6)
        if kind == 0:
            links.append(f"/{section_of(seed, j)}/{j:06d}" if target.split("/")[2] == url.split("/")[2] else target)
        elif kind == 1 and links:
            links.append(links[-1])  # duplicate edge
        elif kind == 2:
            links.append(f"https://offsite{rng.randrange(9)}.example/x/{j}")
        elif kind == 3:
            links.append(f"https://host{host_of(seed, j, n_hosts, zipf_s):04d}.example/tags/{j:06d}")
        else:
            links.append(target)
    link_html = "".join(
        f'<p>See <a href="{href}" data-track="x{k}">link {k}</a> for more.</p>'
        for k, href in enumerate(links)
    )

    dup_item = _sentence(rng, 2)
    items = [dup_item, _sentence(rng, 2), dup_item, _sentence(rng, 3)]
    li_html = "<ul>" + "".join(f"<li>{it}</li>" for it in items) + "</ul>"

    spans = f"<p><span>{_sentence(rng, 2)}</span><span>{_sentence(rng, 2)}</span> tail</p>"

    table = (
        "<table><tr><th>k</th><th>value column</th></tr>"
        f"<tr><td>{rng.randrange(100)}</td><td>{_sentence(rng, 2)}</td></tr>"
        f"<tr><td>{rng.randrange(100)}</td><td>{_sentence(rng, 2)}</td></tr></table>"
    )

    body = (
        f"<h1>{title}</h1>"
        f"<p class=\"lead\" data-x=\"1\">{_sentence(rng, 12)} &amp; more &lt;data&gt;</p>"
        f"<!-- generator comment {i} -->"
        f"<h2>Section {_sentence(rng, 1)}</h2>"
        f"<p>{_sentence(rng, 10)} <strong>{_sentence(rng, 2)}</strong> "
        f"<em>{_sentence(rng, 2)}</em> <code>x_{i % 97}</code></p>"
        f"{li_html}{spans}"
        f"<blockquote>{_sentence(rng, 8)}</blockquote>"
        f"<pre><code class=\"language-python\">print({i})</code></pre>"
        f"{table}"
        f"<img src=\"/static/img_{i % 17}.png\" alt=\"fig {i % 17}\" width=\"64\" height=\"48\">"
        f"{link_html}"
        f"<p>{_sentence(rng, 9)}</p>"
    )
    main = MAIN_CONTAINERS[i % len(MAIN_CONTAINERS)].format(body=body)

    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        f"<meta property=\"og:title\" content=\"{title}\">"
        f"<meta property=\"og:description\" content=\"{_sentence(rng, 6)}\">"
        f"<meta property=\"og:image\" content=\"https://cdn.example/og_{i % 31}.png\">"
        "<script>var x = 1;</script><style>.a{color:red}</style>"
        "</head><body>"
        "<header><nav><ul><li>Home</li><li>About</li></ul></nav></header>"
        "<aside>sidebar junk</aside>"
        f"{main}"
        "<form><input name=\"q\"><button>go</button></form>"
        "<svg><circle r=\"1\"/></svg>"
        "<footer>footer junk <noscript>enable js</noscript></footer>"
        "<iframe src=\"/ad\"></iframe>"
        "</body></html>"
    )


def build_page_rows(seed: int, lo: int, hi: int, n_pages: int, n_hosts: int,
                    zipf_s: float = 3.0, links_per_page: int = 4) -> pa.Table:
    """Rows [lo, hi) of the pages table, as an Arrow table."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(lo, hi):
        url = url_of(seed, i, n_hosts, zipf_s)
        html = page_html(seed, i, n_pages, n_hosts, zipf_s, links_per_page)
        rec = extract_page(html, url)
        urls.append(url)
        tss.append(EPOCH + _td(i))  # deterministic per-row offset, no now()
        htmls.append(html.encode("utf-8"))
        texts.append(rec["text"])
        langs.append(LANGS[_h(f"{seed}:lang:{url}") % len(LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _td(i: int):
    from datetime import timedelta

    return timedelta(seconds=i)


def build_seeds(seed: int, n_pages: int, n_hosts: int, n_seeds: int = 20,
                zipf_s: float = 3.0) -> pa.Table:
    """Seed list: valid corpus URLs + invalid + duplicate entries
    (FIXTURES.md §2)."""
    rng = random.Random(f"{seed}:seeds")
    rows = []
    for k in range(n_seeds):
        j = rng.randrange(n_pages)
        rows.append(url_of(seed, j, n_hosts, zipf_s))
    rows.append("not-a-url")  # no scheme/netloc → is_valid_url False
    rows.append("/relative/only")
    if rows:
        rows.append(rows[0])  # duplicate seed → seen-set exercise
    return pa.table(
        {
            "seed_index": pa.array(range(len(rows)), pa.int64()),
            "url": pa.array(rows, pa.string()),
        }
    )


def build_robots(seed: int, n_hosts: int) -> pa.Table:
    """Per-host robots rules (FIXTURES.md §3): every 7th host disallows
    ``/category/``; crawl delay deterministic in the host hash."""
    hosts, prefixes, delays = [], [], []
    for h in range(n_hosts):
        host = f"host{h:04d}.example"
        hosts.append(host)
        prefixes.append(["/category/"] if h % 7 == 0 else [])
        delays.append(int(_h(f"{seed}:delay:{host}") % 5) * 50)  # 0..200 ms
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow_prefixes": pa.array(prefixes, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, pa.int64()),
        }
    )


def build_corpus(
    out_dir: str,
    n_pages: int = 500,
    n_hosts: int = 50,
    seed: int = 42,
    zipf_s: float = 3.0,
    links_per_page: int = 4,
    n_seeds: int = 20,
    shard_rows: int = 20_000,
    use_ray: bool = False,
) -> str:
    """Write ``pages/`` (sharded parquet), ``seeds.parquet`` and
    ``robots.parquet`` under ``out_dir``. Idempotent: if a ``_DONE``
    marker with matching params exists, returns immediately (so bench
    reruns skip generation). With ``use_ray`` the html+text shards are
    built by Ray tasks (the per-row function is pure → identical output)."""
    marker = os.path.join(out_dir, "_DONE")
    # KERNEL_V invalidates cached corpora whenever the extraction kernel
    # changes in a way that could alter the text oracle column
    stamp = f"{n_pages}:{n_hosts}:{seed}:{zipf_s}:{links_per_page}:{n_seeds}:{KERNEL_V}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    # stamp mismatch or fresh dir: clear any stale shards so a smaller
    # regeneration can't leave old pages (with an outdated text oracle)
    # mixed into the corpus
    import shutil

    shutil.rmtree(os.path.join(out_dir, "pages"), ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)

    shards = [(lo, min(lo + shard_rows, n_pages)) for lo in range(0, n_pages, shard_rows)]
    if use_ray and len(shards) > 1:
        import ray

        @ray.remote
        def _shard(lo: int, hi: int) -> pa.Table:
            return build_page_rows(seed, lo, hi, n_pages, n_hosts, zipf_s, links_per_page)

        tables = ray.get([_shard.remote(lo, hi) for lo, hi in shards])
    else:
        tables = [
            build_page_rows(seed, lo, hi, n_pages, n_hosts, zipf_s, links_per_page)
            for lo, hi in shards
        ]
    for k, tbl in enumerate(tables):
        pq.write_table(
            tbl,
            os.path.join(out_dir, "pages", f"part-{k:05d}.parquet"),
            row_group_size=2048,  # html rows are wide; small row groups
        )
    pq.write_table(build_seeds(seed, n_pages, n_hosts, n_seeds, zipf_s),
                   os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(build_robots(seed, n_hosts),
                   os.path.join(out_dir, "robots.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir
