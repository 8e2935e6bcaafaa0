"""URL canonicalization + canonical-form deduplication.

Crawl frontiers meet the same resource under many spellings —
fragment suffixes, upper/lower case scheme or host, explicit default
ports, reordered query parameters. Deduplicating by a canonical form
collapses them BEFORE fetch (with the url gate, the cheapest place to
drop work) and is the first step of any recrawl/merge.

Canonical form (a superset of ``functions/urls.py:canonicalize_url``,
which the crawl admission applies per candidate; this one adds
query-parameter sorting and is vectorized for corpus-scale scans):

1. strip the fragment (``#...``);
2. lowercase scheme and host; strip an explicit default port
   (``:80`` for http, ``:443`` for https);
3. empty path → ``/``;
4. sort query parameters bytewise, dropping empty ``&&`` tokens; an
   empty query drops its ``?``.

A string without ``://`` is returned unchanged (not a fetchable URL —
callers gate validity upstream; the SQL twin mirrors the rule).

Ray-Data shape: canonicalization is one stateless vectorized pass
(pandas str kernels + an explode/sort/rejoin for the query params —
no per-row Python); :func:`canonical_dedup` then ships only
``(canonical, url)`` pairs through ONE coarse-bucketed decision
shuffle (never a group per distinct URL) and elects min(url) as each
canonical's representative. Text/html never rides the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonical form of a url column (module doc rules).
    Index-safe: computes on positions internally (the query-param
    explode/rejoin would otherwise merge params across rows sharing a
    duplicate index label), then restores the caller's index."""
    orig_index = urls.index
    urls = urls.reset_index(drop=True)
    u = urls.fillna("").astype(str)
    has_scheme = u.str.contains("://", regex=False)
    u0 = u.str.split("#", n=1).str[0]

    parts = u0.str.split("://", n=1)
    scheme = parts.str[0].str.lower()
    # .str[i] yields float64 NaN when NO row has the separator (e.g. a
    # one-row batch without '?'); fillna+astype pins object dtype so
    # the downstream .str kernels never see a float series. A missing
    # query and a trailing-'?' query are the same '' (both → no '?').
    rest = parts.str[1].fillna("").astype(object)

    qsplit = rest.str.split("?", n=1)
    hostpath = qsplit.str[0].fillna("").astype(object)
    query = qsplit.str[1].fillna("").astype(object)

    psplit = hostpath.str.split("/", n=1)
    host = psplit.str[0].fillna("").astype(object).str.lower()
    tail = psplit.str[1]
    path = np.where(tail.isna(), "/", "/" + tail.fillna("").astype(object))

    host = host.where(
        ~((scheme == "http") & host.str.endswith(":80")), host.str[:-3])
    host = host.where(
        ~((scheme == "https") & host.str.endswith(":443")), host.str[:-4])

    # query params: explode → drop empty tokens → bytewise sort within
    # each row → rejoin (vectorized; no per-row lambda)
    ex = query.str.split("&").explode()
    ex = ex[ex.notna() & (ex != "")].astype(object)
    if len(ex):
        sq = (ex.rename("tok").reset_index()
                .sort_values(["index", "tok"], kind="mergesort")
                .groupby("index", sort=False)["tok"].agg("&".join))
    else:
        sq = pd.Series([], dtype=object)
    qstr = pd.Series("", index=u.index, dtype=object)
    qstr.update("?" + sq)

    canon = scheme + "://" + host + path + qstr
    out = canon.where(has_scheme, u).rename(urls.name)
    out.index = orig_index
    return out


def canonical_dedup(
    ds: ray.data.Dataset,
    url_col: str = "url",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Collapse a url column by canonical form: one row per canonical
    URL with its representative spelling (bytewise-min original) and
    the variant count — ``(canonical, url, n_variants)``."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        canon = canonicalize_series(df[url_col])
        out = pd.DataFrame({"canonical": canon, url_col: df[url_col]})
        out["__bkt"] = (pd.util.hash_array(
            canon.to_numpy(dtype=object)).astype(np.int64)
            % np.int64(n_buckets))
        return out

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("canonical", sort=False).agg(
            url=(url_col, "min"), n_variants=(url_col, "size"))
        agg["n_variants"] = agg["n_variants"].astype("int64")
        return agg.reset_index()[["canonical", "url", "n_variants"]]

    return (ds.select_columns([url_col])
              .map_batches(slim, batch_format="pandas")
              .groupby("__bkt")
              .map_groups(elect, batch_format="pandas"))
