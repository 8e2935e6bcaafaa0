"""Ray-Data-native URL-frontier + fetch scheduler.

Implements EXACTLY the crawl semantics of the sequential spec in
``model.py`` (see its docstring for the contract), re-expressed as
streaming Dataset rounds (SURVEY.md §3.4, §7.6). Each round is ONE
Dataset execution with ONE all-to-all shuffle:

    pages corpus scan → fetch-join against the admitted frontier
      → map_batches(extract_batch)  [frontier meta riding as columns]
      → in-pipeline output_r parquet write (idempotent per-batch files)
      → flat_map link candidates (validity / ignore / robots filters)
      → host-bucket groupby fusing [in-round dedup → seen-shard screen
        → virtual-time assignment]
      → frontier_{r+1} parquet sink

so extraction, the output write, discovery, and the admission shuffle
all overlap under the streaming executor, and the corpus is scanned
exactly once per round.

The fusion is legal because every candidate URL of one host lands in
that host's hash bucket (bucket = f(host), url → host is a function),
so url-dedup, the seen anti-join, and the per-host politeness scan all
see complete groups in a single shuffle. Virtual times for round r+1
are a pure function of state known at the end of round r (per-host
admitted counts × crawl delay), so they are precomputed into the
frontier file — this is what makes the crawl order independent of
physical parallelism AND keeps the per-round shuffle count at one
(SURVEY.md §7 "hard parts" #2).

Determinism at any parallelism (SURVEY.md §4.2):
* virtual time is a pure function of crawl history, never wall-clock;
* in-round duplicate discovery is resolved by ``min`` over the parent's
  full crawl-order tuple + link index — identical to "first discovery
  in sequential crawl order";
* the crawl order itself is the deterministic sort
  ``(round, vt, priority, pvt, pli, url)`` of the admitted tables — no
  global integer rank is ever materialized (ranks don't distribute;
  the sort key does).

Checkpoint/resume (north rule): every round writes ``output_r`` +
``frontier_{r+1}`` (and ``admitted_r`` when a ``max_pages`` budget
truncates) and then an atomically-renamed ``manifest_r.json`` (lineage,
row counts, cumulative per-host admitted counts). ``seen`` is exactly
the union of all frontier files — adds happen only at frontier creation
— so resume rebuilds the seen shards by STREAMING those files through
``SeenSet.add_dataset`` (never a driver-side URL list), restores host
counters from the last manifest, and continues at the first round
without a manifest.

Driver-state discipline (the 10^10-frontier contract): the round loop
never materializes a round in one process. Per-round driver state is
O(#hosts) (the cumulative politeness counters, also persisted in the
manifest) plus scalars:

* frontier row counts come from parquet FOOTER METADATA, not data;
* budget truncation is a distributed ``sort(ORDER_KEYS).limit(K)``;
* per-host admitted counts are per-batch ``value_counts`` partials
  (combiner pattern) merged on the driver — #hosts rows, never #urls;
* the frontier's (priority, vt, pvt, pli) ride the fetch-join as
  COLUMNS through extraction into discovery — there is no url→meta
  broadcast dict anywhere.

Scale notes (10^10 frontier, SURVEY.md §7):
* The fetch-join is pluggable (CrawlConfig.fetch_join): ``broadcast``
  loads the round's admitted table (url + meta, no html) into the
  object store from a Ray task — the driver never holds it — and each
  fetch task does a vectorized ``index_in`` lookup per batch (zero
  shuffle, right until a round outgrows one node's object store);
  ``bucketed`` is the implemented 10^10-scale path — a partitioned
  hash join co-locating corpus and (html-less) frontier rows by
  ``url_hash64(url) % B`` in one groupby, so the admitted set never
  resides in ANY single process; ``indexed`` is the SPARSE regime —
  a hash-sorted corpus layout with a row-group range index
  (sources/hashindex.py, built once per corpus) lets a small round
  read only the row groups containing admitted urls instead of
  scanning the corpus. All three produce byte-identical crawls
  (test_bucketed_fetch_join_parity, test_indexed_fetch_join_parity).
  In a live deployment the corpus scan is replaced by an actor-pool
  HTTP fetcher and no join exists at all.
* Hot hosts serialize only their *ordering* (a vectorized per-host
  cumcount inside the bucket task), not their fetches; a host with k
  candidates costs O(k log k) in one task — salt ``host#chunk`` for
  queue storage and keep a single budget key if a host ever exceeds one
  task's memory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.urls import (
    canonicalize_url,
    extract_host,
    is_valid_url,
    matches_ignore_patterns,
    url_hash64,
)
from ..stages.extract_stage import extract_batch
from ..vhash import hash64_str
from .config import CrawlConfig
from .robots import RobotsRules
from .seen import SeenSet

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int64()),
        ("pvt", pa.float64()),
        ("pli", pa.int64()),
        # winner-key: parent's own ordering tuple (for in-round dedup)
        ("w_pri", pa.int64()),
        ("w_pvt", pa.float64()),
        ("w_pli", pa.int64()),
        ("w_canon", pa.string()),
        ("bucket", pa.int64()),
    ]
)

FRONTIER_COLUMNS = ["url", "host", "priority", "pvt", "pli", "vt"]
ORDER_KEYS = ["vt", "priority", "pvt", "pli", "url"]
#: frontier metadata that rides the fetch-join → extraction → discovery
META_COLUMNS = ["priority", "vt", "pvt", "pli"]


def _n_buckets() -> int:
    """Admission shuffle width: ~2 reduce tasks per core, floor 16.
    The bucket VALUE for a url is ``url_hash64(host) % _n_buckets()``, so
    it must stay constant within one crawl (it does: cluster size is
    fixed for a run; resume on a different size is safe because buckets
    only shape task granularity, never semantics)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(16, 2 * cpus) if cpus else 64


class CrawlResult:
    def __init__(self, checkpoint_dir: str, rounds: int, n_admitted: int, n_fetched: int,
                 seen: SeenSet):
        self.checkpoint_dir = checkpoint_dir
        self.rounds = rounds
        self.n_admitted = n_admitted
        self.n_fetched = n_fetched
        self.seen = seen


# --------------------------------------------------------------------------
# candidate construction

def _candidate_table(rows: dict) -> pa.Table:
    return pa.table({n: pa.array(rows[n], CANDIDATE_SCHEMA.field(n).type)
                     for n in CANDIDATE_SCHEMA.names})


def _new_rows() -> dict:
    return {n: [] for n in CANDIDATE_SCHEMA.names}


def _push_candidate(rows: dict, canon: str, priority: int, pvt: float, pli: int,
                    w_pri: int, w_pvt: float, w_pli: int, w_canon: str,
                    n_buckets: int) -> None:
    host = extract_host(canon)
    rows["url"].append(canon)
    rows["host"].append(host)
    rows["priority"].append(priority)
    rows["pvt"].append(pvt)
    rows["pli"].append(pli)
    rows["w_pri"].append(w_pri)
    rows["w_pvt"].append(w_pvt)
    rows["w_pli"].append(w_pli)
    rows["w_canon"].append(w_canon)
    rows["bucket"].append(url_hash64(host) % n_buckets)


def _seed_candidates(seeds_path: str, robots_ref, config: CrawlConfig) -> ray.data.Dataset:
    # Size the seed read by FOOTER row count: Ray's default parallelism
    # splits even a few-MB seed table into ~2 blocks/CPU, and the seed
    # round (the only execution with no corpus scan to hide behind) then
    # pays pure dispatch tax — 64 map + 64 sort-reduce tasks whose
    # remote work is milliseconds (measured 5.7s -> 1.8s at 42k seeds,
    # 32 CPUs). ~8k rows/block keeps one block per task worth of real
    # work; huge seed tables still fan out to 2 blocks/CPU. Block count
    # is physical granularity only — crawl bytes are parallelism-
    # independent (tests/test_crawl.py cross-parallelism gates).
    try:
        if os.path.isdir(seeds_path):
            n_rows = _dir_num_rows(seeds_path)
        else:
            n_rows = pq.read_metadata(seeds_path).num_rows
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 32
        blocks = max(1, min(2 * cpus, -(-n_rows // 8192)))
        ds = ray.data.read_parquet(seeds_path, override_num_blocks=blocks)
    except Exception:
        ds = ray.data.read_parquet(seeds_path)
    n_buckets = _n_buckets()  # driver-side: one consistent value per run

    def to_cands(batch: pa.Table) -> pa.Table:
        robots: RobotsRules = ray.get(robots_ref)
        urls = batch["url"].to_pylist()
        idxs = batch["seed_index"].to_pylist()
        pris = (
            batch["priority"].to_pylist()
            if "priority" in batch.schema.names
            else [0] * batch.num_rows
        )
        rows = _new_rows()
        for url, sidx, pri in zip(urls, idxs, pris):
            if not is_valid_url(url):
                continue
            canon = canonicalize_url(url)
            if matches_ignore_patterns(canon, config.ignore_patterns):
                continue
            if config.respect_robots and not robots.is_allowed(canon):
                continue
            _push_candidate(rows, canon, int(pri), -1.0, int(sidx), 0, -1.0, 0, "",
                            n_buckets)
        return _candidate_table(rows)

    return ds.map_batches(to_cands, batch_format="pyarrow")


def _link_candidates(
    output_ds: ray.data.Dataset, robots_ref, config: CrawlConfig
) -> ray.data.Dataset:
    """Fetched round output → next-round candidate rows (discovery).
    Parent ordering metadata arrives as COLUMNS on the slim output
    (META_COLUMNS) — no url→meta broadcast dict exists."""
    n_buckets = _n_buckets()  # driver-side: one consistent value per run

    def expand(batch: pa.Table) -> pa.Table:
        robots: RobotsRules = ray.get(robots_ref)
        rows = _new_rows()
        for url, links, p_pri, p_vt, p_pvt, p_pli in zip(
            batch["url"].to_pylist(),
            batch["links"].to_pylist(),
            batch["priority"].to_pylist(),
            batch["vt"].to_pylist(),
            batch["pvt"].to_pylist(),
            batch["pli"].to_pylist(),
        ):
            for li, link in enumerate(links or ()):
                if not is_valid_url(link):
                    continue
                canon = canonicalize_url(link)
                if matches_ignore_patterns(canon, config.ignore_patterns):
                    continue
                if config.respect_robots and not robots.is_allowed(canon):
                    continue
                _push_candidate(rows, canon, p_pri, p_vt, li, p_pri, p_pvt, p_pli, url,
                                n_buckets)
        return _candidate_table(rows)

    return output_ds.map_batches(expand, batch_format="pyarrow")


@ray.remote(num_cpus=0)
class _HostBases:
    """Cumulative per-host admitted counts (the politeness bases),
    held in ONE actor and updated by the driver with per-round DELTAS —
    replacing a per-round ``ray.put`` of the full (growing) dict.
    Admission bucket tasks query only THEIR hosts' counts, so the
    state crossing the wire per round is O(round's hosts), not
    O(all hosts ever seen)."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def update(self, delta: dict) -> None:
        for h, c in delta.items():
            self.counts[h] = self.counts.get(h, 0) + c

    def get(self, hosts: list) -> list:
        return [self.counts.get(h, 0) for h in hosts]

    def all(self) -> dict:
        # full snapshot — only the opt-in ranked-politeness mode needs
        # it (its two-pass rank broadcasts the bases dict)
        return dict(self.counts)


# --------------------------------------------------------------------------
# the fused per-bucket admission stage

#: the in-round dedup winner ordering (bucket_admit step 1): for one
#: url, "first discovery in sequential crawl order" = min of this key
_DEDUP_SORT = ["url", "pvt", "w_pri", "w_pvt", "w_pli", "w_canon", "pli"]


def _precombine(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch candidate combiner BEFORE the admission shuffle: keep
    only each url's min-winner-key row within the batch. Correct because
    min is associative — the batch winner is the only row of its batch
    that can be the global winner, and bucket_admit re-applies the same
    ordering across batches. Cuts shuffle rows by the in-batch dup
    factor (links repeat heavily within a page neighborhood)."""
    return df.sort_values(_DEDUP_SORT, kind="mergesort").drop_duplicates(
        subset=["url"], keep="first"
    )


def _admit(cands: ray.data.Dataset, seen: SeenSet, bases_actor, robots_ref,
           assign_vt: bool = True) -> ray.data.Dataset:
    """ONE shuffle: host-bucket groupby fusing in-round dedup, seen-shard
    anti-join, and per-host virtual-time assignment (see module doc).
    With ``assign_vt=False`` the vt step is skipped (the ranked
    politeness mode assigns it afterwards, ranked_politeness.py)."""
    shard_handles = seen.shard_handles()
    n_shards = seen.n_shards
    cands = cands.map_batches(_precombine, batch_format="pandas")

    def bucket_admit(g: pd.DataFrame) -> pd.DataFrame:
        # 1. in-round dedup: min winner key per url == first discovery
        #    in sequential crawl order (model.py step 4)
        g = g.sort_values(_DEDUP_SORT, kind="mergesort").drop_duplicates(
            subset=["url"], keep="first"
        )

        # 2. seen anti-join: batched check_and_add on the shard actors
        urls = g["url"].tolist()
        routed: dict[int, list[str]] = {}
        for u in urls:
            routed.setdefault(url_hash64(u) % n_shards, []).append(u)
        futures = {sid: shard_handles[sid].check_and_add.remote(us)
                   for sid, us in routed.items()}
        results = {sid: ray.get(f) for sid, f in futures.items()}
        cursors = {sid: 0 for sid in routed}
        mask = []
        for u in urls:
            sid = url_hash64(u) % n_shards
            mask.append(results[sid][cursors[sid]])
            cursors[sid] += 1
        g = g.loc[mask]
        if len(g) == 0:
            cols = [("url", "object"), ("host", "object"), ("priority", "int64"),
                    ("pvt", "float64"), ("pli", "int64")]
            if assign_vt:
                cols.append(("vt", "float64"))
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols})

        if not assign_vt:
            return g[["url", "host", "priority", "pvt", "pli"]].copy()

        # 3. politeness: k-th candidate of host (ordered by priority,
        #    pvt, pli, url) gets vt = (base + k) * delay (model.py step 1)
        robots: RobotsRules = ray.get(robots_ref)
        g = g.sort_values(["host", "priority", "pvt", "pli", "url"], kind="mergesort")
        k = g.groupby("host", sort=False).cumcount()
        # only THIS bucket's hosts cross the wire (delta-actor bases)
        hosts_u = g["host"].unique().tolist()
        bases = dict(zip(hosts_u,
                         ray.get(bases_actor.get.remote(hosts_u))))
        base = g["host"].map(lambda h: bases.get(h, 0))
        delay = g["host"].map(robots.delay_ms)
        g = g[["url", "host", "priority", "pvt", "pli"]].copy()
        g["vt"] = ((base + k) * delay).astype(float)
        return g

    return cands.groupby("bucket").map_groups(bucket_admit, batch_format="pandas")


def _apply_url_gate(cands: ray.data.Dataset,
                    gate_kwargs: dict) -> ray.data.Dataset:
    """CrawlConfig.url_gate: one stateless vectorized verdict pass
    (ops/urlgate.py) over the CANDIDATE stream — before the admission
    shuffle, the seen set, and the fetch, so a dropped url costs one
    string scan and nothing downstream (the RefinedWeb pre-fetch
    position, the highest-leverage place to filter). Candidate columns
    ride through unchanged; only the keep mask is applied."""
    from ..ops.urlgate import url_gate_frame

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        verdict = url_gate_frame(df[["url"]].copy(), **gate_kwargs)
        return df.loc[verdict["kept"].to_numpy() == 1]

    return cands.map_batches(gate, batch_format="pandas")


def _admit_with_mode(cands: ray.data.Dataset, seen: SeenSet, bases_actor,
                     robots_ref, robots: RobotsRules,
                     config: CrawlConfig) -> ray.data.Dataset:
    """Dispatch between the fused bucket politeness (default; one host =
    one vectorized task) and the range-partitioned two-pass rank
    (politeness_mode='ranked' — hosts may span blocks; the giant-host
    path, ranked_politeness.py). The optional URL pre-fetch gate runs
    first — both discovery sites (seeds, link expansion) feed through
    here, so the gate screens every candidate exactly once."""
    if config.url_gate is not None:
        cands = _apply_url_gate(cands, config.url_gate)
    if config.politeness_mode == "ranked":
        from .ranked_politeness import assign_virtual_time_ranked

        screened = _admit(cands, seen, bases_actor, robots_ref,
                          assign_vt=False)
        bases = ray.get(bases_actor.all.remote())
        return assign_virtual_time_ranked(screened, bases, robots)
    return _admit(cands, seen, bases_actor, robots_ref)


# --------------------------------------------------------------------------
# fetch + extract

@ray.remote(num_cpus=0)
def _load_admitted(adm_dir: str) -> pa.Table:
    """Broadcast-side load for the broadcast fetch-join: runs as a Ray
    TASK so the admitted table (url + META_COLUMNS, no html) lands in
    the shared-memory object store, never on the driver. Downstream
    tasks ``ray.get`` it zero-copy."""
    return pq.read_table(adm_dir, columns=["url"] + META_COLUMNS)


def _bucketed_fetch_join(pages: ray.data.Dataset,
                         adm_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Partitioned hash join: pages ⋈ admitted on url, co-located by
    ``url_hash64(url) % B``. The frontier side ships only
    (url, META_COLUMNS) — no html — so the shuffle payload beyond the
    corpus scan itself is negligible; the corpus side moves once (the
    price of not holding the admitted set in any single process)."""
    n_buckets = _n_buckets()

    # bucket ids come from the vectorized stable hash (vhash.py) on
    # BOTH sides — any stable function of the url works here (buckets
    # only co-locate the two sides; the merge key is the url itself)

    def tag_frontier(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "url": batch["url"],
                "html": pa.array([b""] * n, pa.binary()),
                "side": pa.array(["f"] * n, pa.string()),
                "bucket": pa.array(
                    hash64_str(batch["url"]) % n_buckets, pa.int64()
                ),
                "priority": batch["priority"],
                "vt": batch["vt"],
                "pvt": batch["pvt"],
                "pli": batch["pli"],
            }
        )

    def tag_pages(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "url": batch["url"],
                "html": pc.cast(batch["html"], pa.binary()),
                "side": pa.array(["p"] * n, pa.string()),
                "bucket": pa.array(
                    hash64_str(batch["url"]) % n_buckets, pa.int64()
                ),
                "priority": pa.array([0] * n, pa.int64()),
                "vt": pa.array([0.0] * n, pa.float64()),
                "pvt": pa.array([0.0] * n, pa.float64()),
                "pli": pa.array([0] * n, pa.int64()),
            }
        )

    both = pages.map_batches(tag_pages, batch_format="pyarrow").union(
        adm_ds.map_batches(tag_frontier, batch_format="pyarrow")
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        f = g.loc[g["side"] == "f", ["url"] + META_COLUMNS]
        p = g.loc[g["side"] == "p", ["url", "html"]]
        return p.merge(f, on="url", how="inner")

    return both.groupby("bucket").map_groups(join_group, batch_format="pandas")


class _MetaCarryingFetcher:
    """Live-mode fetch actor: wraps any fetcher class (optionally
    behind the token-bucket ``RateLimiter`` via ``ThrottledFetcher``)
    and carries the frontier's META_COLUMNS through positionally —
    legal because every fetcher contract is 1:1 and order-preserving.
    This is the "actor-pool HTTP fetcher replaces the corpus scan"
    deployment shape the scan modes stand in for."""

    def __init__(self, inner_cls=None, limiter=None, sleep=None,
                 errors_dir: Optional[str] = None, **inner_kwargs):
        from ..stages.fetch import ThrottledFetcher

        if limiter is not None:
            self.inner = ThrottledFetcher(inner_cls=inner_cls, limiter=limiter,
                                          sleep=sleep, **inner_kwargs)
        else:
            self.inner = inner_cls(**inner_kwargs)
        self.errors_dir = errors_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.inner(batch.select(["url"]))
        keep = pc.equal(out["status"], "fetched")
        # un-fetched rows (error/miss) must not vanish: the URL is
        # already in the seen set (admission-time add), so a dropped
        # transient failure would be a PERMANENT silent page loss.
        # They are recorded per round (idempotent content-named file);
        # a re-crawl/requeue policy reads errors_* instead of guessing.
        lost = out.filter(pc.invert(keep))
        if self.errors_dir and lost.num_rows:
            import hashlib

            urls = lost["url"].to_pylist()
            name = hashlib.blake2b(
                f"{urls[0]}|{urls[-1]}|{lost.num_rows}".encode(), digest_size=8
            ).hexdigest()
            os.makedirs(self.errors_dir, exist_ok=True)
            pq.write_table(lost.select(["url", "status", "error"]),
                           os.path.join(self.errors_dir, f"err-{name}.parquet"))
        fetched = pa.table({"url": out["url"], "html": out["html"]})
        for c in META_COLUMNS:
            fetched = fetched.append_column(c, batch[c])
        return fetched.filter(keep)


def _live_fetch(adm_dir: str, config: CrawlConfig, fetcher_cls=None,
                fetcher_kwargs: Optional[dict] = None,
                rate_limiter=None,
                errors_dir: Optional[str] = None) -> ray.data.Dataset:
    """Live fetch path (fetch_join="live"): the admitted frontier is
    READ as a Dataset and streamed straight into the fetch actor pool —
    no corpus join exists at all. With a corpus-backed fetcher this is
    byte-identical to the scan modes (test_live_fetch_mode_parity);
    with ``HttpFetcher`` + ``rate_limiter`` it is the real deployment.
    Un-fetched rows land in ``errors_dir`` (see _MetaCarryingFetcher)."""
    adm = ray.data.read_parquet(adm_dir, columns=["url"] + META_COLUMNS)
    return adm.map_batches(
        _MetaCarryingFetcher,
        batch_format="pyarrow",
        batch_size=config.fetch_batch_size,
        concurrency=config.fetch_concurrency,
        fn_constructor_kwargs=dict(
            inner_cls=fetcher_cls, limiter=rate_limiter,
            errors_dir=errors_dir, **(fetcher_kwargs or {}),
        ),
    )


def _live_requeue_fetch(adm_dir: str, config: CrawlConfig, fetcher_cls,
                        fetcher_kwargs: Optional[dict], rate_limiter,
                        errors_dir: Optional[str] = None) -> ray.data.Dataset:
    """Live fetch via the NON-BLOCKING defer/requeue loop
    (``CrawlConfig.live_requeue``): each admission round fetches every
    currently-grantable row and re-queues throttled ones, so hosts
    drain independently (stages/fetch.py:fetch_with_requeue — a slow
    host's tokens never idle a pool actor). The frontier's ordering
    metadata is re-attached afterwards by a broadcast ``index_in``
    lookup against the admitted table (the keep_admitted shape) —
    legal because the admitted url set is exactly the fetch input.
    Un-fetched (miss/error) rows land in ``errors_dir`` under the same
    never-drop policy as the blocking path."""
    from ..stages.fetch import fetch_with_requeue

    kwargs = dict(fetcher_kwargs or {})
    sleep = kwargs.pop("sleep", None)  # injectable clock (tests)
    adm_urls = ray.data.read_parquet(adm_dir, columns=["url"])
    fetched, _rounds = fetch_with_requeue(
        adm_urls, fetcher_cls=fetcher_cls, limiter=rate_limiter,
        sleep=sleep, concurrency=config.fetch_concurrency,
        batch_size=config.fetch_batch_size, **kwargs)
    adm_ref = _load_admitted.remote(adm_dir)

    def attach_meta(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["status"], "fetched")
        lost = batch.filter(pc.invert(keep))
        if errors_dir and lost.num_rows:
            import hashlib

            urls = lost["url"].to_pylist()
            name = hashlib.blake2b(
                f"{urls[0]}|{urls[-1]}|{lost.num_rows}".encode(),
                digest_size=8).hexdigest()
            os.makedirs(errors_dir, exist_ok=True)
            pq.write_table(lost.select(["url", "status", "error"]),
                           os.path.join(errors_dir, f"err-{name}.parquet"))
        sel = batch.filter(keep)
        adm: pa.Table = ray.get(adm_ref)  # zero-copy plasma read
        idx = pc.index_in(sel["url"], value_set=adm["url"])
        meta = adm.take(idx)
        out = {"url": sel["url"], "html": sel["html"]}
        for c in META_COLUMNS:
            out[c] = meta[c]
        return pa.table(out)

    return fetched.map_batches(attach_meta, batch_format="pyarrow")


def _extract_with_meta(batch: pa.Table) -> pa.Table:
    """Extraction kernel with the frontier metadata columns riding
    through (extract_batch is 1:1 and order-preserving)."""
    out = extract_batch(batch)
    for c in META_COLUMNS:
        out = out.append_column(c, batch[c])
    return out


def _fetch_and_extract(
    pages_path: str, adm_dir: str, round_no: int, odir: str,
    join_mode: str = "broadcast",
    config: CrawlConfig = CrawlConfig(),
    fetcher_cls=None, fetcher_kwargs: Optional[dict] = None,
    rate_limiter=None,
) -> ray.data.Dataset:
    """Corpus-backed fetch: one pass over the pages table restricted to
    the round's admitted URL set, then the extraction kernel. A live
    deployment swaps this scan for an actor-pool HTTP fetcher; the scan
    is the offline stand-in (module doc, scale notes).

    The admitted frontier is consumed FROM PARQUET (``adm_dir``) —
    never from a driver-resident table — and its ordering metadata
    (META_COLUMNS) rides the join output as columns so extraction and
    discovery need no side-channel lookup.

    Two join strategies (CrawlConfig.fetch_join):

    * ``broadcast`` (default): a Ray task loads the admitted table into
      the object store once; each fetch task does one vectorized
      ``pc.index_in`` per batch (filter + meta gather, zero shuffle).
      Right whenever the round's url+meta table fits one node's object
      store.
    * ``bucketed``: the 10^10-scale path — corpus and (html-less)
      frontier rows co-locate via one ``groupby(bucket)`` and join
      inside each group. The admitted set never lives in one process;
      cost is an all-to-all of the corpus scan, which is why broadcast
      is preferred until the frontier outgrows a node.

    The round output parquet is written INSIDE the pipeline (one file
    per extracted batch, content-derived idempotent names, so task
    retries overwrite rather than duplicate) and only the slim
    ``(url, links, META_COLUMNS)`` table flows on to the discovery
    stages — one execution and one corpus pass per round, with
    extraction, the write, and discovery all overlapped by the
    streaming executor."""
    from ..pipelines.flagship import _default_blocks

    shutil.rmtree(odir, ignore_errors=True)  # crashed-attempt leftovers
    os.makedirs(odir, exist_ok=True)

    if join_mode == "live":
        if fetcher_cls is None:
            # offline default: the deterministic corpus-backed fetcher.
            # TEST/SANDBOX ONLY — each fetch actor loads the whole
            # corpus dict (CorpusFetcher docstring); a large-corpus
            # offline run belongs on the scan modes, and a real live
            # deployment passes HttpFetcher (no corpus at all).
            from ..stages.fetch import CorpusFetcher

            fetcher_cls = CorpusFetcher
            fetcher_kwargs = dict(fetcher_kwargs or {}, pages_path=pages_path)
        if config.live_requeue and rate_limiter is not None:
            fetched = _live_requeue_fetch(
                adm_dir, config, fetcher_cls, fetcher_kwargs, rate_limiter,
                errors_dir=os.path.join(odir, "errors"))
        else:
            fetched = _live_fetch(adm_dir, config, fetcher_cls,
                                  fetcher_kwargs, rate_limiter,
                                  errors_dir=os.path.join(odir, "errors"))
        extracted = fetched.map_batches(_extract_with_meta,
                                        batch_format="pyarrow", batch_size=256)
        return _write_and_slim_stage(extracted, round_no, odir)

    if join_mode == "bucketed":
        pages = ray.data.read_parquet(pages_path, columns=["url", "html"],
                                      override_num_blocks=_default_blocks())
        adm_ds = ray.data.read_parquet(adm_dir, columns=["url"] + META_COLUMNS)
        fetched = _bucketed_fetch_join(pages, adm_ds)
    else:
        adm_ref = _load_admitted.remote(adm_dir)

        def keep_admitted(batch: pa.Table) -> pa.Table:
            adm: pa.Table = ray.get(adm_ref)  # zero-copy plasma read
            idx = pc.index_in(batch["url"], value_set=adm["url"])
            mask = pc.is_valid(idx)
            sel = batch.filter(mask)
            meta = adm.take(pc.filter(idx, mask))
            out = {"url": sel["url"], "html": sel["html"]}
            for c in META_COLUMNS:
                out[c] = meta[c]
            return pa.table(out)

        if join_mode == "indexed":
            # sparse point-lookup regime: hash-sorted corpus layout +
            # row-group range index (built once per corpus, cached);
            # the round reads ONLY the row groups containing admitted
            # urls instead of scanning the corpus. Right when the
            # round is small relative to the corpus (refetch/repair
            # rounds, tail crawls); the scan modes stay right for
            # dense rounds (sources/hashindex.py cost model).
            from ..sources.hashindex import build_hash_index, hash_lookup

            index_dir = config.index_dir or os.path.join(
                os.path.dirname(pages_path.rstrip("/")) or ".",
                "pages_hidx")
            idx_dir = build_hash_index(pages_path, "url", index_dir,
                                       columns=["url", "html"])
            adm_urls = ray.data.read_parquet(adm_dir, columns=["url"])
            pages = hash_lookup(idx_dir, adm_urls, "url",
                                columns=["url", "html"])
        else:
            pages = ray.data.read_parquet(
                pages_path, columns=["url", "html"],
                override_num_blocks=_default_blocks())

        fetched = pages.map_batches(keep_admitted, batch_format="pyarrow")
    extracted = fetched.map_batches(_extract_with_meta, batch_format="pyarrow",
                                    batch_size=256)
    return _write_and_slim_stage(extracted, round_no, odir)


def _write_and_slim_stage(extracted: ray.data.Dataset, round_no: int,
                          odir: str) -> ray.data.Dataset:
    """In-pipeline round-output write: one idempotent content-named
    parquet file per extracted batch, then only the slim
    (url, links, META_COLUMNS) table flows on to discovery."""
    slim_cols = ["url", "links"] + META_COLUMNS
    from ..stages.extract_stage import EXTRACT_SCHEMA

    full_cols = list(EXTRACT_SCHEMA.names) + ["vt"]

    def write_and_slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "url": pa.array([], pa.string()),
                "links": pa.array([], pa.list_(pa.string())),
                "priority": pa.array([], pa.int64()),
                "vt": pa.array([], pa.float64()),
                "pvt": pa.array([], pa.float64()),
                "pli": pa.array([], pa.int64()),
            })
        urls = batch["url"].to_pylist()
        full = batch.select(full_cols).append_column(
            "depth", pa.array([round_no] * batch.num_rows, pa.int64())
        )
        import hashlib

        name = hashlib.blake2b(
            f"{urls[0]}|{urls[-1]}|{batch.num_rows}".encode(), digest_size=8
        ).hexdigest()
        pq.write_table(full, os.path.join(odir, f"part-{name}.parquet"))
        return batch.select(slim_cols)

    # batch_size=2048 coalesces the write: extraction upstream runs at
    # 256 rows/batch (wide html), but one parquet file per 256-row
    # batch means ~8× the files, footers, and open/close syscalls per
    # round — the batcher re-buffers the already-slim extracted rows
    # (text, not html) to ~2k rows per file at ~no memory cost.
    return extracted.map_batches(write_and_slim, batch_format="pyarrow",
                                 batch_size=2048)


# --------------------------------------------------------------------------
# checkpoint helpers

def _manifest_path(ckpt: str, r: int) -> str:
    return os.path.join(ckpt, f"manifest_{r:04d}.json")


def _write_manifest(ckpt: str, r: int, payload: dict) -> None:
    tmp = _manifest_path(ckpt, r) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(ckpt, r))  # atomic completion marker


def _complete_rounds(ckpt: str) -> list[int]:
    rounds = []
    r = 0
    while os.path.exists(_manifest_path(ckpt, r)):
        rounds.append(r)
        r += 1
    return rounds


def _read_dir(ckpt: str, name: str, columns=None) -> Optional[pa.Table]:
    path = os.path.join(ckpt, name)
    if os.path.isdir(path) and os.listdir(path):
        return pq.read_table(path, columns=columns)
    return None


def _parquet_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [os.path.join(path, f) for f in sorted(os.listdir(path))
            if f.endswith(".parquet")]


def _dir_num_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata only — no data is read,
    no table is materialized (the 10^10-frontier discipline)."""
    return sum(pq.read_metadata(f).num_rows for f in _parquet_files(path))


@ray.remote(num_cpus=0.5)
def _file_host_counts(path: str) -> dict[str, int]:
    """value_counts of one parquet file's ``host`` column — a combiner
    partial of size #hosts, never #urls."""
    vc = pc.value_counts(pq.read_table(path, columns=["host"])["host"].combine_chunks())
    return dict(zip(vc.field("values").to_pylist(),
                    (int(c) for c in vc.field("counts").to_pylist())))


def _host_count_delta(path: str) -> dict[str, int]:
    """Per-host admitted counts for one frontier/admitted directory:
    one lightweight Ray task per file (parallel column read →
    ``value_counts`` partial), merged on the driver — the driver sees
    #hosts rows, never #urls. Plain tasks, not a Dataset execution:
    this runs once per round between pipelines, and the streaming
    executor's fixed startup would otherwise be a per-round barrier
    tax (BASELINE.md, BFS-barrier floor)."""
    files = _parquet_files(path)
    if not files:
        return {}
    delta: dict[str, int] = {}
    for part in ray.get([_file_host_counts.remote(f) for f in files]):
        for h, n in part.items():
            delta[h] = delta.get(h, 0) + n
    return delta


def crawl_order_ds(checkpoint_dir: str) -> "ray.data.Dataset":
    """The crawl ordering as a (distributed) Dataset: per-round admitted
    tables, sorted by the deterministic order key — the scale-path twin
    of :func:`load_crawl_order` (which materializes a DataFrame for
    tests/inspection)."""
    parts = []
    for r in _complete_rounds(checkpoint_dir):
        name = f"admitted_{r:04d}"
        path = os.path.join(checkpoint_dir, name)
        if not (os.path.isdir(path) and os.listdir(path)):
            path = os.path.join(checkpoint_dir, f"frontier_{r:04d}")
        if os.path.isdir(path) and os.listdir(path):
            ds = ray.data.read_parquet(path)
            ds = ds.map_batches(
                lambda t, _r=r: t.append_column(
                    "round", pa.array([_r] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
            parts.append(ds)
    if not parts:
        return ray.data.from_items([])
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.sort(["round"] + ORDER_KEYS)


def load_crawl_order(checkpoint_dir: str) -> pd.DataFrame:
    """The deterministic crawl ordering: admitted tables sorted by
    (round, vt, priority, pvt, pli, url). Driver-side (test/inspection
    helper); at scale consume the per-round parquet as a Dataset."""
    frames = []
    for r in _complete_rounds(checkpoint_dir):
        tbl = _read_dir(checkpoint_dir, f"admitted_{r:04d}") # budget mode
        if tbl is None:
            tbl = _read_dir(checkpoint_dir, f"frontier_{r:04d}")
        if tbl is not None and tbl.num_rows:
            df = tbl.to_pandas()
            df["round"] = r
            frames.append(df)
    if not frames:
        return pd.DataFrame(columns=["round"] + ORDER_KEYS)
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["round"] + ORDER_KEYS, kind="mergesort").reset_index(drop=True)


# --------------------------------------------------------------------------
# main loop

def run_crawl(
    pages_path: str,
    seeds_path: str,
    checkpoint_dir: str,
    robots_path: Optional[str] = None,
    config: CrawlConfig = CrawlConfig(),
    resume: bool = False,
    fetcher_cls=None,
    fetcher_kwargs: Optional[dict] = None,
    rate_limiter=None,
) -> CrawlResult:
    """Run (or resume) the frontier crawl. See module docstring.

    With ``config.fetch_join="live"`` the corpus scan is replaced by an
    actor-pool fetcher (``fetcher_cls``, default the corpus-backed
    offline fetcher; pass ``stages.fetch.HttpFetcher`` + a
    ``rate_limiter`` for a real deployment — the limiter binds per-host
    politeness across the whole pool)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    robots = (
        RobotsRules.from_parquet(robots_path, config.default_crawl_delay_ms)
        if robots_path
        else RobotsRules.empty(config.default_crawl_delay_ms)
    )
    robots_ref = ray.put(robots)
    seen = SeenSet(config.seen_shards)
    # politeness bases live in a delta-updated actor: the driver sends
    # each round's per-host DELTA, never re-ships the full dict
    bases_actor = _HostBases.remote()

    host_counts: dict[str, int] = {}
    pages_budget = config.max_pages
    start_round = 0
    total_admitted = 0
    total_fetched = 0
    # per-host counts of the NEXT round's frontier, computed where the
    # frontier is written so the loop head needs no extra pass (None →
    # recompute, e.g. on resume or after budget truncation)
    pending_delta: Optional[dict[str, int]] = None

    done_rounds = _complete_rounds(checkpoint_dir) if resume else []
    if done_rounds:
        last = done_rounds[-1]
        with open(_manifest_path(checkpoint_dir, last)) as f:
            m = json.load(f)
        host_counts = dict(m["host_counts"])
        ray.get(bases_actor.update.remote(host_counts))  # restore bases
        total_admitted = m["total_admitted"]
        total_fetched = m["total_fetched"]
        if pages_budget is not None:
            pages_budget -= total_admitted
        # seen = union of all frontier files written so far (incl. next):
        # STREAMED through the shard actors, never a driver URL list
        frontier_files = [
            f
            for r in range(last + 2)
            for f in _parquet_files(
                os.path.join(checkpoint_dir, f"frontier_{r:04d}")
            )
        ]
        if frontier_files:
            seen.add_dataset(
                ray.data.read_parquet(frontier_files, columns=["url"])
            )
        start_round = last + 1
    else:
        # Round 0 discovery: seeds → fused admit → frontier_0 (with vt)
        cands = _seed_candidates(seeds_path, robots_ref, config)
        frontier0 = _admit_with_mode(cands, seen, bases_actor, robots_ref,
                                     robots, config)
        fdir0 = os.path.join(checkpoint_dir, "frontier_0000")
        shutil.rmtree(fdir0, ignore_errors=True)  # crashed-attempt leftovers
        frontier0.write_parquet(fdir0)
        seen.commit_round()
        pending_delta = _host_count_delta(fdir0)

    for r in range(start_round, config.max_depth + 1):
        if pages_budget is not None and pages_budget <= 0:
            break
        fdir = os.path.join(checkpoint_dir, f"frontier_{r:04d}")
        n_frontier = _dir_num_rows(fdir)
        if n_frontier == 0:
            break
        t0 = time.time()

        # budget truncation: DISTRIBUTED crawl-order sort + limit
        if pages_budget is not None and n_frontier > pages_budget:
            adir = os.path.join(checkpoint_dir, f"admitted_{r:04d}")
            shutil.rmtree(adir, ignore_errors=True)
            os.makedirs(adir, exist_ok=True)
            (
                ray.data.read_parquet(fdir, columns=FRONTIER_COLUMNS)
                .sort(ORDER_KEYS)
                .limit(pages_budget)
                .write_parquet(adir)
            )
            adm_dir = adir
            n_admitted = _dir_num_rows(adir)
            delta = _host_count_delta(adir)  # truncation changed the set
        else:
            adm_dir = fdir
            n_admitted = n_frontier
            delta = pending_delta if pending_delta is not None else _host_count_delta(fdir)
        pending_delta = None
        for h, c in delta.items():
            host_counts[h] = host_counts.get(h, 0) + c
        # awaited: admission tasks later this round must see the delta
        ray.get(bases_actor.update.remote(delta))
        if pages_budget is not None:
            pages_budget -= n_admitted

        # ONE execution per round: corpus scan → fetch-join → extract
        # (+ in-pipeline output write) → discovery → fused admit →
        # next frontier
        odir = os.path.join(checkpoint_dir, f"output_{r:04d}")
        out_slim = _fetch_and_extract(pages_path, adm_dir, r, odir,
                                      join_mode=config.fetch_join,
                                      config=config, fetcher_cls=fetcher_cls,
                                      fetcher_kwargs=fetcher_kwargs,
                                      rate_limiter=rate_limiter)
        n_next = 0
        if r < config.max_depth:
            cands = _link_candidates(out_slim, robots_ref, config)
            nxt = _admit_with_mode(cands, seen, bases_actor, robots_ref,
                                   robots, config)
            ndir = os.path.join(checkpoint_dir, f"frontier_{r + 1:04d}")
            shutil.rmtree(ndir, ignore_errors=True)  # crashed-attempt leftovers
            nxt.write_parquet(ndir)
            seen.commit_round()  # frontier durable -> fold pending adds
            # next round's host delta + row count in one tiny host-column
            # pass (also serves as the write barrier check)
            pending_delta = _host_count_delta(ndir)
            n_next = sum(pending_delta.values())
        else:
            # no expansion: consume the pipeline to drive the writes
            out_slim.map_batches(
                lambda t: t.select(["url"]), batch_format="pyarrow"
            ).count()
        n_fetched = sum(
            pq.read_metadata(f).num_rows for f in _parquet_files(odir)
        )

        total_admitted += n_admitted
        total_fetched += n_fetched

        _write_manifest(checkpoint_dir, r, {
            "round": r,
            "n_admitted": n_admitted,
            "n_fetched": n_fetched,
            "n_next_frontier": n_next,
            "host_counts": host_counts,
            "total_admitted": total_admitted,
            "total_fetched": total_fetched,
            "elapsed_s": time.time() - t0,
        })
        if n_next == 0:
            break

    return CrawlResult(checkpoint_dir, len(_complete_rounds(checkpoint_dir)),
                       total_admitted, total_fetched, seen)
