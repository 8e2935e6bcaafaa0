"""Ray-Data-native URL-frontier + fetch scheduler.

Implements EXACTLY the crawl semantics of the sequential spec in
``model.py`` (see its docstring for the contract), re-expressed as
streaming Dataset rounds (SURVEY.md §3.4, §7.6):

    frontier_r (parquet)                                  [candidates]
      → groupby(host).map_groups(virtual-time assignment) [politeness]
      → (sort + limit when max_pages)                     [priority]
      → fetch-join against the pages corpus               [fetch]
      → map_batches(extract_batch)                        [extraction]
      → flat_map links + filters                          [discovery]
      → groupby(url) min-winner dedup                     [in-round dedup]
      → seen-shard actors check_and_add                   [anti-join]
      → frontier_{r+1} (parquet)

Determinism at any parallelism (SURVEY.md §4.2):
* virtual time is a pure function of crawl history (per-host admitted
  counts × crawl delay), never wall-clock;
* in-round duplicate discovery is resolved by ``min`` over the parent's
  full crawl-order tuple + link index — identical to "first discovery
  in sequential crawl order";
* the crawl order itself is the deterministic sort
  ``(round, vt, priority, pvt, pli, url)`` of the admitted tables — no
  global integer rank is ever materialized (ranks don't distribute;
  the sort key does).

Checkpoint/resume (north rule): every round writes
``frontier_{r+1}`` + ``admitted_r`` + ``output_r`` parquet dirs and then
an atomically-renamed ``manifest_r.json`` (lineage + row counts +
cumulative per-host admitted counts). ``seen`` is exactly the union of
all frontier files — adds happen only at frontier creation — so resume
rebuilds the seen shards from those files, restores host counters from
the last manifest, and continues at the first round without a manifest.

Scale notes (10^10 frontier, SURVEY.md §7):
* The per-round fetch-join broadcasts the round's admitted URL set
  (``ray.put`` once, ``pyarrow.compute.is_in`` per batch). That is the
  small-side-broadcast pattern; when a round outgrows driver memory the
  documented path is the bucketed merge join (hash(url) % B buckets on
  both sides, per-bucket ``map_groups``), which this layout already
  supports because every table carries the url hash bucket implicitly.
* Hot hosts serialize only their *ordering* (a per-host sort inside
  ``map_groups``), not their fetches; a host with k candidates costs
  O(k log k) in one task — salt ``host#chunk`` for storage and keep a
  single budget key if a host ever exceeds one task's memory.
"""

from __future__ import annotations

import json
import os
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
)
from ..stages.extract_stage import extract_batch
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
    ]
)

ORDER_KEYS = ["vt", "priority", "pvt", "pli", "url"]


def _empty_candidates() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in CANDIDATE_SCHEMA})


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

def _seed_candidates(seeds_path: str, robots_ref, config: CrawlConfig) -> ray.data.Dataset:
    ds = ray.data.read_parquet(seeds_path)

    def to_cands(batch: pa.Table) -> pa.Table:
        robots: RobotsRules = ray.get(robots_ref)
        urls = batch["url"].to_pylist()
        idxs = batch["seed_index"].to_pylist()
        pris = (
            batch["priority"].to_pylist()
            if "priority" in batch.schema.names
            else [0] * batch.num_rows
        )
        rows = {n: [] for n in CANDIDATE_SCHEMA.names}
        for url, sidx, pri in zip(urls, idxs, pris):
            if not is_valid_url(url):
                continue
            canon = canonicalize_url(url)
            if matches_ignore_patterns(canon, config.ignore_patterns):
                continue
            if config.respect_robots and not robots.is_allowed(canon):
                continue
            rows["url"].append(canon)
            rows["host"].append(extract_host(canon))
            rows["priority"].append(int(pri))
            rows["pvt"].append(-1.0)
            rows["pli"].append(int(sidx))
            rows["w_pri"].append(0)
            rows["w_pvt"].append(-1.0)
            rows["w_pli"].append(0)
            rows["w_canon"].append("")
        return pa.table({n: pa.array(rows[n], CANDIDATE_SCHEMA.field(n).type)
                         for n in CANDIDATE_SCHEMA.names})

    return ds.map_batches(to_cands, batch_format="pyarrow")


def _link_candidates(
    output_ds: ray.data.Dataset, meta_ref, robots_ref, config: CrawlConfig
) -> ray.data.Dataset:
    """Fetched round output → next-round candidate rows (discovery)."""

    def expand(batch: pa.Table) -> pa.Table:
        meta: dict = ray.get(meta_ref)  # url -> (priority, vt, pvt, pli)
        robots: RobotsRules = ray.get(robots_ref)
        rows = {n: [] for n in CANDIDATE_SCHEMA.names}
        for url, links in zip(batch["url"].to_pylist(), batch["links"].to_pylist()):
            p_pri, p_vt, p_pvt, p_pli = meta[url]
            for li, link in enumerate(links or ()):
                if not is_valid_url(link):
                    continue
                canon = canonicalize_url(link)
                if matches_ignore_patterns(canon, config.ignore_patterns):
                    continue
                if config.respect_robots and not robots.is_allowed(canon):
                    continue
                rows["url"].append(canon)
                rows["host"].append(extract_host(canon))
                rows["priority"].append(p_pri)
                rows["pvt"].append(p_vt)
                rows["pli"].append(li)
                rows["w_pri"].append(p_pri)
                rows["w_pvt"].append(p_pvt)
                rows["w_pli"].append(p_pli)
                rows["w_canon"].append(url)
        return pa.table({n: pa.array(rows[n], CANDIDATE_SCHEMA.field(n).type)
                         for n in CANDIDATE_SCHEMA.names})

    return output_ds.map_batches(expand, batch_format="pyarrow")


N_BUCKETS = 64  # coarse shuffle key: all rows of one url/host share a bucket


def _with_bucket(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        from ..functions.urls import url_hash64

        b = [url_hash64(v) % N_BUCKETS for v in batch[col].to_pylist()]
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _dedup_and_screen(cands: ray.data.Dataset, seen: SeenSet) -> ray.data.Dataset:
    """In-round dedup (min winner key per canon url == first discovery in
    sequential crawl order) then seen-set anti-join via shard actors.

    The shuffle key is a coarse url-hash bucket (not the url itself):
    one vectorized pandas dedup per bucket instead of one Python call
    per distinct url — same result, ~N_BUCKETS tasks."""

    def pick_winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["url", "pvt", "w_pri", "w_pvt", "w_pli", "w_canon", "pli"],
            kind="mergesort",
        )
        return g.drop_duplicates(subset=["url"], keep="first").drop(columns=["bucket"])

    deduped = (
        _with_bucket(cands, "url")
        .groupby("bucket")
        .map_groups(pick_winner, batch_format="pandas")
    )
    shard_handles = seen.shard_handles()
    n_shards = seen.n_shards

    def screen(batch: pa.Table) -> pa.Table:
        from ..functions.urls import url_hash64

        urls = batch["url"].to_pylist()
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
        return batch.filter(pa.array(mask, pa.bool_()))

    return deduped.map_batches(screen, batch_format="pyarrow")


# --------------------------------------------------------------------------
# round stages

def _assign_virtual_time(frontier: ray.data.Dataset, bases_ref, robots_ref,
                         config: CrawlConfig) -> ray.data.Dataset:
    """Per-host politeness: k-th candidate of a host (ordered by
    (priority, pvt, pli, url)) gets vt=(base+k)*delay. Pure function of
    crawl history — parallelism-independent (model.py step 1)."""

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many hosts; vectorized per-host rank via cumcount
        bases: dict = ray.get(bases_ref)
        robots: RobotsRules = ray.get(robots_ref)
        g = g.sort_values(["host", "priority", "pvt", "pli", "url"], kind="mergesort")
        k = g.groupby("host", sort=False).cumcount()
        base = g["host"].map(lambda h: bases.get(h, 0))
        delay = g["host"].map(robots.delay_ms)
        g = g.copy()
        g["vt"] = ((base + k) * delay).astype(float)
        return g.drop(columns=["bucket"])

    return (
        _with_bucket(frontier, "host")
        .groupby("bucket")
        .map_groups(assign, batch_format="pandas")
    )


def _fetch_and_extract(
    pages_path: str, admitted_urls_ref, meta_ref, round_no: int
) -> ray.data.Dataset:
    """Corpus-backed fetch: one pass over the pages table, filtered to
    this round's admitted URL set (broadcast once via ray.put), then the
    extraction kernel. In a live deployment this stage is an actor-pool
    HTTP fetcher (stages/fetch.py) instead of a corpus scan."""
    pages = ray.data.read_parquet(pages_path, columns=["url", "html"])

    def keep_admitted(batch: pa.Table) -> pa.Table:
        admitted: frozenset = ray.get(admitted_urls_ref)
        mask = pc.is_in(batch["url"], value_set=pa.array(list(admitted), pa.string()))
        return batch.filter(mask)

    fetched = pages.map_batches(keep_admitted, batch_format="pyarrow")
    extracted = fetched.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)

    def attach_meta(batch: pa.Table) -> pa.Table:
        meta: dict = ray.get(meta_ref)
        vts, depths = [], []
        for u in batch["url"].to_pylist():
            vts.append(meta[u][1])
            depths.append(round_no)
        return batch.append_column("vt", pa.array(vts, pa.float64())).append_column(
            "depth", pa.array(depths, pa.int64())
        )

    return extracted.map_batches(attach_meta, batch_format="pyarrow")


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


def load_crawl_order(checkpoint_dir: str) -> pd.DataFrame:
    """The deterministic crawl ordering: admitted tables sorted by
    (round, vt, priority, pvt, pli, url). Driver-side (test/inspection
    helper); at scale consume the sorted per-round parquet as a Dataset."""
    frames = []
    for r in _complete_rounds(checkpoint_dir):
        path = os.path.join(checkpoint_dir, f"admitted_{r:04d}")
        if os.path.isdir(path) and os.listdir(path):
            df = pq.read_table(path).to_pandas()
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
) -> CrawlResult:
    """Run (or resume) the frontier crawl. See module docstring."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    robots = (
        RobotsRules.from_parquet(robots_path, config.default_crawl_delay_ms)
        if robots_path
        else RobotsRules.empty(config.default_crawl_delay_ms)
    )
    robots_ref = ray.put(robots)
    seen = SeenSet(config.seen_shards)

    host_counts: dict[str, int] = {}
    pages_budget = config.max_pages
    start_round = 0
    total_admitted = 0
    total_fetched = 0

    done_rounds = _complete_rounds(checkpoint_dir) if resume else []
    if done_rounds:
        last = done_rounds[-1]
        with open(_manifest_path(checkpoint_dir, last)) as f:
            m = json.load(f)
        host_counts = dict(m["host_counts"])
        total_admitted = m["total_admitted"]
        total_fetched = m["total_fetched"]
        if pages_budget is not None:
            pages_budget -= total_admitted
        # seen = union of all frontier files written so far (incl. next)
        seen_urls: list[str] = []
        for r in range(last + 2):
            fp = os.path.join(checkpoint_dir, f"frontier_{r:04d}")
            if os.path.isdir(fp) and os.listdir(fp):
                seen_urls.extend(pq.read_table(fp, columns=["url"])["url"].to_pylist())
        seen.add(seen_urls)
        start_round = last + 1
    else:
        # Round 0 discovery: seeds → candidates → dedup → seen add
        cands = _seed_candidates(seeds_path, robots_ref, config)
        frontier0 = _dedup_and_screen(cands, seen)
        fdir = os.path.join(checkpoint_dir, "frontier_0000")
        frontier0.write_parquet(fdir)

    for r in range(start_round, config.max_depth + 1):
        fdir = os.path.join(checkpoint_dir, f"frontier_{r:04d}")
        if not os.path.isdir(fdir) or not os.listdir(fdir):
            break
        frontier = ray.data.read_parquet(
            fdir, columns=["url", "host", "priority", "pvt", "pli"]
        )
        if frontier.count() == 0 or (pages_budget is not None and pages_budget <= 0):
            break
        t0 = time.time()

        # politeness → crawl order (+ global cap)
        bases_ref = ray.put(dict(host_counts))
        admitted = _assign_virtual_time(frontier, bases_ref, robots_ref, config)
        if pages_budget is not None:
            admitted = admitted.sort(ORDER_KEYS).limit(pages_budget)
        adir = os.path.join(checkpoint_dir, f"admitted_{r:04d}")
        admitted.write_parquet(adir)

        # round-bounded driver state: admitted keys + per-host counts
        adm_tbl = pq.read_table(adir, columns=["url", "host", "priority", "vt", "pvt", "pli"])
        n_admitted = adm_tbl.num_rows
        if n_admitted == 0:
            _write_manifest(checkpoint_dir, r, {
                "round": r, "n_admitted": 0, "n_fetched": 0, "n_next_frontier": 0,
                "host_counts": host_counts, "total_admitted": total_admitted,
                "total_fetched": total_fetched, "elapsed_s": time.time() - t0,
            })
            break
        for h, c in zip(*_host_count(adm_tbl)):
            host_counts[h] = host_counts.get(h, 0) + c
        if pages_budget is not None:
            pages_budget -= n_admitted
        meta = {
            u: (p, v, pv, pl)
            for u, p, v, pv, pl in zip(
                adm_tbl["url"].to_pylist(),
                adm_tbl["priority"].to_pylist(),
                adm_tbl["vt"].to_pylist(),
                adm_tbl["pvt"].to_pylist(),
                adm_tbl["pli"].to_pylist(),
            )
        }
        meta_ref = ray.put(meta)
        admitted_urls_ref = ray.put(frozenset(meta.keys()))

        # fetch + extract → round output
        out_ds = _fetch_and_extract(pages_path, admitted_urls_ref, meta_ref, r)
        odir = os.path.join(checkpoint_dir, f"output_{r:04d}")
        out_ds.write_parquet(odir)
        n_fetched = sum(
            pq.read_metadata(os.path.join(odir, f)).num_rows for f in os.listdir(odir)
        ) if os.listdir(odir) else 0

        total_admitted += n_admitted
        total_fetched += n_fetched

        # discovery → next frontier
        n_next = 0
        if r < config.max_depth and n_fetched > 0:
            links_ds = ray.data.read_parquet(odir, columns=["url", "links"])
            cands = _link_candidates(links_ds, meta_ref, robots_ref, config)
            nxt = _dedup_and_screen(cands, seen)
            ndir = os.path.join(checkpoint_dir, f"frontier_{r + 1:04d}")
            nxt.write_parquet(ndir)
            n_next = sum(
                pq.read_metadata(os.path.join(ndir, f)).num_rows for f in os.listdir(ndir)
            ) if os.path.isdir(ndir) and os.listdir(ndir) else 0

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


def _host_count(adm_tbl: pa.Table):
    import collections

    c = collections.Counter(adm_tbl["host"].to_pylist())
    return list(c.keys()), list(c.values())
