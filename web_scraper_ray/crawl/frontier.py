"""Ray-Data-native URL-frontier + fetch scheduler.

Implements EXACTLY the crawl semantics of the sequential spec in
``model.py`` (see its docstring for the contract), re-expressed as
streaming Dataset rounds (SURVEY.md §3.4, §7.6). Each round is ONE
Dataset execution with ONE all-to-all shuffle:

    pages corpus scan → broadcast is_in filter
      → map_batches(extract_batch)
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
— so resume rebuilds the seen shards from those files, restores host
counters from the last manifest, and continues at the first round
without a manifest.

Scale notes (10^10 frontier, SURVEY.md §7):
* The fetch-join is pluggable (CrawlConfig.fetch_join): ``broadcast``
  ships the round's admitted URL set once via ``ray.put`` (vectorized
  ``is_in`` per batch — zero shuffle, right until a round outgrows the
  driver); ``bucketed`` is the implemented 10^10-scale path — a
  partitioned hash semi-join co-locating corpus and (html-less)
  frontier rows by ``url_hash64(url) % B`` in one groupby, so the
  admitted set never resides in a single process. Both produce
  byte-identical crawls (test_bucketed_fetch_join_parity). In a live
  deployment the corpus scan is replaced by an actor-pool HTTP fetcher
  and no join exists at all.
* Hot hosts serialize only their *ordering* (a vectorized per-host
  cumcount inside the bucket task), not their fetches; a host with k
  candidates costs O(k log k) in one task — salt ``host#chunk`` for
  queue storage and keep a single budget key if a host ever exceeds one
  task's memory.
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
    url_hash64,
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
        ("bucket", pa.int64()),
    ]
)

FRONTIER_COLUMNS = ["url", "host", "priority", "pvt", "pli", "vt"]
ORDER_KEYS = ["vt", "priority", "pvt", "pli", "url"]


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
    output_ds: ray.data.Dataset, meta_ref, robots_ref, config: CrawlConfig
) -> ray.data.Dataset:
    """Fetched round output → next-round candidate rows (discovery)."""
    n_buckets = _n_buckets()  # driver-side: one consistent value per run

    def expand(batch: pa.Table) -> pa.Table:
        meta: dict = ray.get(meta_ref)  # url -> (priority, vt, pvt, pli)
        robots: RobotsRules = ray.get(robots_ref)
        rows = _new_rows()
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
                _push_candidate(rows, canon, p_pri, p_vt, li, p_pri, p_pvt, p_pli, url,
                                n_buckets)
        return _candidate_table(rows)

    return output_ds.map_batches(expand, batch_format="pyarrow")


# --------------------------------------------------------------------------
# the fused per-bucket admission stage

def _admit(cands: ray.data.Dataset, seen: SeenSet, bases_ref, robots_ref,
           assign_vt: bool = True) -> ray.data.Dataset:
    """ONE shuffle: host-bucket groupby fusing in-round dedup, seen-shard
    anti-join, and per-host virtual-time assignment (see module doc).
    With ``assign_vt=False`` the vt step is skipped (the ranked
    politeness mode assigns it afterwards, ranked_politeness.py)."""
    shard_handles = seen.shard_handles()
    n_shards = seen.n_shards

    def bucket_admit(g: pd.DataFrame) -> pd.DataFrame:
        # 1. in-round dedup: min winner key per url == first discovery
        #    in sequential crawl order (model.py step 4)
        g = g.sort_values(
            ["url", "pvt", "w_pri", "w_pvt", "w_pli", "w_canon", "pli"],
            kind="mergesort",
        ).drop_duplicates(subset=["url"], keep="first")

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
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in (
                ("url", "object"), ("host", "object"), ("priority", "int64"),
                ("pvt", "float64"), ("pli", "int64"), ("vt", "float64"))})

        if not assign_vt:
            return g[["url", "host", "priority", "pvt", "pli"]].copy()

        # 3. politeness: k-th candidate of host (ordered by priority,
        #    pvt, pli, url) gets vt = (base + k) * delay (model.py step 1)
        bases: dict = ray.get(bases_ref)
        robots: RobotsRules = ray.get(robots_ref)
        g = g.sort_values(["host", "priority", "pvt", "pli", "url"], kind="mergesort")
        k = g.groupby("host", sort=False).cumcount()
        base = g["host"].map(lambda h: bases.get(h, 0))
        delay = g["host"].map(robots.delay_ms)
        g = g[["url", "host", "priority", "pvt", "pli"]].copy()
        g["vt"] = ((base + k) * delay).astype(float)
        return g

    return cands.groupby("bucket").map_groups(bucket_admit, batch_format="pandas")


def _admit_with_mode(cands: ray.data.Dataset, seen: SeenSet, bases: dict,
                     robots_ref, robots: RobotsRules,
                     config: CrawlConfig) -> ray.data.Dataset:
    """Dispatch between the fused bucket politeness (default; one host =
    one vectorized task) and the range-partitioned two-pass rank
    (politeness_mode='ranked' — hosts may span blocks; the giant-host
    path, ranked_politeness.py)."""
    if config.politeness_mode == "ranked":
        from .ranked_politeness import assign_virtual_time_ranked

        screened = _admit(cands, seen, ray.put(bases), robots_ref, assign_vt=False)
        return assign_virtual_time_ranked(screened, bases, robots)
    return _admit(cands, seen, ray.put(bases), robots_ref)


# --------------------------------------------------------------------------
# fetch + extract

def _bucketed_fetch_join(pages: ray.data.Dataset, adm_tbl: pa.Table) -> ray.data.Dataset:
    """Partitioned hash semi-join: pages ⋉ admitted on url, co-located
    by ``url_hash64(url) % B``. The frontier side ships only
    (url, bucket) — no html — so the shuffle payload beyond the corpus
    scan itself is negligible; the corpus side moves once (the price of
    not holding the admitted set in any single process)."""
    n_buckets = _n_buckets()

    adm_urls = adm_tbl["url"].to_pylist()
    frontier_side = pa.table(
        {
            "url": pa.array(adm_urls, pa.string()),
            "html": pa.array([b""] * len(adm_urls), pa.binary()),
            "side": pa.array(["f"] * len(adm_urls), pa.string()),
            "bucket": pa.array(
                [url_hash64(u) % n_buckets for u in adm_urls], pa.int64()
            ),
        }
    )

    def tag_pages(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        return pa.table(
            {
                "url": batch["url"],
                "html": pc.cast(batch["html"], pa.binary()),
                "side": pa.array(["p"] * batch.num_rows, pa.string()),
                "bucket": pa.array(
                    [url_hash64(u) % n_buckets for u in urls], pa.int64()
                ),
            }
        )

    both = pages.map_batches(tag_pages, batch_format="pyarrow").union(
        ray.data.from_arrow(frontier_side)
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        wanted = set(g.loc[g["side"] == "f", "url"])
        out = g.loc[(g["side"] == "p") & g["url"].isin(wanted), ["url", "html"]]
        return out

    return both.groupby("bucket").map_groups(join_group, batch_format="pandas")


def _fetch_and_extract(
    pages_path: str, admitted_urls_ref, meta_ref, round_no: int, odir: str,
    join_mode: str = "broadcast", adm_tbl: Optional[pa.Table] = None,
) -> ray.data.Dataset:
    """Corpus-backed fetch: one pass over the pages table restricted to
    the round's admitted URL set, then the extraction kernel. A live
    deployment swaps this scan for an actor-pool HTTP fetcher; the scan
    is the offline stand-in (module doc, scale notes).

    Two join strategies (CrawlConfig.fetch_join):

    * ``broadcast`` (default): ``ray.put`` the admitted set once,
      vectorized ``is_in`` per batch. Right whenever the round's URL
      set fits comfortably in memory — no shuffle at all.
    * ``bucketed``: the 10^10-scale path — both sides get
      ``bucket = url_hash64(url) % B``; the corpus and the (tiny,
      html-less) frontier rows co-locate via one ``groupby(bucket)``
      and join inside each group. The admitted set never lives in one
      process; cost is an all-to-all of the corpus scan, which is why
      broadcast is preferred until the frontier outgrows the driver.

    The round output parquet is written INSIDE the pipeline (one file
    per extracted batch, content-derived idempotent names, so task
    retries overwrite rather than duplicate) and only the slim
    ``(url, links)`` table flows on to the discovery stages — one
    execution and one corpus pass per round, with extraction, the
    write, and discovery all overlapped by the streaming executor."""
    from ..pipelines.flagship import _default_blocks

    import shutil

    shutil.rmtree(odir, ignore_errors=True)  # crashed-attempt leftovers
    os.makedirs(odir, exist_ok=True)
    pages = ray.data.read_parquet(pages_path, columns=["url", "html"],
                                  override_num_blocks=_default_blocks())

    if join_mode == "bucketed":
        fetched = _bucketed_fetch_join(pages, adm_tbl)
    else:
        def keep_admitted(batch: pa.Table) -> pa.Table:
            value_set: pa.Array = ray.get(admitted_urls_ref)
            return batch.filter(pc.is_in(batch["url"], value_set=value_set))

        fetched = pages.map_batches(keep_admitted, batch_format="pyarrow")
    extracted = fetched.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)

    def write_and_slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "links": pa.array([], pa.list_(pa.string()))})
        meta: dict = ray.get(meta_ref)
        urls = batch["url"].to_pylist()
        vts = [meta[u][1] for u in urls]
        full = batch.append_column("vt", pa.array(vts, pa.float64())).append_column(
            "depth", pa.array([round_no] * batch.num_rows, pa.int64())
        )
        import hashlib

        name = hashlib.blake2b(
            f"{urls[0]}|{urls[-1]}|{batch.num_rows}".encode(), digest_size=8
        ).hexdigest()
        pq.write_table(full, os.path.join(odir, f"part-{name}.parquet"))
        return batch.select(["url", "links"])

    return extracted.map_batches(write_and_slim, batch_format="pyarrow")


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
) -> CrawlResult:
    """Run (or resume) the frontier crawl. See module docstring."""
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
            tbl = _read_dir(checkpoint_dir, f"frontier_{r:04d}", columns=["url"])
            if tbl is not None:
                seen_urls.extend(tbl["url"].to_pylist())
        seen.add(seen_urls)
        start_round = last + 1
    else:
        # Round 0 discovery: seeds → fused admit → frontier_0 (with vt)
        cands = _seed_candidates(seeds_path, robots_ref, config)
        frontier0 = _admit_with_mode(cands, seen, {}, robots_ref, robots, config)
        fdir0 = os.path.join(checkpoint_dir, "frontier_0000")
        import shutil

        shutil.rmtree(fdir0, ignore_errors=True)  # crashed-attempt leftovers
        frontier0.write_parquet(fdir0)
        seen.commit_round()

    for r in range(start_round, config.max_depth + 1):
        if pages_budget is not None and pages_budget <= 0:
            break
        frontier_tbl = _read_dir(checkpoint_dir, f"frontier_{r:04d}",
                                 columns=FRONTIER_COLUMNS)
        if frontier_tbl is None or frontier_tbl.num_rows == 0:
            break
        t0 = time.time()

        # budget truncation: global crawl-order sort, keep first K
        if pages_budget is not None and frontier_tbl.num_rows > pages_budget:
            df = frontier_tbl.to_pandas().sort_values(ORDER_KEYS, kind="mergesort")
            adm_df = df.head(pages_budget)
            adm_tbl = pa.Table.from_pandas(adm_df, preserve_index=False)
            adir = os.path.join(checkpoint_dir, f"admitted_{r:04d}")
            import shutil

            shutil.rmtree(adir, ignore_errors=True)
            os.makedirs(adir, exist_ok=True)
            pq.write_table(adm_tbl, os.path.join(adir, "part-00000.parquet"))
        else:
            adm_tbl = frontier_tbl
        n_admitted = adm_tbl.num_rows
        if pages_budget is not None:
            pages_budget -= n_admitted

        # round-bounded driver state: admitted keys + per-host counts
        import collections

        for h, c in collections.Counter(adm_tbl["host"].to_pylist()).items():
            host_counts[h] = host_counts.get(h, 0) + c
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
        admitted_urls_ref = ray.put(pa.array(list(meta.keys()), pa.string()))

        # ONE execution per round: corpus scan → extract (+ in-pipeline
        # output write) → discovery → fused admit → next frontier
        odir = os.path.join(checkpoint_dir, f"output_{r:04d}")
        out_slim = _fetch_and_extract(pages_path, admitted_urls_ref, meta_ref, r, odir,
                                      join_mode=config.fetch_join, adm_tbl=adm_tbl)
        n_next = 0
        if r < config.max_depth:
            cands = _link_candidates(out_slim, meta_ref, robots_ref, config)
            nxt = _admit_with_mode(cands, seen, dict(host_counts), robots_ref,
                                   robots, config)
            ndir = os.path.join(checkpoint_dir, f"frontier_{r + 1:04d}")
            import shutil

            shutil.rmtree(ndir, ignore_errors=True)  # crashed-attempt leftovers
            nxt.write_parquet(ndir)
            seen.commit_round()  # frontier durable -> fold pending adds
            nxt_tbl = _read_dir(checkpoint_dir, f"frontier_{r + 1:04d}", columns=["url"])
            n_next = nxt_tbl.num_rows if nxt_tbl is not None else 0
        else:
            # no expansion: consume the pipeline to drive the writes
            out_slim.map_batches(
                lambda t: t.select(["url"]), batch_format="pyarrow"
            ).count()
        n_fetched = sum(
            pq.read_metadata(os.path.join(odir, f)).num_rows for f in os.listdir(odir)
        ) if os.path.isdir(odir) and os.listdir(odir) else 0

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
