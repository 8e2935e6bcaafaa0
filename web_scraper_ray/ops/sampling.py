"""Deterministic sampling and splitting — the reproducibility-critical
ops of a training-data pipeline (held-out splits, corpus downsampling,
ablation subsets).

Everything is keyed on a content/id hash, never on RNG state: a row's
fate depends only on (seed, its key), so results are identical at any
parallelism, any block layout, any resume point — and re-runs on a
grown corpus keep every previously-sampled row stable (the property
wall-clock or per-task RNG sampling cannot give). Hash = md5 upper
half (big-endian), so DuckDB reproduces every decision exactly
(``('0x' || substr(md5(...), 1, 16))::UBIGINT``) and the queries are
value-hash-checkable against SQL oracles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

_SCALE = float(1 << 64)


def _key_hash(series: pd.Series, seed: int) -> np.ndarray:
    """uint64 md5-upper-half of ``f"{seed}:{value}"`` per row (the
    DuckDB twin is ``md5(seed || ':' || value)``)."""
    pre = f"{seed}:"
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((pre + str(v)).encode()).digest()[:8], "big")
            for v in series
        ),
        dtype=np.uint64,
        count=len(series),
    )


def hash_sample(
    ds: ray.data.Dataset,
    key_col: str,
    rate: float,
    seed: int = 17,
) -> ray.data.Dataset:
    """Keep each row iff ``hash(seed:key) < rate * 2^64`` — a
    deterministic Bernoulli(rate) sample stratified by nothing but the
    key hash. Pure map_batches filter: no shuffle, no materialization,
    stable under re-runs and corpus growth. ``rate >= 1`` is exact:
    the dataset is returned unchanged (no clamped-threshold boundary
    where a key hashing to 2^64-1 would be dropped)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return ds
    threshold = np.uint64(int(rate * _SCALE))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[_key_hash(df[key_col], seed) < threshold]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 17,
) -> ray.data.Dataset:
    """Per-group Bernoulli rates — the domain-rebalancing step of a
    training-data mix (downsample overrepresented sources, keep the
    rest): a row in group ``g`` survives iff ``hash(seed:key) <
    rates.get(g, default_rate) * 2^64``, with rate >= 1 groups kept
    exactly (same boundary rule as :func:`hash_sample`).

    The rates table is one entry per domain/source — a fixed-size
    small side that rides the task closure; the op itself is a pure
    ``map_batches`` filter (no shuffle, no materialization, stable
    under re-runs, resume and corpus growth at any parallelism)."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    # integer thresholds only — never through a float dtype (float64
    # cannot hold 2^64-1 and would silently round the cut points)
    thresholds = {g: int(r * _SCALE) for g, r in rates.items() if r < 1.0}
    keep_all = frozenset(g for g, r in rates.items() if r >= 1.0)
    default_thr = int(default_rate * _SCALE) if default_rate < 1.0 else None

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash(df[key_col], seed)
        # per-UNIQUE-group lookup (vectorized back out via the codes),
        # so the row path is pure integer numpy. factorize codes null
        # group values as -1; one extra sentinel slot at the END of the
        # lookup arrays carries the default-rate behavior, and numpy's
        # -1 fancy-index lands exactly there.
        codes, uniques = pd.factorize(df[group_col], sort=False)
        thr_u = np.empty(len(uniques) + 1, dtype=np.uint64)
        full_u = np.empty(len(uniques) + 1, dtype=bool)
        for i, g in enumerate(uniques):
            if g in keep_all or (g not in thresholds and default_thr is None):
                thr_u[i], full_u[i] = 0, True
            else:
                thr_u[i] = thresholds.get(g, default_thr)
                full_u[i] = False
        if default_thr is None:
            thr_u[-1], full_u[-1] = 0, True
        else:
            thr_u[-1], full_u[-1] = default_thr, False
        return df.loc[full_u[codes] | (h < thr_u[codes])]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 17,
) -> ray.data.Dataset:
    """Assign every row a ``split`` label (e.g. train/val/test) by hash
    range: row → the first split whose cumulative fraction exceeds
    ``hash/2^64``. Deterministic, disjoint, exhaustive; a document can
    never leak across splits between runs. ``fractions`` must sum to 1
    (within 1e-9); insertion order defines the ranges."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    # integer cut points in hash space: exact, and reproducible in SQL
    cuts, acc = [], 0.0
    for n in names[:-1]:
        acc += fractions[n]
        cuts.append(min(int(acc * _SCALE), (1 << 64) - 1))
    cut_arr = np.array(cuts, dtype=np.uint64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash(df[key_col], seed)
        idx = np.searchsorted(cut_arr, h, side="right")
        out = df.copy()
        out["split"] = pd.Series(
            np.array(names, dtype=object)[idx], index=df.index, dtype="object"
        )
        return out

    return ds.map_batches(assign, batch_format="pandas")


def cap_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    k: int,
    order_col: str,
    ascending: bool = False,
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Cap every group's corpus contribution at its ``k`` best rows —
    the per-domain quota of a corpus mix (a handful of mega-hosts
    otherwise dominate a web corpus). "Best" = ``order_col`` descending
    (or ascending), ties broken by ``id_col`` ascending — a total
    order, so the survivor set is parallelism- and resume-stable.

    One bucketed shuffle: group keys hash to coarse ``__bkt`` buckets
    (never a groupby on the raw group key — corpus-cardinality key
    groupbys shatter into per-group task overhead) and each partition
    runs a vectorized sort + per-group cumcount. Rows ride the shuffle
    whole; callers selecting columns first ship less."""
    from . import bucket_of

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = bucket_of(df[group_col], n_buckets)
        return df

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g.drop(columns=["__bkt"])
        g = g.sort_values([group_col, order_col, id_col],
                          ascending=[True, ascending, True],
                          kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount()
        return g.loc[rank.to_numpy() < k].drop(columns=["__bkt"])

    return (ds.map_batches(add_bkt, batch_format="pandas")
            .groupby("__bkt").map_groups(cap, batch_format="pandas"))


def rebalance_sample(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    target_shares: dict[str, float] | str = "uniform",
    seed: int = 17,
) -> ray.data.Dataset:
    """Domain rebalancing driven by MEASURED counts (the DoReMi-lite
    mix step): downsample each group toward its target share of the
    corpus. Group ``g`` with ``c_g`` rows out of ``N`` total gets the
    keep-threshold

        t_g = floor(share_num * N * 2^64 / (share_den * c_g))

    and a row survives iff ``md5(seed:key) < t_g`` — the same hash gate
    as :func:`hash_sample`, but with the rate computed FROM the data.
    Groups already at or below target (t_g >= 2^64) keep every row.
    All threshold arithmetic is exact integer (Python bigints here,
    HUGEINT in the SQL twin), so the survivor set is hash-checkable
    and, like every op in this module, parallelism/resume-stable.

    Two passes, no corpus shuffle: a (group, n) combiner count pass
    folds into one threshold dict in a Ray task (broadcast via the
    object store — group cardinality is #domains, a small side), then
    a pure filter scan. ``target_shares``: ``"uniform"`` (1/#groups
    each) or a ``{group: share}`` dict of rational-friendly floats
    (shares are converted with ``float.as_integer_ratio`` — exact)."""
    import ray
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(group_col, sort=False).size()
        return pd.DataFrame({group_col: cnt.index.to_numpy(),
                             "n": cnt.to_numpy().astype("int64")})

    counts = (ds.select_columns([group_col])
              .map_batches(partials, batch_format="pandas")
              .groupby(group_col).aggregate(Sum("n", alias_name="n")))

    @ray.remote(num_cpus=0)
    def fold_thresholds(*tables) -> dict:
        cnt: dict = {}
        for t in tables:
            if not t.num_rows:
                continue
            for g, n in zip(t.column(group_col).to_pylist(),
                            t.column("n").to_pylist()):
                cnt[g] = cnt.get(g, 0) + int(n)
        total = sum(cnt.values())
        thr = {}
        for g, c in cnt.items():
            if target_shares == "uniform":
                num, den = 1, len(cnt)
            else:
                num, den = float(
                    target_shares.get(g, 0.0)).as_integer_ratio()
            thr[g] = (num * total * (1 << 64)) // (den * c) if c else 0
        return thr

    ref = fold_thresholds.remote(*counts.to_arrow_refs())

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(ref)
        h = _key_hash(df[key_col], seed)
        # the stratified_sample factorize gate: one pass to codes, a
        # per-UNIQUE-group threshold array (exact ints — t >= 2^64
        # groups keep everything with no clamped boundary), then a
        # vectorized row gate; -1 codes (null group) land on the
        # drop-everything sentinel slot
        codes, uniques = pd.factorize(df[group_col], sort=False)
        thr_u = np.zeros(len(uniques) + 1, dtype=np.uint64)
        full_u = np.zeros(len(uniques) + 1, dtype=bool)
        for i, g in enumerate(uniques):
            tg = thr.get(g, 0)
            if tg >= (1 << 64):
                full_u[i] = True
            else:
                thr_u[i] = tg
        return df.loc[full_u[codes] | (h < thr_u[codes])]

    return ds.map_batches(keep, batch_format="pandas")


def _quota_table_ref(ds: ray.data.Dataset, group_col: str, budget: int,
                     weight_col: str | None):
    """ObjectRef to one Arrow table ``(group_col, weight, quota)`` —
    largest-remainder (Hamilton) apportionment of ``budget`` across
    groups, proportional to ``weight_col`` sums (or row counts).

    All arithmetic is exact integer (Python bigints; HUGEINT in the
    SQL twin): ``q0 = (B*w) // W``, leftover ``B - Σq0`` units go to
    the groups with the largest remainders ``(B*w) % W``, ties broken
    by group ascending — a total order, so quotas are parallelism- and
    resume-stable. Group cardinality is #hosts/#domains — a small
    side — so the fold is one Ray task and the table broadcasts via
    the object store."""
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    cols = [group_col] + ([weight_col] if weight_col else [])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col:
            w = df.groupby(group_col, sort=False)[weight_col].sum()
        else:
            w = df.groupby(group_col, sort=False).size()
        return pd.DataFrame({group_col: w.index.to_numpy(),
                             "wt": w.to_numpy().astype("int64")})

    counts = (ds.select_columns(cols)
              .map_batches(partials, batch_format="pandas")
              .groupby(group_col).aggregate(Sum("wt", alias_name="wt")))

    @ray.remote(num_cpus=0)
    def fold(*tables) -> pa.Table:
        wt: dict = {}
        for t in tables:
            if not t.num_rows:
                continue
            for g, w in zip(t.column(group_col).to_pylist(),
                            t.column("wt").to_pylist()):
                wt[g] = wt.get(g, 0) + int(w)
        total = sum(wt.values())
        groups = sorted(wt)
        if total <= 0:
            q0, rem, leftover = {g: 0 for g in groups}, {}, 0
            order = []
        else:
            q0 = {g: (budget * wt[g]) // total for g in groups}
            rem = {g: (budget * wt[g]) % total for g in groups}
            leftover = budget - sum(q0.values())
            order = sorted(groups, key=lambda g: (-rem[g], g))
        bump = set(order[:leftover])
        # let Arrow infer the group column's type (int hosts ids work
        # as well as string hosts); only the empty table needs a
        # concrete fallback type
        garr = (pa.array(groups) if groups
                else pa.array([], type=pa.string()))
        return pa.table({
            group_col: garr,
            "weight": pa.array([wt[g] for g in groups], type=pa.int64()),
            "quota": pa.array([q0[g] + (1 if g in bump else 0)
                               for g in groups], type=pa.int64()),
        })

    return fold.remote(*counts.to_arrow_refs())


def apportion_budget(
    ds: ray.data.Dataset,
    group_col: str,
    budget: int,
    weight_col: str | None = None,
) -> ray.data.Dataset:
    """Per-host crawl-budget apportionment: split a global fetch budget
    of ``budget`` URLs across groups (hosts/domains) proportional to
    each group's weight (``weight_col`` sum, or candidate count when
    ``None``) by the largest-remainder method. Returns one row per
    group: ``(group_col, weight, quota)`` with ``Σ quota == budget``
    exactly (when total weight > 0).

    This is the planning step a frontier scheduler runs each round at
    web scale: the combiner-count pass is the only distributed work
    (partial per-batch group sums → one small groupby), the
    apportionment itself folds in a single Ray task over #hosts rows,
    and the result never touches the driver."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    return ray.data.from_arrow_refs(
        [_quota_table_ref(ds, group_col, budget, weight_col)]
    )


def budget_select(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    budget: int,
    weight_col: str | None = None,
    seed: int = 17,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Materialize the crawl plan :func:`apportion_budget` implies:
    from each group keep its quota's worth of rows — the ``quota_g``
    smallest ``md5(seed:key)`` values (ties by key ascending), i.e. a
    deterministic uniform draw of exactly ``min(quota_g, |g|)`` rows
    per group. Same stability guarantees as :func:`bottom_k_sample`,
    applied per group with data-derived k.

    Shape: the quota table folds from combiner counts (no corpus
    shuffle), broadcasts by ObjectRef, and the selection is ONE
    bucketed shuffle (coarse ``__bkt`` of the group key, never a
    groupby on raw corpus-cardinality keys) with a vectorized
    sort + cumcount cap inside each partition — the
    :func:`cap_per_group` pattern with per-group k."""
    import ray

    from . import bucket_of

    quota_ref = _quota_table_ref(ds, group_col, budget, weight_col)

    def add_keys(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _key_hash(df[key_col], seed)
        df["__bkt"] = bucket_of(df[group_col], n_buckets)
        return df

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        drop = ["__h", "__bkt"]
        if not len(g):
            return g.drop(columns=drop)
        t = ray.get(quota_ref)
        quota = dict(zip(t.column(group_col).to_pylist(),
                         t.column("quota").to_pylist()))
        g = g.sort_values([group_col, "__h", key_col], kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount().to_numpy()
        # per-UNIQUE-group quota lookup, vectorized back out via codes
        codes, uniques = pd.factorize(g[group_col], sort=False)
        q_u = np.fromiter((quota.get(u, 0) for u in uniques),
                          dtype=np.int64, count=len(uniques))
        return g.loc[rank < q_u[codes]].drop(columns=drop)

    return (ds.map_batches(add_keys, batch_format="pandas")
            .groupby("__bkt").map_groups(cap, batch_format="pandas"))


def bottom_k_sample(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    seed: int = 17,
) -> ray.data.Dataset:
    """EXACTLY ``k`` rows, uniformly at random, deterministically: the
    k smallest ``md5(seed:key)`` values (the bottom-k / KMV sketch's
    sample). Complements :func:`hash_sample`'s Bernoulli gate when the
    output size must be exact (eval sets, fixed-budget audits); same
    stability guarantees — parallelism-, resume- and (unlike a true
    reservoir) rerun-independent, and a grown corpus only ever
    REPLACES sampled rows, never reshuffles survivors' fates.

    Shape: each batch prunes to its local bottom-k (only k rows per
    block reach the exchange), then one k-bounded global sort+limit —
    the ``brute_force_topk`` pattern. Ties (astronomically unlikely
    hash collisions) break by key ascending."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _key_hash(df[key_col], seed)
        return df.sort_values(["__h", key_col]).head(k)

    return (ds.map_batches(local, batch_format="pandas")
            .sort(["__h", key_col]).limit(k)
            .drop_columns(["__h"]))


def epochs_mix(
    ds: ray.data.Dataset,
    epochs_e2: dict[str, int],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_e2: int = 100,
    seed: int = 17,
) -> ray.data.Dataset:
    """Fractional-epoch data mixing — the repeat-factor step of a real
    training recipe (LLaMA/Gopher mix tables repeat curated sources
    1-3+ epochs while crawl gets < 1): a group with ``epochs_e2=230``
    (2.30 epochs) contributes every row twice, plus a deterministic
    md5-keyed 30% of rows a third time. Output rows carry an ``epoch``
    copy index (0-based) so downstream shuffling/packing can
    interleave copies.

    Exactness: epochs are FIXED-POINT hundredths; the fractional copy
    keeps row k iff ``hash(seed:k) * 100 < (e2 % 100) << 64`` — both
    sides exact integers, replayed verbatim in HUGEINT by the SQL twin
    (``oracle_sql()['epochs_mix']``), so the mix is hash-checkable and
    stable under parallelism, resume and corpus growth (the module's
    no-RNG rule). A pure per-row flat_map: no shuffle, no state; at
    100 TB the copies are metadata until a downstream stage
    materializes text, so mix BEFORE packing, after curation."""
    for g, e in epochs_e2.items():
        if e < 0:
            raise ValueError(f"epochs_e2[{g!r}] must be >= 0, got {e}")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        e2 = (df[group_col].map(epochs_e2).fillna(default_e2)
              .astype("int64").to_numpy())
        full = e2 // 100
        frac = e2 % 100
        h = _key_hash(df[key_col], seed)
        # h * 100 < frac << 64, carried out as h < ceil(frac<<64 / 100)
        # (exact: equality h*100 == frac<<64 cannot occur when the
        # ceiling adjusts, since frac<<64 is never a multiple of 100
        # unless frac is — 100 and 2^64 share only the factor 4)
        thr = np.array([((int(f) << 64) + 99) // 100 for f in frac],
                       dtype=np.uint64)
        n_copies = full + (h < thr).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), n_copies)
        out = df.iloc[idx].reset_index(drop=True)
        # 0..n_copies-1 within each source row
        starts = np.cumsum(n_copies) - n_copies
        out["epoch"] = (np.arange(len(idx), dtype=np.int64)
                        - np.repeat(starts, n_copies))
        return out

    return ds.map_batches(expand, batch_format="pandas")
