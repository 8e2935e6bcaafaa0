"""Distributed politeness ranking — the giant-host scale path.

The default admission stage (``frontier._admit``) computes each host's
virtual-time ranks inside one bucket task: vectorized and fast, but one
host's candidates must fit one task (fine up to ~10^7 rows/host). This
module is the mode for hosts beyond that: a **range-partitioned
two-pass rank** where a hot host's rows span many blocks and no single
process ever holds them all.

Algorithm (pure Ray Data + one tiny driver reduce):

1. ``sorted = cands.sort([host, priority, pvt, pli, url]).materialize()``
   — Ray's distributed sort range-partitions; materializing pins the
   block layout so both passes below see identical batches.
2. Pass A (map, block=batch): per batch emit a summary row
   ``(batch_key = first row's sort key, per-host row counts)``. Tiny:
   one row per (block, host-in-block).
3. Driver: order summaries by ``batch_key`` (global block order — valid
   because the dataset is sorted and batch keys are distinct row keys),
   prefix-sum per host → ``offset[(batch_key, host)]``. Size ≈ blocks ×
   hosts-per-block, independent of rows.
4. Pass B (map): ``vt = (base[host] + offset[batch_key, host] +
   local_cumcount) * delay[host]``.

Byte-identical to the fused path (test_ranked_politeness_parity): both
compute rank-within-host under the same total order.
"""

from __future__ import annotations

from typing import Tuple

import pandas as pd

import ray
import ray.data

SORT_KEYS = ["host", "priority", "pvt", "pli", "url"]


def _batch_key(df: pd.DataFrame) -> Tuple:
    r = df.iloc[0]
    return (r["host"], int(r["priority"]), float(r["pvt"]), int(r["pli"]), r["url"])


@ray.remote(num_cpus=0)
def _fold_offsets(*tables) -> dict:
    """Global block order = order of batch keys (the dataset is sorted
    and every batch key is a distinct row key); per host, the offset of
    a block is the prefix sum of its earlier blocks' counts — a
    vectorized grouped cumsum over blocks × hosts-per-block rows."""
    import pyarrow as pa

    live = [t for t in tables if t.num_rows]
    if not live:
        return {}
    df = pa.concat_tables(live).to_pandas()
    df = df.sort_values(
        ["bk_host", "bk_pri", "bk_pvt", "bk_pli", "bk_url"], kind="mergesort")
    off = (df.groupby("host", sort=False)["count"].cumsum()
           - df["count"]).to_numpy()
    return {
        ((bh, int(bp), float(bv), int(bl), bu), h): int(o)
        for bh, bp, bv, bl, bu, h, o in zip(
            df["bk_host"], df["bk_pri"], df["bk_pvt"], df["bk_pli"],
            df["bk_url"], df["host"], off)
    }


def assign_virtual_time_ranked(
    cands: ray.data.Dataset, bases: dict, robots, drop_cols: Tuple[str, ...] = ("bucket",)
) -> ray.data.Dataset:
    """Candidates (url, host, priority, pvt, pli[, …]) → + vt column.
    ``bases``: per-host admitted counts from previous rounds; ``robots``
    provides ``delay_ms(host)``."""
    sorted_ds = cands.sort(SORT_KEYS).materialize()

    # Pass A: per-block per-host counts, keyed by the block's first row
    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bk_host": pd.Series([], dtype="object"),
                                 "bk_pri": pd.Series([], dtype="int64"),
                                 "bk_pvt": pd.Series([], dtype="float64"),
                                 "bk_pli": pd.Series([], dtype="int64"),
                                 "bk_url": pd.Series([], dtype="object"),
                                 "host": pd.Series([], dtype="object"),
                                 "count": pd.Series([], dtype="int64")})
        bk = _batch_key(df)
        counts = df.groupby("host", sort=True).size()
        return pd.DataFrame(
            {
                "bk_host": bk[0], "bk_pri": bk[1], "bk_pvt": bk[2],
                "bk_pli": bk[3], "bk_url": bk[4],
                "host": counts.index, "count": counts.values,
            }
        )

    summaries = sorted_ds.map_batches(
        summarize, batch_format="pandas", batch_size=None)

    # Ray-task reduce (the graph._fold_node_table pattern): the
    # per-(block, host) summaries are folded into the offsets dict in
    # ONE worker — bounded by blocks × hosts-per-block, and the driver
    # never holds the frame; pass-B tasks read the result straight
    # from the object store
    offsets_ref = _fold_offsets.remote(*summaries.to_arrow_refs())
    bases_ref = ray.put(dict(bases))
    robots_ref = ray.put(robots)

    # Pass B: same blocks (materialized) → final vt
    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out["vt"] = pd.Series([], dtype="float64")
            return out
        offs = ray.get(offsets_ref)
        base = ray.get(bases_ref)
        rb = ray.get(robots_ref)
        bk = _batch_key(df)
        df = df.copy()
        local_k = df.groupby("host", sort=False).cumcount()
        df["vt"] = [
            float((base.get(h, 0) + offs.get((bk, h), 0) + k) * rb.delay_ms(h))
            for h, k in zip(df["host"], local_k)
        ]
        return df.drop(columns=[c for c in drop_cols if c in df.columns])

    return sorted_ds.map_batches(assign, batch_format="pandas", batch_size=None)
