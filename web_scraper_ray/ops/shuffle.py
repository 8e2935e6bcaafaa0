"""Deterministic training-order shuffle — the export-side op that
fixes a reproducible global sample order for a training run (every
epoch pipeline reads the corpus in ``md5(seed:id)`` order, stable
under re-runs, resumes, and corpus growth — the same hash-keyed
determinism contract as ``ops/sampling.py``).

The interesting part is the EXACT GLOBAL RANK without a global
enumeration bottleneck: ranks are assigned as (bucket offset + local
rank) where the bucket is the top ``log2(B)`` bits of the shuffle key
— buckets are RANGE-ordered, so offsets are exact cumulative counts
of a B-row table (folded in one Ray task and broadcast), and local
ranks come from an ordinary per-bucket sort. One combiner-count pass +
one ``groupby(bucket)`` shuffle; no process ever sees a global order
besides the B-int offset array.

Determinism / oracle: key = md5-upper-64 of ``"{seed}:{id}"`` (the
``hash_sample`` keying, already SQL-replayed elsewhere); rank ties are
impossible absent a 2^-64 collision, but the order is still pinned by
(key, id) on both sides. ``__ray_entry__.oracle_sql()['shuffle_ranks']``
replays it with one ``row_number()`` window.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data

#: default bucket bit-width: top byte of the key -> 256 range-ordered
#: buckets / reduce partitions, offsets a 256-int table. At corpus
#: scale raise ``bucket_bits`` (e.g. 16 -> 65,536 partitions) so a
#: single bucket never outgrows a worker: ranks/offsets are IDENTICAL
#: for any width (buckets are internal partitioning only).
_BUCKET_BITS = 8


def _shuffle_keys(ids, seed: int) -> np.ndarray:
    pre = f"{seed}:"
    return np.fromiter(
        (int.from_bytes(hashlib.md5((pre + str(v)).encode()).digest()[:8],
                        "big") for v in ids),
        dtype=np.uint64, count=len(ids),
    )


@ray.remote(num_cpus=0)
def _bucket_offsets(n_buckets: int, *tables) -> np.ndarray:
    """Exclusive cumulative counts per RANGE-ordered bucket."""
    counts = np.zeros(n_buckets, dtype=np.int64)
    for t in tables:
        if t.num_rows:
            b = t.column("bkt").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            counts[b] += n
    return np.concatenate(([0], np.cumsum(counts)[:-1]))


def shuffle_ranks(
    ds: ray.data.Dataset,
    seed: int = 17,
    id_col: str = "doc_id",
    bucket_bits: int = _BUCKET_BITS,
) -> ray.data.Dataset:
    """Rows ``(id, rank)`` where ``rank`` is the row's exact 0-based
    position in the deterministic shuffled order (ascending
    ``(md5(seed:id), id)``). Join it back (or feed ``sort(rank)``) to
    stream the corpus in training order."""
    from ray.data.aggregate import Sum

    shift = np.uint64(64 - bucket_bits)
    slim = ds.select_columns([id_col])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        k = _shuffle_keys(df[id_col], seed)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "k": k,
            "bkt": (k >> shift).astype(np.int64),
        })

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnts = np.unique(df["bkt"].to_numpy(), return_counts=True)
        return pd.DataFrame({"bkt": vals, "n": cnts.astype("int64")})

    # materialize the slim (id, k, bkt) table once: it feeds both the
    # counting pass and the ranking shuffle, and the md5 keys should
    # not be computed twice
    with_keys = slim.map_batches(keyed, batch_format="pandas").materialize()
    bucket_counts = (with_keys.map_batches(counts, batch_format="pandas")
                     .groupby("bkt").aggregate(Sum("n", alias_name="n")))
    offsets_ref = _bucket_offsets.remote(1 << bucket_bits,
                                         *bucket_counts.to_arrow_refs())

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offsets_ref)
        g = g.sort_values(["k", id_col], kind="mergesort")
        base = offsets[int(g["bkt"].iloc[0])]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "rank": base + np.arange(len(g), dtype=np.int64),
        })

    return with_keys.groupby("bkt").map_groups(rank_group,
                                               batch_format="pandas")


def pack_sequences(
    ds: ray.data.Dataset,
    seqlen: int,
    weight_col: str,
    seed: int = 17,
    id_col: str = "doc_id",
    bucket_bits: int = _BUCKET_BITS,
) -> ray.data.Dataset:
    """Deterministic concat-then-chunk sequence packing: documents are
    laid out in the :func:`shuffle_ranks` order and their token counts
    (``weight_col``, positive int) concatenated into one virtual token
    stream cut every ``seqlen`` tokens — the GPT-style pack where a
    document may straddle a boundary. Emits per document:

      rank       exact position in the shuffled order
      tok_start  exclusive prefix sum of weights (global token offset)
      seq_id     tok_start // seqlen   (training sequence index)
      seq_off    tok_start %  seqlen   (offset inside that sequence)

    Same two-pass scheme as :func:`shuffle_ranks` with the count
    generalized to a WEIGHTED prefix sum: per-bucket weight totals fold
    into a B-int offset table in one Ray task; inside each range-ordered
    bucket an ordinary sorted ``cumsum`` finishes the job. No global
    enumeration, no driver-side pass over the corpus; the shuffle moves
    (id, key, weight) only. Replayed exactly by
    ``oracle_sql()['pack_sequences']`` (one SUM() OVER window)."""
    from ray.data.aggregate import Sum

    shift = np.uint64(64 - bucket_bits)
    slim = ds.select_columns([id_col, weight_col])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        k = _shuffle_keys(df[id_col], seed)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "w": df[weight_col].to_numpy(dtype=np.int64),
            "k": k,
            "bkt": (k >> shift).astype(np.int64),
        })

    def wcounts(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["bkt", "w"]].copy()
        out["n"] = np.int64(1)
        agg = out.groupby("bkt", sort=False)[["n", "w"]].sum().reset_index()
        return agg.astype({"bkt": "int64", "n": "int64", "w": "int64"})

    with_keys = slim.map_batches(keyed, batch_format="pandas").materialize()
    totals = (with_keys.map_batches(wcounts, batch_format="pandas")
              .groupby("bkt").aggregate(Sum("n", alias_name="n"),
                                        Sum("w", alias_name="w")))
    offs_ref = _bucket_offsets2.remote(1 << bucket_bits,
                                       *totals.to_arrow_refs())

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        rank_off, tok_off = ray.get(offs_ref)
        g = g.sort_values(["k", id_col], kind="mergesort")
        b = int(g["bkt"].iloc[0])
        w = g["w"].to_numpy(dtype=np.int64)
        tok_start = tok_off[b] + np.concatenate(
            ([0], np.cumsum(w)[:-1])).astype(np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "rank": rank_off[b] + np.arange(len(g), dtype=np.int64),
            "tok_start": tok_start,
            "seq_id": tok_start // seqlen,
            "seq_off": tok_start % seqlen,
        })

    return with_keys.groupby("bkt").map_groups(pack_group,
                                               batch_format="pandas")


@ray.remote(num_cpus=0)
def _bucket_offsets2(n_buckets: int, *tables) -> tuple[np.ndarray, np.ndarray]:
    """Exclusive cumulative (row count, weight) per range-ordered
    bucket."""
    counts = np.zeros(n_buckets, dtype=np.int64)
    weights = np.zeros(n_buckets, dtype=np.int64)
    for t in tables:
        if t.num_rows:
            b = t.column("bkt").to_numpy(zero_copy_only=False)
            counts[b] += t.column("n").to_numpy(zero_copy_only=False)
            weights[b] += t.column("w").to_numpy(zero_copy_only=False)
    excl = lambda a: np.concatenate(([0], np.cumsum(a)[:-1]))  # noqa: E731
    return excl(counts), excl(weights)


def token_budget_head(
    ds: ray.data.Dataset,
    budget_tokens: int,
    weight_col: str,
    seed: int = 17,
    id_col: str = "doc_id",
    bucket_bits: int = _BUCKET_BITS,
) -> ray.data.Dataset:
    """The first ``budget_tokens`` of the shuffled virtual token
    stream — "train on the first N tokens of the shuffled corpus":
    every document whose global token offset (:func:`pack_sequences`'s
    ``tok_start``) is below the budget. A document straddling the
    boundary is INCLUDED (its first tokens are inside the budget — the
    GPT-pack convention). Emits ``(id, rank, tok_start)``; pure filter
    over the weighted-prefix-sum pass, so it inherits pack_sequences'
    no-global-enumeration scale shape. Oracle:
    ``oracle_sql()['token_budget_head']``."""
    packed = pack_sequences(ds, seqlen=1, weight_col=weight_col,
                            seed=seed, id_col=id_col,
                            bucket_bits=bucket_bits)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["tok_start"] < budget_tokens,
                      [id_col, "rank", "tok_start"]]

    return packed.map_batches(head, batch_format="pandas")
