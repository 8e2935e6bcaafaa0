"""Exact distributional statistics over bounded-cardinality numeric
columns (lengths, token counts, scores — the corpus-curation
diagnostics).

Quantiles here are EXACT, not sketched: the per-batch combiner emits
(value, count) partials, one tiny ``groupby(value)`` folds them, and a
Ray task reduces the histogram to the requested quantiles — the
shuffle moves one row per (value, batch), never one per document. This
is the right trade for bounded-cardinality columns (a length column
has at most ~10^6 distinct values no matter how many documents exist);
for genuinely unbounded/continuous columns, bucket first (the t-digest
regime) — documented hand-off, not implemented here.

Quantile rule (exact integers, no float cdf): the q-percentile is the
SMALLEST value whose cumulative count reaches ``ceil(q * N / 100)``
— computed as ``(q*N + 99) // 100`` on both sides, so the SQL twin
(``__ray_entry__.oracle_sql()['length_quantiles']``) replays it
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


@ray.remote(num_cpus=0)
def _quantiles_from_counts(q_pcts: tuple, *tables) -> pd.DataFrame:
    import pyarrow as pa

    live = [t for t in tables if t.num_rows]
    if not live:
        return pd.DataFrame({"q_pct": pd.Series(q_pcts, dtype="int64"),
                             "value": pd.Series([None] * len(q_pcts),
                                                dtype="float64")})
    t = pa.concat_tables(live)
    v = t.column("v").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    targets = [(int(q) * n + 99) // 100 for q in q_pcts]
    idx = np.searchsorted(cum, targets)  # first cum >= target
    return pd.DataFrame({"q_pct": np.asarray(q_pcts, dtype=np.int64),
                         "value": v[idx].astype(np.int64)})


def quantiles_ref(
    ds: ray.data.Dataset,
    col: str,
    q_pcts: tuple = (25, 50, 75, 90, 99),
):
    """Exact percentiles of an integer column as an OBJECT-STORE ref
    to the small (q_pct, value) frame — broadcast-ready for scans that
    label rows against the cuts (the histogram itself lives in tasks
    and the object store)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnts = np.unique(df[col].to_numpy(), return_counts=True)
        return pd.DataFrame({"cbkt": np.mod(vals, 64),
                             "v": vals, "c": cnts.astype("int64")})

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        # coarse-bucket shuffle + vectorized in-partition sum: never
        # groupby(v) directly — the value key can be high-cardinality
        # and Ray's per-group machinery would dominate (the
        # _dup_hash_set rule, ops/spans.py)
        tot = g.groupby("v", sort=False)["c"].sum()
        return pd.DataFrame({"v": tot.index.to_numpy(),
                             "c": tot.to_numpy().astype("int64")})

    counts = (ds.select_columns([col])
              .map_batches(partial, batch_format="pandas")
              .groupby("cbkt")
              .map_groups(fold_partition, batch_format="pandas"))
    return _quantiles_from_counts.remote(tuple(q_pcts),
                                         *counts.to_arrow_refs())


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    q_pcts: tuple = (25, 50, 75, 90, 99),
) -> pd.DataFrame:
    """Exact percentiles of an integer column: returns the small
    (q_pct, value) frame (k rows — the only thing the driver ever
    holds)."""
    return ray.get(quantiles_ref(ds, col, q_pcts))


def grouped_quantiles(
    ds: ray.data.Dataset,
    col: str,
    group_col: str,
    q_pcts: tuple = (25, 50, 75, 90, 99),
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group exact percentiles: rows ``(group, q_pct, value)``
    under the module's integer quantile rule, one per (group, q).

    Shape: per-batch (group, value, count) combiner partials shuffle
    on a coarse md5(group) bucket — a partition holds COMPLETE groups,
    so each group's histogram folds and quantile-selects vectorized
    inside it. Group skew note: a single group's histogram must fit a
    partition; that holds whenever the VALUE cardinality is bounded
    (the op's contract), regardless of the group's row count."""
    import hashlib

    def gbucket(vals) -> np.ndarray:
        return np.fromiter(
            (hashlib.md5(str(g).encode()).digest()[0] % n_buckets
             for g in vals),
            dtype=np.int64, count=len(vals),
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby([group_col, col], sort=False).size()
        g = cnt.index.get_level_values(0).to_numpy()
        v = cnt.index.get_level_values(1).to_numpy()
        return pd.DataFrame({"cbkt": gbucket(g), group_col: g, "v": v,
                             "c": cnt.to_numpy().astype("int64")})

    def fold_partition(part: pd.DataFrame) -> pd.DataFrame:
        tot = (part.groupby([group_col, "v"], sort=False)["c"].sum()
               .reset_index().sort_values([group_col, "v"],
                                          kind="mergesort"))
        out_g, out_q, out_v = [], [], []
        for g, sub in tot.groupby(group_col, sort=False):
            v = sub["v"].to_numpy()
            cum = np.cumsum(sub["c"].to_numpy())
            n = int(cum[-1])
            targets = [(int(q) * n + 99) // 100 for q in q_pcts]
            idx = np.searchsorted(cum, targets)
            out_g.extend([g] * len(q_pcts))
            out_q.extend(int(q) for q in q_pcts)
            out_v.extend(v[idx].astype(np.int64))
        return pd.DataFrame({group_col: out_g,
                             "q_pct": pd.Series(out_q, dtype="int64"),
                             "value": pd.Series(out_v, dtype="int64")})

    return (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pandas")
            .groupby("cbkt")
            .map_groups(fold_partition, batch_format="pandas"))


def binned_quantiles(
    ds: ray.data.Dataset,
    col: str,
    q_pcts: tuple = (25, 50, 75, 90, 99),
    bin_width: int = 64,
) -> pd.DataFrame:
    """Approximate percentiles of an UNBOUNDED non-negative integer
    column with guaranteed error < ``bin_width`` — the implemented
    version of the module's documented hand-off ("for genuinely
    unbounded/continuous columns, bucket first"): values quantize to
    ``v // bin_width`` bins, so histogram state is bounded by
    domain/bin_width no matter how many distinct values exist, the
    exact integer quantile rule runs on the bin histogram, and the
    reported value is the selected bin's inclusive UPPER edge
    (``bin * w + w - 1``) — an overestimate of the true percentile by
    construction, by strictly less than one bin. All-integer, so the
    SQL twin (``oracle_sql()['binned_length_quantiles']``) replays it
    bit-for-bit. Same combiner/coarse-bucket shuffle as
    :func:`exact_quantiles`; the driver holds only the k-row answer."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: df[col].to_numpy() // bin_width})

    cuts = exact_quantiles(
        ds.select_columns([col]).map_batches(quantize,
                                             batch_format="pandas"),
        col, q_pcts)
    cuts["value"] = (cuts["value"] * bin_width + (bin_width - 1)).astype("int64")
    return cuts
