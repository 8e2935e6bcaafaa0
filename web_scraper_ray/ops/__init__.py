"""Large-scale training-data operators (first-class components beyond the
reference's own surface, per the build brief): dedup family, similarity
search, text analysis, multimodal plumbing, and the relational/window
operators that prove the general engine (groupby / join / sort / as-of).
"""

from __future__ import annotations

import os
from typing import Optional


def bucket_of(series, n_buckets: int):
    """Deterministic vectorized shuffle bucket of a string key column
    (``pandas.util.hash_array``, fixed hash key). Internal partitioning
    only — bucket values never appear in results, so they need no SQL
    twin. Shared by the graph and sampling operators."""
    import numpy as np
    import pandas as pd

    return (pd.util.hash_array(series.to_numpy(dtype=object))
            % np.uint64(n_buckets)).astype(np.int64)


def sized_read_parquet(path: str, columns: Optional[list[str]] = None,
                       target_block_bytes: int = 32 << 20):
    """``read_parquet`` with a byte-aware block count.

    Ray's default parallelism splits by CPU count, which shatters a
    small table into dozens of near-empty blocks; every downstream
    stage then pays per-task dispatch (~10-80 ms) per block — on a
    multi-stage pipeline (the dedup family runs 4 shuffles) that
    overhead dominates small inputs entirely. Sizing blocks by on-disk
    bytes keeps per-task work meaningful at every scale: a 2 MB table
    gets 8 blocks, a 1 TB table gets bytes/32MB (capped at 4 tasks per
    core, where dispatch is amortized anyway).

    Paths the local filesystem cannot stat (remote URIs like s3://, or
    a typo) fall back to Ray's own parallelism heuristic instead of
    being silently pinned to the 8-block minimum."""
    import ray
    import ray.data

    total = 0
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if f.endswith(".parquet"))
    elif os.path.exists(path):
        total = os.path.getsize(path)
    if total == 0:
        return ray.data.read_parquet(path, columns=columns)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    blocks = max(8, min(4 * cpus, total // target_block_bytes + 1))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=int(blocks))
