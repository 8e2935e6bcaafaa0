"""Flagship pipeline: pages parquet → extraction kernel → (optional)
partitioned parquet sink.

Streaming end to end: ``read_parquet`` (column-pruned) →
``map_batches(extract_batch, batch_format="pyarrow")`` → sink. No stage
materializes the dataset; the streaming executor pipelines blocks with
backpressure (SURVEY.md §3.4).
"""

from __future__ import annotations

import os
from typing import Optional

import ray.data

from ..stages.extract_stage import extract_batch, verify_batch


def _default_blocks() -> Optional[int]:
    """Enough read tasks to keep every core busy even when the corpus
    has few files (parquet reads split at row-group granularity); a
    file count below the core count otherwise caps the fused
    read→extract stage's parallelism. 2 tasks per core measured best
    END TO END: finer blocks (6×) shave ~7% off the pure extract scan
    by packing the tail waves, but give it all back in write-file and
    per-round dispatch overhead (and regress the crawl loop, which
    pays the task count every round)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return None
    return max(2 * cpus, 16) if cpus else None


def read_pages(pages_path: str, columns: Optional[list[str]] = None,
               override_num_blocks: Optional[int] = None) -> ray.data.Dataset:
    """Read the pages table with column pruning at the read (never load
    ``text``/``lang`` when only extracting)."""
    return ray.data.read_parquet(pages_path, columns=columns,
                                 override_num_blocks=override_num_blocks)


def extract_pipeline(
    pages_path: str,
    out_dir: Optional[str] = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """pages → extracted records. With ``out_dir``, writes partitioned
    parquet (one dir per input shard via Ray's natural block layout)."""
    ds = read_pages(pages_path, columns=["url", "html"],
                    override_num_blocks=_default_blocks())
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
    if out_dir:
        import json

        # clear only our own stale artifacts — never the whole dir (the
        # caller may keep unrelated files there)
        if os.path.isdir(out_dir):
            for f in os.listdir(out_dir):
                if f.endswith(".parquet") or f.startswith("_manifest.json"):
                    os.remove(os.path.join(out_dir, f))
        os.makedirs(out_dir, exist_ok=True)
        ds.write_parquet(out_dir)
        # lineage manifest (atomic rename): input, outputs, row counts —
        # a rerun can check input+counts instead of re-extracting
        import pyarrow.parquet as pq

        files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
        manifest = {
            "input": pages_path,
            "n_files": len(files),
            "n_rows": sum(
                pq.read_metadata(os.path.join(out_dir, f)).num_rows for f in files
            ),
            "batch_size": batch_size,
        }
        tmp = os.path.join(out_dir, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return ds


def verify_pipeline(pages_path: str, batch_size: int = 256) -> ray.data.Dataset:
    """pages → per-url byte-parity verdicts against the ``text`` oracle."""
    ds = read_pages(pages_path, columns=["url", "html", "text"])
    return ds.map_batches(verify_batch, batch_format="pyarrow", batch_size=batch_size)
