"""Output sinks — the distributed re-expression of ``contxt/outputs.py``
and the CLI output stage (``contxt/cli.py:316-395``; SURVEY.md §2.2).

* file naming reproduces outputs.py:90-127 (custom_name/title/
  domain_path precedence + sanitization). The sequential ``_1,_2…``
  collision counter (outputs.py:129-135) is replaced by a deterministic
  url-hash suffix — a filesystem-probe counter cannot distribute
  (SURVEY.md §2.8 D3).
* the combined single-file sink reproduces cli.py:316-318's ordered
  concat with ``"="*50`` separators as an ordered driver-side reduce
  over a sorted Dataset (explicitly ordered — SURVEY.md §2.2 K5).
* run stats reproduce the cli.py:286-297 counters as a Dataset
  aggregate (K6/G1).
"""

from __future__ import annotations

import os
from typing import Optional
from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from .functions.urls import domain_path_filename, sanitize_filename, url_hash64


def derive_filename(
    source: Optional[str] = None,
    title: Optional[str] = None,
    custom_name: Optional[str] = None,
    extension: Optional[str] = None,
    unique_suffix: bool = False,
) -> str:
    """outputs.py:90-127 naming precedence, verbatim; optional
    deterministic uniqueness via an 8-hex url-hash suffix."""
    if custom_name and source:
        if "://" in source:
            domain = urlparse(source).netloc
            filename = f"{custom_name}_{domain}"
        else:
            filename = f"{custom_name}_{source}"
    elif custom_name:
        filename = custom_name
    elif title:
        filename = title
    elif source:
        if "://" in source:
            # same rule as functions.urls.domain_path_filename
            # (outputs.py:102-113); sanitize is idempotent so the final
            # pass below is harmless
            filename = domain_path_filename(source)
        else:
            filename = source
    else:
        filename = "contxt_output"

    filename = sanitize_filename(filename)
    if unique_suffix and source:
        filename += f"_{url_hash64(source) & 0xFFFFFFFF:08x}"
    if extension:
        if not extension.startswith("."):
            extension = f".{extension}"
        if not filename.endswith(extension):
            filename += extension
    return filename


def write_formatted_files(
    ds: ray.data.Dataset,
    out_dir: str,
    extension: str = "md",
    custom_name: Optional[str] = None,
) -> list[str]:
    """Distributed file sink (K1): each formatted record lands in a file
    named by the reference's rules + hash suffix. Parallel-safe and
    idempotent (same input → same names → overwrite-in-place). Returns
    the exact paths written (never inferred from a directory listing,
    which could include unrelated or stale files)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        paths = []
        for row in df.to_dict(orient="records"):
            name = derive_filename(
                source=row.get("url"),
                title=row.get("title") or None,
                custom_name=custom_name,
                extension=extension,
                unique_suffix=True,
            )
            path = os.path.join(out_dir, name)
            with open(path, "w", encoding="utf-8") as f:
                f.write(row["formatted"])
            paths.append(path)
        out = df[["url"]].copy()
        out["path"] = paths
        return out

    written = ds.map_batches(write_batch, batch_format="pandas")
    return written.to_pandas()["path"].tolist()


def combined_single_file(
    ds: ray.data.Dataset,
    order_cols: list[str],
    content_col: str = "formatted",
    separator: str = "\n\n" + "=" * 50 + "\n\n",
) -> str:
    """K5 — cli.py:316-318: join documents with ``====`` separators in a
    deterministic order. The sort is distributed; only the final join
    streams to the driver (small: formatted text, one pass)."""
    parts = []
    for batch in ds.sort(order_cols).iter_batches(batch_format="pandas"):
        parts.extend(batch[content_col].tolist())
    return separator.join(parts)


def run_stats(extracted: ray.data.Dataset) -> dict:
    """K6/G1 — cli.py:286-297 run totals. Single pass: per-batch
    partials → one tiny aggregate (never re-executes the upstream
    extraction pipeline)."""

    def partials(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_urls": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array(
                    [sum(t["token_count"].to_pylist())], pa.int64()
                ),
                "n_images": pa.array(
                    [sum(len(x or []) for x in t["images"].to_pylist())], pa.int64()
                ),
            }
        )

    agg = extracted.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("n_urls", alias_name="successful_urls"),
        Sum("n_tokens", alias_name="total_tokens"),
        Sum("n_images", alias_name="total_images"),
    )
    return {
        "successful_urls": int(agg["successful_urls"] or 0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "total_images": int(agg["total_images"] or 0),
    }


def write_jsonl_shards(
    ds,
    out_dir: str,
    rows_per_shard: int = 100_000,
) -> dict:
    """Training-export sink: the corpus as JSONL shards (the LLM-data
    interchange format) + an atomic ``_manifest.json``.

    Resumable-output contract (the repo's parquet-sink rule): shards
    are written by Ray's streaming `write_json` (one file per block —
    repartition first if block sizes are wild), the manifest records
    file names + row counts, and a rerun can compare counts instead of
    re-exporting. ``rows_per_shard`` bounds block size via repartition
    only when blocks would exceed it (no shuffle otherwise)."""
    import json
    import os

    import pyarrow.json  # noqa: F401  (ray write_json dependency)

    n_rows = ds.count()
    if rows_per_shard and n_rows > rows_per_shard:
        ds = ds.repartition(max(1, -(-n_rows // rows_per_shard)))
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(".json") or f.endswith(".jsonl") \
                    or f.startswith("_manifest.json"):
                os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    files = sorted(f for f in os.listdir(out_dir)
                   if f.endswith(".json") or f.endswith(".jsonl"))
    counts = {}
    for f in files:
        with open(os.path.join(out_dir, f), "rb") as fh:
            counts[f] = sum(1 for _ in fh)
    manifest = {"n_rows": n_rows, "n_files": len(files),
                "files": counts}
    assert sum(counts.values()) == n_rows, (sum(counts.values()), n_rows)
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return manifest
