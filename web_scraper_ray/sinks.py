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
from ray.data.aggregate import Count, Sum

from .functions.urls import sanitize_filename, url_hash64


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
            parsed_url = urlparse(source)
            domain = parsed_url.netloc
            path = parsed_url.path.rstrip("/")
            if not path:
                path = "index"
            else:
                path = path.replace("/", "_").lstrip("_")
            filename = f"{domain}_{path}"
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
) -> int:
    """Distributed file sink (K1): each formatted record lands in a file
    named by the reference's rules + hash suffix. Parallel-safe and
    idempotent (same input → same names → overwrite-in-place)."""
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
    return written.count()


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
    """K6/G1 — cli.py:286-297 run totals as a Dataset aggregate."""
    agg = extracted.aggregate(
        Count(alias_name="successful_urls"),
        Sum("token_count", alias_name="total_tokens"),
    )
    n_images = extracted.map_batches(
        lambda t: pa.table({"n": pa.array([sum(len(x or []) for x in t["images"].to_pylist())], pa.int64())}),
        batch_format="pyarrow",
    ).sum("n")
    return {
        "successful_urls": agg["successful_urls"],
        "total_tokens": agg["total_tokens"],
        "total_images": int(n_images or 0),
    }
