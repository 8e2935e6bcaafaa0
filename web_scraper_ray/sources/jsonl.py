"""JSONL (newline-delimited JSON) source — the LLM-data interchange
format the :func:`web_scraper_ray.sinks.write_jsonl_shards` sink
exports. Together they close the roundtrip: parquet → JSONL shards →
Dataset, so a corpus released as JSONL re-enters the engine without a
conversion step.

Ray-Data shape: ``ray.data.read_json`` (Arrow's NDJSON reader — one
read task per shard, streaming). JSONL has no column statistics or
row groups, so unlike parquet there is no predicate/column pushdown at
the read; ``columns`` prunes immediately AFTER parse (still before
anything crosses a stage boundary). For repeated analytical access,
convert to parquet once — this source is for ingest, not for serving
scans.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import ray.data


def read_jsonl(
    path: str,
    columns: Optional[list[str]] = None,
    verify_manifest: bool = True,
) -> ray.data.Dataset:
    """Read a JSONL file or a shard directory written by
    ``write_jsonl_shards``.

    With ``verify_manifest`` (default) and a ``_manifest.json``
    present, the shard listing is checked against the manifest BEFORE
    reading — a torn or partially-deleted export fails loudly here
    instead of surfacing as silently missing rows downstream."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if (f.endswith(".json") or f.endswith(".jsonl"))
            and not f.startswith("_"))  # _manifest.json, _SUCCESS, …
        mpath = os.path.join(path, "_manifest.json")
        if verify_manifest and os.path.exists(mpath):
            with open(mpath) as fh:
                manifest = json.load(fh)
            have = sorted(os.path.basename(f) for f in files)
            want = sorted(manifest.get("files", {}))
            if have != want:
                raise FileNotFoundError(
                    f"JSONL export at {path} does not match its "
                    f"manifest: have {len(have)} shards, manifest "
                    f"lists {len(want)}")
        if not files:
            raise FileNotFoundError(f"no .json/.jsonl shards under {path}")
        ds = ray.data.read_json(files)
    else:
        ds = ray.data.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
