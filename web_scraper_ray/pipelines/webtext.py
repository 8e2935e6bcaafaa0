"""Webtext release pipeline: crawl output (or a raw pages table) →
host-boilerplate strip → C4 line filter → partitioned parquet + atomic
manifest. The pages-side counterpart of ``pipelines/training_corpus``
(which releases the documents table): this is the chain a crawl
operator runs to turn a checkpoint into a publishable text corpus.

Streaming end to end: every stage is a ``map_batches`` scan or a slim
coarse-bucketed fold (ops/boilerplate.py module doc); nothing
corpus-shaped is ever collected. The sink follows the repo's
resumable-output contract — parquet shards from Ray's streaming
writer plus a ``_manifest.json`` (written via temp-file rename) with
input, params, and row counts, so a rerun can compare counts instead
of re-cleaning.

The per-stage semantics are the hash-checked ``webtext_clean`` query
(__ray_entry__) — this pipeline adds only the verdict filter and the
sink."""

from __future__ import annotations

import json
import os
from typing import Optional

import ray.data

from ..ops.boilerplate import strip_boilerplate
from ..ops.lines import line_filter_stats


def _read_pages(source: str, from_checkpoint: bool) -> ray.data.Dataset:
    if from_checkpoint:
        from ..ops.graph import _crawl_output_files

        files = _crawl_output_files(source)
        if not files:
            raise FileNotFoundError(
                f"no completed round outputs under checkpoint {source}")
        return ray.data.read_parquet(files, columns=["url", "text"])
    return ray.data.read_parquet(source, columns=["url", "text"])


def webtext_release(
    source: str,
    out_dir: str,
    from_checkpoint: bool = False,
    min_pages: int = 3,
    min_words: int = 3,
    terminal: str = '.!?")',
    strip_mode: str = "auto",
    drop_rejected: bool = True,
    n_buckets: Optional[int] = None,
) -> dict:
    """Run the cleaning chain over ``source`` (a pages parquet
    path/dir, or a crawl checkpoint with ``from_checkpoint=True``) and
    write the release to ``out_dir``. Returns the manifest dict.

    Output rows: ``(url, text, n_lines, n_kept)`` — ``text`` is the
    surviving lines re-joined; with ``drop_rejected`` (default) pages
    failing the document verdict are excluded from the release (their
    count is still in the manifest)."""
    kwargs = {} if n_buckets is None else {"n_buckets": n_buckets}
    pages = lambda: _read_pages(source, from_checkpoint)  # noqa: E731
    stripped = strip_boilerplate(pages(), min_pages=min_pages,
                                 mode=strip_mode, **kwargs)
    stats = line_filter_stats(stripped, text_col="text", id_col="url",
                              min_words=min_words, terminal=terminal)

    def finalize(df):
        out = df.rename(columns={"clean_text": "text"})
        if drop_rejected:
            out = out[out["kept"]]
        return out[["url", "text", "n_lines", "n_kept"]]

    released = stats.map_batches(finalize, batch_format="pandas")

    if os.path.isdir(out_dir):
        existing = os.listdir(out_dir)
        # only auto-clean a PRIOR RELEASE (identified by its manifest);
        # refuse to delete parquet from a directory this pipeline did
        # not write — a mistyped out_dir must not destroy data
        if existing and "_manifest.json" not in existing:
            raise ValueError(
                f"out_dir {out_dir!r} is non-empty but has no "
                "_manifest.json — refusing to overwrite a directory "
                "that is not a prior webtext release; pass an empty "
                "or fresh directory"
            )
        for f in existing:
            if f.endswith(".parquet") or f.startswith("_manifest.json"):
                os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)
    released.write_parquet(out_dir)

    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    n_rows = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
                 for f in files)
    manifest = {
        "source": source,
        "from_checkpoint": from_checkpoint,
        "params": {"min_pages": min_pages, "min_words": min_words,
                   "terminal": terminal, "drop_rejected": drop_rejected},
        "n_files": len(files),
        "n_rows": n_rows,
    }
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return manifest
