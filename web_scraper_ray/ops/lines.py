"""C4-style line-level quality filtering (Raffel et al. 2020, §2.2 —
the public C4 cleaning rules): keep a line only if it ends in terminal
punctuation, has at least ``min_words`` words, and mentions none of the
``drop_tokens`` (C4 drops "javascript" lines); drop a whole document if
its lowercased text contains any ``doc_drop_substrings`` ("lorem
ipsum", "{" in C4) or too few lines survive.

Ray-Data shape: one stateless ``map_batches`` pass — line splitting,
per-line predicates, and the per-document fold are all vectorized
(``str.split`` → ``explode`` → string kernels → index-level groupby);
no shuffle, no per-row Python in the hot path. Scale is linear in
bytes, embarrassingly parallel.

SQL-parity discipline (what the DuckDB twin in __ray_entry__ replays):
  * whitespace stripped before the terminal-punctuation test is the
    EXPLICIT class ``" \\t\\r\\f\\v"`` — Python's argless ``rstrip``
    strips unicode whitespace, DuckDB ``rtrim`` only what it's given;
  * a "word" is a maximal run of non-space characters (``[^ ]+`` ==
    ``list_filter(string_split(line, ' '), x -> x <> '')``);
  * substring tests are lowercase ``contains``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

_RSTRIP = " \t\r\f\v"


def line_filter_stats(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    terminal: str = '.!?"',
    drop_tokens: tuple[str, ...] = ("javascript",),
    doc_drop_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
    min_kept_lines: int = 1,
) -> ray.data.Dataset:
    """Per-document line-filter outcome: ``n_lines`` / ``n_kept``
    counts, the ``kept`` document verdict, and ``clean_text`` (the
    surviving lines re-joined in order). Total — emits every input
    document; callers filter on ``kept`` (see :func:`c4_clean`)."""
    terminal_set = list(terminal)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_lines": pd.Series([], dtype="int64"),
                "n_kept": pd.Series([], dtype="int64"),
                "kept": pd.Series([], dtype=bool),
                "clean_text": pd.Series([], dtype=object)})
        text = df[text_col].fillna("")
        lines = text.str.split("\n")
        ex = lines.explode().fillna("")
        stripped = ex.str.rstrip(_RSTRIP)
        end_ok = stripped.str[-1:].isin(terminal_set)
        words_ok = ex.str.count(r"[^ ]+") >= min_words
        low = ex.str.lower()
        tok_ok = pd.Series(True, index=ex.index)
        for tok in drop_tokens:
            tok_ok &= ~low.str.contains(tok, regex=False)
        keep_line = end_ok & words_ok & tok_ok

        n_lines = lines.str.len().astype("int64")
        n_kept = (keep_line.groupby(level=0).sum()
                  .reindex(df.index, fill_value=0).astype("int64"))
        clean = (ex[keep_line].groupby(level=0).agg("\n".join)
                 .reindex(df.index, fill_value=""))
        doc_ok = n_kept >= min_kept_lines
        tlow = text.str.lower()
        for sub in doc_drop_substrings:
            doc_ok &= ~tlow.str.contains(sub, regex=False)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_lines": n_lines.to_numpy(),
            "n_kept": n_kept.to_numpy(),
            "kept": doc_ok.to_numpy(dtype=bool),
            "clean_text": clean.to_numpy(dtype=object)})

    return ds.map_batches(stats, batch_format="pandas")


def c4_clean(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    """The filtering composite: surviving documents only, with their
    cleaned text — what a training-corpus pipeline consumes."""
    out = line_filter_stats(ds, **kw)
    return out.map_batches(
        lambda t: t.filter(t["kept"]).drop_columns(["kept"]),
        batch_format="pyarrow")
