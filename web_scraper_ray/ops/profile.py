"""Corpus profiling report — the first pipeline a data engineer runs
against a new 100-TB corpus: "how big is it, what does it contain?"

One long-format ``(metric, value)`` table from FOUR independent
passes, each built from a primitive this repo already oracle-checks:

  n_docs / n_tokens   one combiner scan (per-batch partials, tiny
                      groupby — the ``bm25`` stats-pass shape)
  vocab_est           HyperLogLog over the exploded token stream
                      (``ops/sketch.py`` — constant 1024 registers
                      however large the vocabulary)
  chars_p50 / p90     exact integer quantiles of ``n_chars``
                      (``ops/stats.py`` histogram rule)
  n_sources           exact distinct of the (small-cardinality)
                      source column — a 20-key groupby

Nothing materializes the corpus; the driver holds only the final
six-row report. Every value is an exact int or a deterministic sketch
estimate, so the whole report is SQL-hash-checkable
(``oracle_sql()['corpus_profile']``).
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from web_scraper_ray.ops.decontam import _TOKEN_RE

__all__ = ["corpus_profile"]


def corpus_profile(
    ds: ray.data.Dataset,
    text_col: str = "text",
    group_col: str = "source",
    chars_col: str = "n_chars",
) -> ray.data.Dataset:
    """documents → six rows ``(metric, value)``: n_docs, n_tokens,
    vocab_est (HLL), chars_p50, chars_p90, n_sources. ``ds`` is
    consumed by several passes — pass a re-readable source (a parquet
    read), not an expensive unmaterialized pipeline."""
    from ray.data.aggregate import Sum

    from web_scraper_ray.ops.retrieval import _fold_stats
    from web_scraper_ray.ops.sketch import approx_distinct
    from web_scraper_ray.ops.stats import quantiles_ref

    def count_partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = sum(len(_TOKEN_RE.findall(t))
                   for t in df[text_col].fillna(""))
        return pd.DataFrame({"key": ["n_docs", "n_tokens"],
                             "n": pd.Series([len(df), toks],
                                            dtype="int64")})

    counts_ref = _fold_stats.remote(
        *ds.select_columns([text_col])
        .map_batches(count_partials, batch_format="pandas")
        .groupby("key").aggregate(Sum("n", alias_name="n"))
        .to_arrow_refs())

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = [t for s in df[text_col].fillna("")
                for t in _TOKEN_RE.findall(s)]
        return pd.DataFrame({"v": pd.Series(toks, dtype="object")})

    vocab_ref = approx_distinct(
        ds.select_columns([text_col])
        .map_batches(explode, batch_format="pandas"),
        "v").to_pandas_refs()[0]

    q_ref = quantiles_ref(ds, chars_col, (50, 90))

    n_sources_ref = (ds.select_columns([group_col])
                     .groupby(group_col).count()
                     .count())  # 20-key groupby: exact, tiny

    @ray.remote(num_cpus=0)
    def assemble(counts: dict, vocab: pd.DataFrame,
                 quants: pd.DataFrame, n_sources: int) -> pd.DataFrame:
        by_q = quants.set_index("q_pct")["value"]
        rows = [
            ("n_docs", counts.get("n_docs", 0)),
            ("n_tokens", counts.get("n_tokens", 0)),
            ("vocab_est", int(vocab.loc[0, "n_distinct_est"])),
            ("chars_p50", int(by_q[50])),
            ("chars_p90", int(by_q[90])),
            ("n_sources", int(n_sources)),
        ]
        return pd.DataFrame({"metric": [m for m, _ in rows],
                             "value": pd.Series([v for _, v in rows],
                                                dtype="int64")})

    ref = assemble.remote(counts_ref, vocab_ref, q_ref, n_sources_ref)
    return ray.data.from_pandas_refs([ref])
