"""Training-corpus pipeline — the composite a large-scale LLM-data
deployment runs end to end (the build brief's target workload):

    documents → quality gate (Gopher-style, exact-integer predicates)
      → exact dedup (md5, min-id-wins among survivors)
      → [optional] MinHash-LSH near-dup removal
      → language ID (actor pool) → rolling fingerprint → token counts
      → partitioned parquet + atomic manifest

Everything streams: the gate/dedup/labeling stages are map_batches +
one hash-bucket shuffle (exact dedup); no stage materializes the corpus
and the only driver state is the final stats dict (#langs rows).

The deterministic spine (gate → exact dedup → langid → fingerprint →
token counts) is SQL-expressible — the ``training_corpus`` query in
``__ray_entry__`` is the full composite replayed in DuckDB, hash-
checked column for column. The near-dup stage (not SQL-expressible) is
exercised by pytest over the synthetic corpus instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pandas as pd

import ray.data

from ..ops.dedup import exact_dedup, remove_near_duplicates
from ..ops.text import (
    LangIdModel,
    fingerprint_batch,
    quality_mask,
    text_stats_batch,
)

#: the composite's output schema (column order is part of the contract)
CORPUS_COLUMNS = [
    "doc_id", "n_chars", "est_tokens", "n_words", "n_punct", "n_upper",
    "n_stop", "pred_lang", "fingerprint",
]


def training_corpus_ds(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    near_dedup: bool = False,
    jaccard_threshold: float = 0.5,
    langid_concurrency: int = 2,
    repetition: bool = False,
    decontam_bench: Optional[ray.data.Dataset] = None,
    decontam_n: int = 8,
    lm_target: Optional[ray.data.Dataset] = None,
    lm_max_mean_bits_e2: int = 413,
    nb_pos: Optional[ray.data.Dataset] = None,
    nb_neg: Optional[ray.data.Dataset] = None,
    nb_min_margin_e2: Optional[int] = None,
    nb_keep_pct: Optional[int] = None,
    nb_population: Optional[ray.data.Dataset] = None,
    **quality_kwargs,
) -> ray.data.Dataset:
    """documents(id, text) → the curated corpus Dataset (CORPUS_COLUMNS).

    Stage order matters and is part of the semantics: the quality gate
    runs FIRST (cheap, vectorized, prunes most rows before anything
    shuffles), then the optional pure-filter gates — Gopher repetition
    (``repetition=True``), benchmark decontamination
    (``decontam_bench`` = the eval-set documents table) and the
    CCNet-style LM gate (``lm_target`` = the target-domain docs) and
    DCLM-style NB classifier gate (``nb_pos``/``nb_neg`` = the curated
    seed and random-crawl classes, ``ops/classifier.py``) —
    still before anything shuffles; exact dedup runs over the
    survivors (min id per md5), near-dup removal (optional) over the
    exact-deduped set, and
    the labeling stages (langid actor pool, fingerprint, token counts
    ride along from the gate) run last, over the smallest set."""

    def gate_keep_text(df: pd.DataFrame) -> pd.DataFrame:
        stats = text_stats_batch(df)
        stats = stats.assign(text=df["text"].fillna(""))
        return stats.loc[quality_mask(stats, **quality_kwargs)]

    gated = docs.select_columns([id_col, "text"]).map_batches(
        gate_keep_text, batch_format="pandas"
    )
    if repetition:
        from ..ops.text import repetition_filter

        gated = repetition_filter(gated)
    if decontam_bench is not None:
        from ..ops.decontam import decontaminate

        gated = decontaminate(gated, decontam_bench, n=decontam_n,
                              id_col=id_col)
    if lm_target is not None:
        # CCNet-style LM gate (ops/lm.py): still a pure per-doc
        # filter, so it runs with the other gates before any shuffle
        from ..ops.lm import surprisal_filter

        gated = surprisal_filter(gated, lm_target,
                                 max_mean_bits_e2=lm_max_mean_bits_e2,
                                 id_col=id_col)
    if nb_pos is not None and nb_neg is not None:
        # DCLM-style classifier gate (ops/classifier.py): the last of
        # the pure per-doc filters, still before any shuffle. The
        # percentile form (nb_keep_pct, cut calibrated on
        # nb_population — normally the FULL corpus, so the threshold
        # is corpus-relative the way production gates pick theirs)
        # and the absolute form (nb_min_margin_e2) are exclusive.
        if nb_keep_pct is not None:
            from ..ops.classifier import nb_filter_top

            gated = nb_filter_top(gated, nb_pos, nb_neg,
                                  keep_pct=nb_keep_pct,
                                  population=nb_population,
                                  id_col=id_col)
        else:
            from ..ops.classifier import nb_filter

            gated = nb_filter(gated, nb_pos, nb_neg,
                              min_margin_e2=nb_min_margin_e2 or 0,
                              id_col=id_col)
    deduped = exact_dedup(gated, text_col="text", id_col=id_col)
    if near_dedup:
        deduped = remove_near_duplicates(
            deduped, id_col=id_col, text_col="text",
            jaccard_threshold=jaccard_threshold,
        )
    labeled = deduped.map_batches(
        LangIdModel, batch_format="pandas", concurrency=langid_concurrency
    )
    finger = labeled.map_batches(
        lambda df: fingerprint_batch(df, "text"), batch_format="pandas"
    )
    return finger.map_batches(
        lambda df: df[CORPUS_COLUMNS], batch_format="pandas"
    )


def build_training_corpus(
    documents_path: str,
    out_dir: str,
    near_dedup: bool = True,
    **kwargs,
) -> dict:
    """Run the composite over a documents parquet table and write the
    curated corpus as partitioned parquet with an atomic ``_manifest``
    (input, row counts in/out, per-language counts) — the resumable-
    output contract: a rerun can compare input + counts instead of
    recomputing."""
    from ..ops import sized_read_parquet

    docs = sized_read_parquet(documents_path, columns=None)
    n_in = docs.count()
    out = training_corpus_ds(docs, near_dedup=near_dedup, **kwargs)

    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or f.startswith("_manifest.json"):
                os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)
    out.write_parquet(out_dir)

    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    n_out = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows for f in files
    )
    # per-language counts: #langs rows via a grouped count — the only
    # aggregate the driver holds
    lang_counts: dict[str, int] = {}
    for row in (
        ray.data.read_parquet(out_dir, columns=["pred_lang"])
        .groupby("pred_lang").count().take_all()
    ):
        lang_counts[row["pred_lang"]] = int(row["count()"])

    manifest = {
        "input": documents_path,
        "n_in": n_in,
        "n_out": n_out,
        "n_files": len(files),
        "near_dedup": near_dedup,
        "lang_counts": lang_counts,
    }
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return manifest
