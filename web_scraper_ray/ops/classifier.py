"""Seed-vs-crawl quality classifier (Naive Bayes over whitespace
tokens) — the DCLM / FineWeb-style "fastText gate" analog.

Modern training-data pipelines gate web documents with a lightweight
linear classifier trained on a small CURATED positive set against a
random-crawl negative sample (DCLM's fastText filter, FineWeb-Edu's
quality scorer). The reference engine has no model-based gate (its
quality signal is the cleaning kernel); this module adds the
scale-pipeline analog over the ``documents`` table using multinomial
Naive Bayes, whose per-token log-likelihood ratio IS a linear
classifier over bag-of-words counts.

Integer-bit discipline (the repo's oracle rule — ``ops/lm.py``): each
class's per-token surprisal is quantized to whole bits with pure
integer arithmetic, ``bits_c(t) = floor(log2(T_c / (cnt_c(t) + 1)))``
(add-one smoothing; OOV costs ``bitlen(T_c) - 1``). The NB log-odds
margin of a document is then the exact integer::

    margin_bits(doc) = sum_t bits_neg(t) - sum_t bits_pos(t)

(positive = the positive class explains the document in fewer bits =
seed-like). No float log anywhere; DuckDB replays every step as
``length(bin(T // (c + 1))) - 1`` arithmetic, so scores, gates and the
discriminative-token ranking are all hash-checkable. The gate
threshold is applied by integer cross-multiplication
(``100 * margin >= thr_e2 * n_tokens``), never division — floor vs
truncation on negative margins cannot diverge because there is no
division.

Ray-Data shape (exactly two small counting passes + one scoring scan):

  1. the positive and negative TARGETS are small by design (DCLM's
     positive set is ~100k docs against a 100-TB corpus), each folded
     to a ``token -> whole-bit surprisal`` dict in the object store by
     ``ops/lm.py``'s combiner + coarse-bucket ``groupby`` + one fold
     task. The driver never holds a vocabulary; scoring tasks
     ``ray.get`` the same two objects (broadcast, not per-batch
     reshipping).
  2. scoring is ONE pure ``map_batches`` scan over the full corpus:
     C-level ``findall`` tokenization once per doc, two vectorized
     dict maps, two ``bincount`` folds. The gate fuses the decision
     into the same scan, so full rows never reshuffle.
  3. ``nb_top_tokens`` (model interpretability / debugging) joins the
     two count tables by coarse md5 bucket — one row per (token,
     side) moves — and takes a global top-k that ships k rows per
     partition (the ``bpe_merge_counts`` prune-then-sort shape).

At open-vocabulary scale the two dicts shard by token hash exactly as
documented for ``tfidf_topk``; the targets' curated-subset size makes
the single-object broadcast the right regime here.

No reference counterpart (the reference has no classifier; closest is
the token counter, ``/root/reference/contxt/scraper.py:407-426``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data

from web_scraper_ray.ops.decontam import _TOKEN_RE
from web_scraper_ray.ops.lm import _target_bits_ref

__all__ = ["nb_scores", "nb_filter", "nb_filter_top", "nb_top_tokens"]


def _dual_doc_bits(df: pd.DataFrame, bits_p: dict, oov_p: int,
                   bits_n: dict, oov_n: int, id_col: str,
                   text_col: str) -> pd.DataFrame:
    """Per-doc ``(id, n_tokens, pos_bits, neg_bits, margin_bits)`` for
    the docs of one batch with >= 1 token: tokenize ONCE, map the two
    class dicts, fold with two bincounts (sums of <= 63-bit ints stay
    exact in the float64 accumulator far beyond any real doc)."""
    token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    flat = [tok for lst in token_lists for tok in lst]
    s = pd.Series(flat, dtype="object")
    tp = s.map(bits_p).fillna(oov_p).to_numpy(dtype="float64")
    tn = s.map(bits_n).fillna(oov_n).to_numpy(dtype="float64")
    idx = np.repeat(np.arange(len(df)), lens)
    pos_tot = np.bincount(idx, weights=tp, minlength=len(df)).astype(np.int64)
    neg_tot = np.bincount(idx, weights=tn, minlength=len(df)).astype(np.int64)
    keep = lens > 0
    return pd.DataFrame({
        id_col: df[id_col].to_numpy()[keep],
        "n_tokens": lens[keep],
        "pos_bits": pos_tot[keep],
        "neg_bits": neg_tot[keep],
        "margin_bits": (neg_tot - pos_tot)[keep],
    })


def nb_scores(
    ds: ray.data.Dataset,
    pos: ray.data.Dataset,
    neg: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Score every document of ``ds`` with the Naive-Bayes log-odds
    margin between a ``pos`` (curated seed) and ``neg`` (random crawl)
    class: rows ``(id, n_tokens, pos_bits, neg_bits, margin_bits)``
    where ``margin_bits = neg_bits - pos_bits`` (positive = seed-like,
    in exact whole bits). Zero-token docs carry no evidence and are
    dropped. Oracle: ``oracle_sql()['nb_scores']``."""
    ref_p = _target_bits_ref(pos, text_col)
    ref_n = _target_bits_ref(neg, text_col)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bits_p, oov_p = ray.get(ref_p)
        bits_n, oov_n = ray.get(ref_n)
        return _dual_doc_bits(df, bits_p, oov_p, bits_n, oov_n,
                              id_col, text_col)

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pandas"))


def nb_filter(
    ds: ray.data.Dataset,
    pos: ray.data.Dataset,
    neg: ray.data.Dataset,
    min_margin_e2: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """The classifier GATE: keep the rows of ``ds`` whose mean NB
    margin is at least ``min_margin_e2`` fixed-point bits/token
    (100 = one bit/token). The decision is the pure-integer
    cross-multiplication ``100 * margin_bits >= min_margin_e2 *
    n_tokens`` — no division, so negative margins replay exactly in
    SQL. Scoring fuses into the filter scan (full rows never
    reshuffle); zero-token docs are dropped (no evidence). An absolute
    threshold only makes sense against a known corpus — the
    driver-checked gate is the self-calibrating :func:`nb_filter_top`;
    this variant is pytest-covered."""
    ref_p = _target_bits_ref(pos, text_col)
    ref_n = _target_bits_ref(neg, text_col)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        bits_p, oov_p = ray.get(ref_p)
        bits_n, oov_n = ray.get(ref_n)
        scored = _dual_doc_bits(df, bits_p, oov_p, bits_n, oov_n,
                                id_col, text_col)
        ok = scored.loc[100 * scored["margin_bits"]
                        >= min_margin_e2 * scored["n_tokens"], id_col]
        return df.loc[df[id_col].isin(set(ok.to_numpy()))]

    return ds.map_batches(keep, batch_format="pandas")


def nb_top_tokens(
    pos: ray.data.Dataset,
    neg: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
) -> ray.data.Dataset:
    """The model's ``k`` most seed-discriminative tokens — rows
    ``(token, c_pos, c_neg, w_bits)`` with ``w_bits = bits_neg(t) -
    bits_pos(t)`` over the UNION vocabulary (a side's missing token
    counts 0 and pays that side's OOV bits), ordered by ``w_bits``
    desc then token asc. This is the interpretability surface every
    production gate ships (which tokens drive admission?).

    Shape: per-side combiner partials → one union → coarse md5-bucket
    ``groupby`` (each token lives in exactly one bucket, so partition
    folds are global) → per-partition top-k prune → global sort+limit
    moving k rows per partition. Class totals fold as combiner sums
    (two scalar aggregates over the slim count tables). Oracle:
    ``oracle_sql()['nb_top_tokens']``."""
    from web_scraper_ray.ops.lm import _count_partials

    def tag(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = _count_partials(df, text_col)
            out["side"] = side
            return out
        return f

    counts = (
        pos.select_columns([text_col])
        .map_batches(tag("p"), batch_format="pandas")
        .union(neg.select_columns([text_col])
               .map_batches(tag("n"), batch_format="pandas"))
        .materialize()
    )
    # class token totals: two tiny scalar folds over the slim
    # (cbkt, token, n, side) partial table — no second corpus pass
    tot = (counts.map_batches(
        lambda df: pd.DataFrame({
            "tp": [int(df.loc[df["side"] == "p", "n"].sum())],
            "tn": [int(df.loc[df["side"] == "n", "n"].sum())]}),
        batch_format="pandas")
        .sum(["tp", "tn"]))
    t_pos, t_neg = int(tot["sum(tp)"]), int(tot["sum(tn)"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        piv = (g.pivot_table(index="token", columns="side", values="n",
                             aggfunc="sum", fill_value=0)
               .reindex(columns=["p", "n"], fill_value=0))
        cp = piv["p"].to_numpy(dtype=np.int64)
        cn = piv["n"].to_numpy(dtype=np.int64)
        # whole-bit class surprisals, clamped at 0 exactly as
        # lm._fold_surprisal (DuckDB's length(bin(0))-1 == 0)
        bp = np.fromiter((max((t_pos // (int(c) + 1)).bit_length() - 1, 0)
                          for c in cp), dtype=np.int64, count=len(cp))
        bn = np.fromiter((max((t_neg // (int(c) + 1)).bit_length() - 1, 0)
                          for c in cn), dtype=np.int64, count=len(cn))
        out = pd.DataFrame({"token": piv.index.to_numpy(),
                            "c_pos": cp, "c_neg": cn,
                            "w_bits": bn - bp})
        # local prune: counts here are already global (one bucket per
        # token), so only a partition's own top-k can reach the global
        return (out.sort_values(["w_bits", "token"],
                                ascending=[False, True]).head(k))

    return (counts.groupby("cbkt")
            .map_groups(fold, batch_format="pandas")
            .sort(["w_bits", "token"], descending=[True, False])
            .limit(k))


#: shift that keeps the mean-margin scalar non-negative: per-token
#: margin is bounded below by -63 (a pos-class surprisal is at most
#: bitlen(T)-1 <= 63 bits, the neg side at least 0), so
#: 100*margin + 6400*n >= 100n > 0. Non-negativity matters because
#: DuckDB's integer ``//`` truncates toward zero while Python's
#: floors — on the non-negative domain they agree bit-for-bit.
MM_SHIFT_E2 = 6400


def _mm_series(scored: pd.DataFrame) -> np.ndarray:
    """Per-doc shifted mean margin (fixed-point hundredth bits):
    ``(100*margin + 6400*n) // n`` — the order statistic the
    percentile gate cuts on."""
    n = scored["n_tokens"].to_numpy()
    m = scored["margin_bits"].to_numpy()
    return (100 * m + MM_SHIFT_E2 * n) // n


def nb_filter_top(
    ds: ray.data.Dataset,
    pos: ray.data.Dataset,
    neg: ray.data.Dataset,
    keep_pct: int = 30,
    population: ray.data.Dataset | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """The DCLM-style SELF-CALIBRATING gate: keep the rows of ``ds``
    whose shifted mean NB margin reaches the ``(100 - keep_pct)``-th
    percentile of the ``population`` (default: ``ds`` itself) — "top
    keep_pct% of the corpus by classifier score", the way production
    classifier gates actually pick their threshold (an absolute margin
    cut calibrated on one corpus is vacuous or empty on the next; the
    repo measured exactly that between its own sf scales). The cut
    uses the integer quantile rule (``ops/stats.py``) on the shifted
    scalar (:data:`MM_SHIFT_E2` — non-negative, so Python/DuckDB
    division agree), computed once and broadcast; scoring fuses into
    the filter scan. Oracle: ``oracle_sql()['nb_gate']`` and the
    ``_nb_top_ids_sql`` predicate inside the v3/release composites."""
    from web_scraper_ray.ops.stats import quantiles_ref

    ref_p = _target_bits_ref(pos, text_col)
    ref_n = _target_bits_ref(neg, text_col)

    def mm_rows(df: pd.DataFrame) -> pd.DataFrame:
        bits_p, oov_p = ray.get(ref_p)
        bits_n, oov_n = ray.get(ref_n)
        scored = _dual_doc_bits(df, bits_p, oov_p, bits_n, oov_n,
                                id_col, text_col)
        scored["mm"] = _mm_series(scored)
        return scored

    pop = population if population is not None else ds
    cut_ref = quantiles_ref(
        pop.select_columns([id_col, text_col]).map_batches(
            mm_rows, batch_format="pandas"),
        "mm", (100 - keep_pct,))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cut_val = ray.get(cut_ref)["value"].iloc[0]
        if pd.isna(cut_val):
            # empty / all-zero-token population: the quantile is
            # undefined, so the top-p% of nothing keeps nothing —
            # return an empty batch instead of crashing on int(NaN)
            return df.iloc[0:0]
        cut = int(cut_val)
        scored = mm_rows(df)
        ok = scored.loc[scored["mm"] >= cut, id_col]
        return df.loc[df[id_col].isin(set(ok.to_numpy()))]

    return ds.map_batches(keep, batch_format="pandas")
