"""Unigram-LM quality scoring (CCNet-style) and tokenizer-training
corpus statistics.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") buckets web documents by the perplexity
of a language model trained on a clean TARGET domain — low-perplexity
docs look like the target, high-perplexity docs are noise. The
reference engine has no LM scoring (its quality signal is the cleaning
kernel itself); this module adds the scale-pipeline analog over the
``documents`` table.

Integer-bit surprisal — the exactness trick: a float ``log p`` breaks
the repo's oracle rule (sums of floats are order-dependent across
partitions), so the per-token surprisal is quantized to WHOLE BITS
with pure integer arithmetic::

    bits(tok) = floor(log2(T / (c_tok + 1))) = (T // (c_tok + 1)).bit_length() - 1

where ``c_tok`` is the token's occurrence count in the target corpus
and ``T`` the target's total token count (add-one smoothing; an OOV
token costs ``T.bit_length() - 1`` bits, the model's maximum). DuckDB
replays it as ``length(bin(T // (c + 1))) - 1`` (verified bit-equal
over the int64 domain), so per-doc totals and the filter decision are
hash-checkable end to end. Whole-bit quantization is coarse as an LM
(it can't rank two tokens whose true surprisals differ by < 1 bit) but
monotone in frequency, which is all the head/middle/tail bucketing
needs.

Ray-Data shape (one counting pass over the SMALL target + one scoring
scan over the FULL corpus):

  1. target vocabulary — per-batch occurrence-count partials, coarse
     md5-bucket ``groupby`` (the ``doc_frequency`` pattern: one row
     per (token, batch) shuffles, and per-token folds run vectorized
     inside 64 partitions, never via Ray's per-key machinery). Each
     token lands in exactly one bucket, so partition folds are global.
  2. a Ray task folds the counts into ONE ``token -> bits`` dict in
     the object store (the driver never holds the vocabulary; every
     scoring task ``ray.get``-s the same copy — broadcast, not
     per-batch reshipping). The target domain is small by design
     (CCNet trains on curated text), so the vocab fits one object;
     at open-vocabulary scale shard it by token hash and bucket-join
     (the documented ``tfidf_topk`` trade).
  3. scoring scan — pure ``map_batches``: C-level ``findall``, one
     vectorized dict-map per batch, per-doc ``bincount`` fold. Docs
     with zero tokens carry no evidence and are dropped (CCNet drops
     empties before bucketing).

The BPE merge counter at the bottom is the OTHER corpus-statistics
pass a tokenizer pipeline needs: one merge step of BPE training =
"count every adjacent pre-token pair corpus-wide, take the argmax".
Same combiner + coarse-bucket shape; pair counts are exact ints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data

from web_scraper_ray.ops.decontam import _TOKEN_RE

__all__ = ["surprisal_scores", "surprisal_filter", "surprisal_buckets",
           "surprisal_by_group", "bigram_surprisal_scores",
           "bpe_merge_counts", "bpe_train", "bpe_encode"]


def _count_partials(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Per-batch token OCCURRENCE counts, coarse-bucketed for the
    shuffle (one row per (token, batch) moves, never one per
    occurrence)."""
    token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
    flat = [tok for lst in token_lists for tok in lst]
    if not flat:
        return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                             "token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    cnt = pd.Series(flat, dtype="object").value_counts()
    toks = cnt.index.to_numpy()
    cbkt = np.fromiter(
        (hashlib.md5(t.encode("utf-8")).digest()[0] & 63 for t in toks),
        dtype=np.int64, count=len(toks),
    )
    return pd.DataFrame({"cbkt": cbkt, "token": toks,
                         "n": cnt.to_numpy().astype("int64")})


def _fold_partition(g: pd.DataFrame) -> pd.DataFrame:
    tot = g.groupby("token", sort=False)["n"].sum()
    return pd.DataFrame({"token": tot.index.to_numpy(),
                         "n": tot.to_numpy().astype("int64")})


@ray.remote(num_cpus=0)
def _fold_surprisal(*tables) -> tuple[dict, int]:
    """Fold global (token, n) rows into a ``token -> whole-bit
    surprisal`` dict (+ the OOV cost). Runs as a task: the driver
    never holds the vocabulary."""
    import pyarrow as pa

    tabs = [t for t in tables if t.num_rows]
    if not tabs:
        raise ValueError("target corpus has no tokens")
    t = pa.concat_tables(tabs)
    toks = t.column("token").to_pylist()
    ns = t.column("n").to_pylist()
    total = int(sum(ns))
    # max(..., 0): when c_tok == T (a single-type target) the quotient
    # is 0 and bit_length()-1 would give -1, but DuckDB's
    # length(bin(0))-1 is 0 — clamp so the SQL twin stays bit-equal
    # over the WHOLE domain, degenerate targets included
    bits = {tok: max((total // (int(n) + 1)).bit_length() - 1, 0)
            for tok, n in zip(toks, ns)}
    return bits, max(total.bit_length() - 1, 0)


def _target_bits_ref(target: ray.data.Dataset, text_col: str):
    folded = (
        target.select_columns([text_col])
        .map_batches(lambda df: _count_partials(df, text_col),
                     batch_format="pandas")
        .groupby("cbkt")
        .map_groups(_fold_partition, batch_format="pandas")
    )
    return _fold_surprisal.remote(*folded.to_arrow_refs())


def _doc_bits(df: pd.DataFrame, bits: dict, oov: int, id_col: str,
              text_col: str) -> pd.DataFrame:
    """Per-doc (id, n_tokens, total_bits, mean_bits_e2) for the docs
    of one batch that have >= 1 token."""
    token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    flat = [tok for lst in token_lists for tok in lst]
    # vectorized dict map; sums of <= 63-bit ints stay exact in the
    # float64 bincount accumulator far beyond any real doc length
    tok_bits = (pd.Series(flat, dtype="object").map(bits)
                .fillna(oov).to_numpy(dtype="float64"))
    idx = np.repeat(np.arange(len(df)), lens)
    totals = np.bincount(idx, weights=tok_bits,
                         minlength=len(df)).astype(np.int64)
    keep = lens > 0
    n = lens[keep]
    total_bits = totals[keep]
    return pd.DataFrame({
        id_col: df[id_col].to_numpy()[keep],
        "n_tokens": n,
        "total_bits": total_bits,
        "mean_bits_e2": (100 * total_bits) // n,
    })


def surprisal_scores(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Score every document of ``ds`` against a unigram LM of
    ``target``: rows ``(id, n_tokens, total_bits, mean_bits_e2)`` with
    ``total_bits`` the add-one-smoothed whole-bit surprisal sum and
    ``mean_bits_e2 = (100 * total_bits) // n_tokens`` the fixed-point
    per-token mean (the CCNet bucketing statistic). Zero-token docs
    are dropped. Oracle: ``oracle_sql()['lm_surprisal']``."""
    ref = _target_bits_ref(target, text_col)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bits, oov = ray.get(ref)
        return _doc_bits(df, bits, oov, id_col, text_col)

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pandas"))


def surprisal_filter(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    max_mean_bits_e2: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """CCNet "head" selection: keep the rows of ``ds`` whose mean
    whole-bit surprisal against the ``target`` LM is at most
    ``max_mean_bits_e2`` (fixed-point, 100 = one bit/token). Scoring
    is fused into the filter scan, so full rows never reshuffle and
    zero-token docs (no evidence) are dropped. Oracle:
    ``oracle_sql()['lm_filter']``."""
    ref = _target_bits_ref(target, text_col)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        bits, oov = ray.get(ref)
        scored = _doc_bits(df, bits, oov, id_col, text_col)
        ok = scored.loc[scored["mean_bits_e2"] <= max_mean_bits_e2,
                        id_col]
        return df.loc[df[id_col].isin(set(ok.to_numpy()))]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# BPE merge-pair counting — one merge step of tokenizer training


def bpe_merge_counts(
    ds: ray.data.Dataset,
    k: int = 20,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide adjacent-token-pair counts — the statistic a BPE /
    WordPiece trainer computes every merge step ("which two adjacent
    units co-occur most?"), here over whitespace pre-tokens. Returns
    the top ``k`` rows ``(p1, p2, n)`` by count desc, then (p1, p2)
    asc — a deterministic total order.

    Scale shape: per-batch pair counts (C-level findall + one pandas
    ``value_counts`` over the zipped pair frame) → coarse md5-bucket
    ``groupby`` folds (pair cardinality is corpus-scale, so the
    shuffle key is a 64-way bucket, not the pair), then the global
    top-k is a sort+limit that moves only k rows per partition (each
    pair lives in exactly one bucket, so per-partition counts are
    already global). Oracle: ``oracle_sql()['bpe_merges']``."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        token_lists = [_TOKEN_RE.findall(t)
                       for t in df[text_col].fillna("")]
        p1: list[str] = []
        p2: list[str] = []
        for toks in token_lists:
            if len(toks) >= 2:
                p1.extend(toks[:-1])
                p2.extend(toks[1:])
        if not p1:
            return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                                 "p1": pd.Series([], dtype="object"),
                                 "p2": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        cnt = (pd.DataFrame({"p1": p1, "p2": p2})
               .groupby(["p1", "p2"], sort=False).size())
        idx = cnt.index
        cbkt = np.fromiter(
            (hashlib.md5(f"{a}\x00{b}".encode("utf-8")).digest()[0] & 63
             for a, b in zip(idx.get_level_values(0),
                             idx.get_level_values(1))),
            dtype=np.int64, count=len(cnt),
        )
        return pd.DataFrame({
            "cbkt": cbkt,
            "p1": idx.get_level_values(0).to_numpy(),
            "p2": idx.get_level_values(1).to_numpy(),
            "n": cnt.to_numpy().astype("int64"),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["p1", "p2"], sort=False)["n"].sum()
        out = pd.DataFrame({
            "p1": tot.index.get_level_values(0).to_numpy(),
            "p2": tot.index.get_level_values(1).to_numpy(),
            "n": tot.to_numpy().astype("int64"),
        })
        # local prune: only a partition's own top-k can reach the
        # global top-k (counts here are already global totals)
        return (out.sort_values(["n", "p1", "p2"],
                                ascending=[False, True, True])
                .head(k))

    ranked = (
        ds.select_columns([text_col])
        .map_batches(partials, batch_format="pandas")
        .groupby("cbkt")
        .map_groups(fold, batch_format="pandas")
        .sort(["n", "p1", "p2"], descending=[True, False, False])
        .limit(k)
    )
    return ranked


def surprisal_buckets(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    cut_pcts: tuple = (33, 67),
) -> ray.data.Dataset:
    """CCNet's head/middle/tail trisection: score every document
    against the ``target`` unigram LM (:func:`surprisal_scores`), cut
    the ``mean_bits_e2`` distribution at the exact ``cut_pcts``
    percentiles (the repo's integer quantile rule, ``ops/stats.py``),
    and label rows ``head`` (lowest surprisal — most target-like),
    ``middle``, ``tail``. Emits ``(id, mean_bits_e2, bucket)``.

    Shape: the scored table is pinned once (consumed by the histogram
    pass AND the labeling scan); the cuts are a 2-row object-store
    frame broadcast into the label scan — no extra shuffle beyond the
    quantile histogram's coarse-bucket fold. Oracle:
    ``oracle_sql()['lm_buckets']``."""
    from web_scraper_ray.ops.stats import quantiles_ref

    scored = surprisal_scores(ds, target, id_col=id_col,
                              text_col=text_col).materialize()
    cuts_ref = quantiles_ref(scored, "mean_bits_e2", cut_pcts)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        cuts = ray.get(cuts_ref)["value"].to_numpy()
        m = df["mean_bits_e2"].to_numpy()
        bucket = np.where(m <= cuts[0], "head",
                          np.where(m <= cuts[1], "middle", "tail"))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "mean_bits_e2": m,
                             "bucket": bucket})

    return scored.map_batches(label, batch_format="pandas")


# ---------------------------------------------------------------------------
# bigram LM with unigram backoff — one conditioning order up from the
# CCNet-style unigram score (context makes the "looks like the target"
# signal sharper: a document of common-but-shuffled words scores low
# under a unigram LM and high here)


def _pair_count_partials(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Per-batch adjacent-pair occurrence counts, coarse-bucketed —
    one row per (pair, batch) moves, never one per occurrence (the
    ``bpe_merge_counts`` shape, kept as full counts)."""
    p1s, p2s = [], []
    for t in df[text_col].fillna(""):
        toks = _TOKEN_RE.findall(t)
        p1s.extend(toks[:-1])
        p2s.extend(toks[1:])
    if not p1s:
        return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                             "p1": pd.Series([], dtype="object"),
                             "p2": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    cnt = (pd.DataFrame({"p1": p1s, "p2": p2s})
           .groupby(["p1", "p2"], sort=False).size())
    p1 = cnt.index.get_level_values(0).to_numpy()
    p2 = cnt.index.get_level_values(1).to_numpy()
    cbkt = np.fromiter(
        (hashlib.md5(f"{a}\x00{b}".encode("utf-8")).digest()[0] & 63
         for a, b in zip(p1, p2)),
        dtype=np.int64, count=len(p1),
    )
    return pd.DataFrame({"cbkt": cbkt, "p1": p1, "p2": p2,
                         "n": cnt.to_numpy().astype("int64")})


def _fold_pair_partition(g: pd.DataFrame) -> pd.DataFrame:
    tot = g.groupby(["p1", "p2"], sort=False)["n"].sum()
    return pd.DataFrame({
        "p1": tot.index.get_level_values(0).to_numpy(),
        "p2": tot.index.get_level_values(1).to_numpy(),
        "n": tot.to_numpy().astype("int64"),
    })


@ray.remote(num_cpus=0)
def _fold_bigram_model(n_uni: int, *tables) -> tuple[dict, dict, int]:
    """Fold (unigram tables..., bigram tables...) into the broadcast
    model ``(uni_counts, bi_counts, T)``. Runs as a task — the driver
    never holds either vocabulary. The target domain is small by
    design (CCNet trains on curated text); at open-vocabulary scale
    shard both dicts by token hash and bucket-join (the documented
    ``tfidf_topk`` trade)."""
    import pyarrow as pa

    uni_tabs = [t for t in tables[:n_uni] if t.num_rows]
    bi_tabs = [t for t in tables[n_uni:] if t.num_rows]
    if not uni_tabs:
        raise ValueError("target corpus has no tokens")
    u = pa.concat_tables(uni_tabs)
    uni = dict(zip(u.column("token").to_pylist(),
                   (int(x) for x in u.column("n").to_pylist())))
    bi: dict = {}
    if bi_tabs:
        b = pa.concat_tables(bi_tabs)
        bi = {(a, c): int(n) for a, c, n in zip(
            b.column("p1").to_pylist(), b.column("p2").to_pylist(),
            b.column("n").to_pylist())}
    return uni, bi, sum(uni.values())


def _bitlen_pos(arr: np.ndarray) -> np.ndarray:
    """bit_length of non-negative int64 values < 2^53 (token counts —
    far below): frexp's exponent is EXACT there (the sketch-module
    discipline); 0 maps to 0."""
    return np.frexp(arr.astype(np.float64))[1].astype(np.int64)


def bigram_surprisal_scores(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Score every document against a BIGRAM LM of ``target`` with
    unigram backoff, in the module's whole-bit integer discipline::

        bits(t_i | t_{i-1}) =
          unigram bits of t_i                 if i == 0 or t_{i-1} is OOV
          max(bitlen((c_uni(t_{i-1}) + 1)
                     // (c_bi(t_{i-1}, t_i) + 1)) - 1, 0)   otherwise

    (add-one smoothing; a seen-context/unseen-pair token costs
    ``~log2(c_prev)`` bits — the context's full evidence against it).
    Rows ``(id, n_tokens, total_bits, mean_bits_e2)``; zero-token docs
    dropped. Same two-pass shape as :func:`surprisal_scores` — the
    target folds to one broadcast model, scoring is a pure scan — with
    a second (pair-count) combiner pass over the target. Oracle:
    ``oracle_sql()['bigram_surprisal']``."""
    uni_folded = (
        target.select_columns([text_col])
        .map_batches(lambda df: _count_partials(df, text_col),
                     batch_format="pandas")
        .groupby("cbkt")
        .map_groups(_fold_partition, batch_format="pandas")
    )
    bi_folded = (
        target.select_columns([text_col])
        .map_batches(lambda df: _pair_count_partials(df, text_col),
                     batch_format="pandas")
        .groupby("cbkt")
        .map_groups(_fold_pair_partition, batch_format="pandas")
    )
    uni_refs = uni_folded.to_arrow_refs()
    bi_refs = bi_folded.to_arrow_refs()
    ref = _fold_bigram_model.remote(len(uni_refs), *uni_refs, *bi_refs)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        uni, bi, total = ray.get(ref)
        token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=len(token_lists))
        flat = [tok for lst in token_lists for tok in lst]
        prev = [lst[i - 1] if i else None
                for lst in token_lists for i in range(len(lst))]
        cu = (pd.Series(flat, dtype="object").map(uni)
              .fillna(-1).to_numpy(dtype="int64"))
        cp = (pd.Series(prev, dtype="object").map(uni)
              .fillna(0).to_numpy(dtype="int64"))
        cb = (pd.Series(list(zip(prev, flat)), dtype="object").map(bi)
              .fillna(0).to_numpy(dtype="int64"))
        # backoff lane: first token or OOV context -> unigram bits
        # np.where evaluates both lanes: clamp the OOV sentinel's
        # divisor to 1 (the lane's value is masked out anyway)
        uni_bits = np.where(
            cu < 0,
            max(total.bit_length() - 1, 0),
            np.maximum(_bitlen_pos(total // np.maximum(cu + 1, 1)) - 1, 0),
        )
        bi_bits = np.maximum(_bitlen_pos((cp + 1) // (cb + 1)) - 1, 0)
        bits = np.where(cp == 0, uni_bits, bi_bits).astype(np.float64)
        idx = np.repeat(np.arange(len(df)), lens)
        totals = np.bincount(idx, weights=bits,
                             minlength=len(df)).astype(np.int64)
        keep = lens > 0
        n = lens[keep]
        total_bits = totals[keep]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_tokens": n,
            "total_bits": total_bits,
            "mean_bits_e2": (100 * total_bits) // n,
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pandas"))


def surprisal_by_group(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-GROUP mean surprisal against the ``target`` unigram LM —
    the domain-quality ranking of a corpus mix (a source whose text
    looks like the curated target scores low; boilerplate/spam
    domains score high). Rows ``(group_col, n_tokens, total_bits,
    mean_bits_e2)`` with ``mean_bits_e2 = (100 * Σ total_bits) //
    Σ n_tokens`` over the group's scored docs (zero-token docs carry
    no evidence, exactly as :func:`surprisal_scores`).

    Shape: the scoring scan emits per-batch per-group PARTIAL sums
    (one row per group per batch — the combiner), then one tiny
    ``groupby(group)`` and a vectorized finishing scan; full rows
    never reshuffle and the model broadcasts once. Oracle:
    ``oracle_sql()['source_surprisal']``."""
    from ray.data.aggregate import Sum

    ref = _target_bits_ref(target, text_col)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits, oov = ray.get(ref)
        scored = _doc_bits(df, bits, oov, id_col, text_col)
        grp = (df.set_index(id_col)[group_col]
               .loc[scored[id_col]].to_numpy())
        agg = (pd.DataFrame({group_col: grp,
                             "n_tokens": scored["n_tokens"].to_numpy(),
                             "total_bits": scored["total_bits"].to_numpy()})
               .groupby(group_col, sort=False).sum().reset_index())
        return agg

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["mean_bits_e2"] = ((100 * df["total_bits"])
                              // df["n_tokens"]).astype("int64")
        return df

    return (ds.select_columns([id_col, group_col, text_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(group_col)
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("total_bits", alias_name="total_bits"))
            .map_batches(finish, batch_format="pandas"))


# ---------------------------------------------------------------------------
# BPE training — n merge steps with corpus re-tokenization between
# steps (bpe_merge_counts is ONE step's statistic; this runs the loop)

_MERGE_SEP = "\x01"


def bpe_train(
    ds: ray.data.Dataset,
    n_merges: int = 3,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Train ``n_merges`` BPE merges over whitespace pre-tokens: each
    step counts every adjacent unit pair corpus-wide, picks the winner
    (count desc, then (p1, p2) asc — a total order), and rewrites the
    corpus with the pair fused (joined by ``\\x01``), so later steps
    see merged units — the actual BPE training loop, not one step's
    statistic. Returns ``(step, p1, p2, n)``, one row per merge.

    Merge application is a plain left-to-right non-overlapping
    substring replace on the `` tok1 tok2 ... ``-joined unit string,
    bit-identical between Python ``str.replace`` and DuckDB
    ``replace``, which is what lets an ITERATIVE training run be
    SQL-hash-checked with the steps unrolled as CTEs (the
    ``kmeans_clusters`` precedent). KNOWN DEVIATION from canonical
    leftmost-greedy BPE on repeated-token runs: the space-delimited
    replace consumes the shared separator, so a run of >= 4 identical
    tokens fuses ONCE per pass (``a a a a`` under merge (a, a) →
    ``a\\x01a a a``) where canonical BPE fuses twice (``a\\x01a
    a\\x01a``) —
    engine and SQL twin agree exactly (both apply the same rewrite),
    but per-step pair statistics on such runs differ from a
    canonical tokenizer's. Oracle: ``oracle_sql()['bpe_train']``.

    Shape per step: one pair-count combiner pass (the
    ``bpe_merge_counts`` shape) + a 1-row ``sort+limit`` (the driver
    holds only the winner) + one rewrite scan; the evolving corpus
    state is materialized per step (object-store blocks, never the
    driver) because step k+1's input IS step k's output — the
    multi-pass nature of BPE training itself, not an implementation
    accident."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")

    def to_state(df: pd.DataFrame) -> pd.DataFrame:
        toks = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
        return pd.DataFrame(
            {"s": pd.Series([" " + " ".join(ts) + " "
                             for ts in toks if ts], dtype="object")})

    state = (ds.select_columns([text_col])
             .map_batches(to_state, batch_format="pandas").materialize())
    merges = []
    for step in range(n_merges):
        counts = (state.map_batches(
                      lambda df: _pair_count_partials(df, "s"),
                      batch_format="pandas")
                  .groupby("cbkt")
                  .map_groups(_fold_pair_partition, batch_format="pandas"))
        top = (counts.sort(["n", "p1", "p2"],
                           descending=[True, False, False])
               .limit(1).take(1))
        if not top:
            break
        p1, p2, n = top[0]["p1"], top[0]["p2"], int(top[0]["n"])
        merges.append({"step": step, "p1": p1, "p2": p2, "n": n})
        pat, rep = f" {p1} {p2} ", f" {p1}{_MERGE_SEP}{p2} "

        def rewrite(df: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            return pd.DataFrame(
                {"s": df["s"].str.replace(pat, rep, regex=False)})

        state = (state.map_batches(rewrite, batch_format="pandas")
                 .materialize())
    return ray.data.from_pandas(pd.DataFrame(
        merges, columns=["step", "p1", "p2", "n"]).astype(
            {"step": "int64", "n": "int64"}))


def bpe_encode(
    ds: ray.data.Dataset,
    merges: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Apply a trained merge table (:func:`bpe_train`'s output) to the
    corpus: per doc, whitespace pre-tokens fused by each merge IN
    TRAINING ORDER (the BPE encode rule; same repeated-token-run
    deviation as :func:`bpe_train` — see its docstring), then unit
    counts — rows
    ``(id, n_pretokens, n_units)`` (``n_pretokens - n_units`` = merges
    applied). Zero-token docs are dropped (the module convention).

    The merge table is O(n_merges) — a bounded small side folded to
    one object-store list by a Ray task and broadcast into the encode
    scan (never per-batch reshipped); encoding itself is a pure
    ``map_batches`` of vectorized substring replaces. Oracle:
    ``oracle_sql()['bpe_encode']``."""
    @ray.remote(num_cpus=0)
    def fold(*tables) -> list:
        import pyarrow as pa

        live = [t for t in tables if t.num_rows]
        if not live:
            return []
        t = pa.concat_tables(live)
        rows = sorted(zip(t.column("step").to_pylist(),
                          t.column("p1").to_pylist(),
                          t.column("p2").to_pylist()))
        return [(p1, p2) for _, p1, p2 in rows]

    ref = fold.remote(*merges.to_arrow_refs())

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        pairs = ray.get(ref)
        toks = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
        s = pd.Series([" " + " ".join(ts) + " " for ts in toks],
                      dtype="object")
        for p1, p2 in pairs:
            s = s.str.replace(f" {p1} {p2} ", f" {p1}{_MERGE_SEP}{p2} ",
                              regex=False)
        units = s.str.strip(" ").str.split(" ").map(len).to_numpy()
        keep = lens > 0
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_pretokens": lens[keep],
            "n_units": units[keep].astype("int64"),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(encode, batch_format="pandas"))
