"""Streaming sketches — the constant-state profiling ops of a 100-TB
corpus: HyperLogLog distinct counting (Flajolet et al. 2007),
Count-Min frequency estimation (Cormode & Muthukrishnan 2005), and a
Bloom membership pre-filter. Each replaces a vocabulary- or
key-set-scale shuffle with a fixed few-KiB summary that merges by
elementwise max/sum/or — the combiner pattern in its purest form.

Determinism discipline (the repo's oracle rule): the hash is the
md5-upper-half uint64 (the sampling-family convention — DuckDB
replays every bit), register ranks are pure integer bit arithmetic,
and the raw estimator is computed with EXACT integers::

    S'  = sum over the m registers of 2^(64 - M[j])      (HUGEINT)
    est = ALPHA_E6 * m^2 * 2^64 // (10^6 * S')

with ``ALPHA_E6`` the standard alpha_1024 pinned to a fixed-point
constant. The small-range (linear counting) branch needs one log —
computed as ONE correctly-rounded IEEE division + libm ``log`` + an
exact power-of-two scale + ``floor``, the bm25 float discipline
(``ops/retrieval.py``), so even the corrected estimate replays
bit-for-bit in DuckDB (``oracle_sql()['approx_distinct_events']``).
The large-range correction (est > 2^64/30) is irrelevant below ~10^18
distincts and deliberately omitted.

Ray-Data shape: per-batch register partials — at most m (idx, rank)
rows per batch regardless of batch size (the combiner) — shuffle on a
coarse 64-way bucket of the register index (never a groupby on the
raw index: the per-key machinery costs more than the fold), elementwise
max inside each partition, and one final estimator task over <= m rows.
Merging sketches of different corpora = the same elementwise max, so
the op composes for incremental profiling.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

import ray
import ray.data

__all__ = ["approx_distinct", "approx_distinct_by",
           "cms_point_estimates", "bloom_candidates", "heavy_hitters",
           "HLL_P", "HLL_M", "ALPHA_E6", "CMS_W", "CMS_D",
           "BLOOM_BITS", "BLOOM_K"]

HLL_P = 10                 #: register-index bits
HLL_M = 1 << HLL_P         #: 1024 registers (~3.25% typical error)
#: floor(1e6 * 0.7213 / (1 + 1.079/1024)) — standard alpha_m, pinned
ALPHA_E6 = 720541
_REST_BITS = 64 - HLL_P
_REST_MASK = (1 << _REST_BITS) - 1


def _hash64(vals) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in vals),
        dtype=np.uint64, count=len(vals),
    )


def _ranks(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Register index + rank per uint64 hash.

    rank = leading-zero count of the low 54 bits + 1
         = 55 - bit_length(rest); rest == 0 -> 55.
    bit_length via np.frexp's exponent: EXACT for any integer that
    float64 represents exactly (< 2^53; np.log2 is NOT — it rounds
    up to k for values just under 2^k). The >= 2^53 tail (where the
    int->float conversion itself rounds) falls back to Python ints."""
    idx = (h >> np.uint64(_REST_BITS)).astype(np.int64)
    rest = (h & np.uint64(_REST_MASK)).astype(np.int64)
    blen = np.frexp(rest.astype(np.float64))[1].astype(np.int64)
    hi = rest >= (1 << 53)
    if hi.any():
        blen[hi] = np.fromiter((int(v).bit_length()
                                for v in rest[hi]), dtype=np.int64)
    return idx, (_REST_BITS + 1) - blen


def _partials(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """Per-batch register maxima: <= m rows out, whatever comes in."""
    if not len(df):
        return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                             "idx": pd.Series([], dtype="int64"),
                             "r": pd.Series([], dtype="int64")})
    idx, r = _ranks(_hash64(df[col]))
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, idx, r)
    live = np.nonzero(regs)[0]
    return pd.DataFrame({"cbkt": live % 64,
                         "idx": live,
                         "r": regs[live]})


def _fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
    tot = g.groupby("idx", sort=False)["r"].max()
    return pd.DataFrame({"idx": tot.index.to_numpy(),
                         "r": tot.to_numpy().astype("int64")})


@ray.remote(num_cpus=0)
def _estimate(*tables) -> pd.DataFrame:
    import pyarrow as pa

    live = [t for t in tables if t.num_rows]
    regs = np.zeros(HLL_M, dtype=np.int64)
    if live:
        t = pa.concat_tables(live)
        np.maximum.at(regs, t.column("idx").to_numpy(),
                      t.column("r").to_numpy())
    nnz = int((regs > 0).sum())
    zeros = HLL_M - nnz
    # exact integer harmonic sum: S' = sum 2^(64 - M[j])
    s_prime = sum((1 << (64 - int(r))) for r in regs)
    est = (ALPHA_E6 * HLL_M * HLL_M * (1 << 64)) // (1_000_000 * s_prime)
    if est <= (5 * HLL_M) // 2 and zeros > 0:
        # linear counting: one IEEE division + libm log (bit-identical
        # to DuckDB ln) + exact power-of-two scale + floor
        est = int(math.floor(HLL_M * math.log(HLL_M / zeros)))
    return pd.DataFrame({"n_distinct_est": pd.Series([est], dtype="int64"),
                         "n_registers_hit": pd.Series([nnz],
                                                      dtype="int64")})


def approx_distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """HyperLogLog estimate of ``count(distinct col)``: one row
    ``(n_distinct_est, n_registers_hit)``. Constant state (1024
    registers) at any corpus size; typical error ~3.25%."""
    folded = (ds.select_columns([col])
              .map_batches(lambda df: _partials(df, col),
                           batch_format="pandas")
              .groupby("cbkt")
              .map_groups(_fold_bucket, batch_format="pandas"))
    ref = _estimate.remote(*folded.to_arrow_refs())
    return ray.data.from_pandas_refs([ref])


def _estimate_one(regs_r: np.ndarray) -> int:
    """Exact-integer HLL estimate from a group's LIVE register ranks
    (same arithmetic as the global estimator; zero registers
    contribute 2^64 each to the harmonic sum)."""
    nnz = len(regs_r)
    zeros = HLL_M - nnz
    s_prime = (sum((1 << (64 - int(r))) for r in regs_r)
               + zeros * (1 << 64))
    est = (ALPHA_E6 * HLL_M * HLL_M * (1 << 64)) // (1_000_000 * s_prime)
    if est <= (5 * HLL_M) // 2 and zeros > 0:
        est = int(math.floor(HLL_M * math.log(HLL_M / zeros)))
    return est


def approx_distinct_by(
    ds: ray.data.Dataset, col: str, group_col: str,
) -> ray.data.Dataset:
    """Per-group HyperLogLog: one row ``(group_col, n_distinct_est,
    n_registers_hit)`` per group — ``count(distinct col) GROUP BY
    group_col`` at constant per-group state (the per-source /
    per-event-type distinct-user profile of a corpus whose raw key
    sets would be a shuffle).

    Shape: per-batch (group, idx) register maxima — at most
    ``groups_in_batch × m`` rows out of any batch (the combiner) —
    shuffled on a coarse 64-way bucket of (group, idx) so one hot
    group cannot pin a partition, elementwise max inside each bucket,
    and one estimator task over ``#groups × m`` rows. Group
    cardinality is assumed small (event types, sources, languages);
    the registers themselves never exceed a few KiB per group."""
    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                                 "grp": pd.Series([], dtype="object"),
                                 "idx": pd.Series([], dtype="int64"),
                                 "r": pd.Series([], dtype="int64")})
        idx, r = _ranks(_hash64(df[col]))
        tot = (pd.DataFrame({"grp": df[group_col].to_numpy(),
                             "idx": idx, "r": r})
               .groupby(["grp", "idx"], sort=False)["r"].max()
               .reset_index())
        gh = (pd.util.hash_array(tot["grp"].to_numpy(dtype=object))
              % np.uint64(64)).astype(np.int64)
        tot.insert(0, "cbkt", (gh + tot["idx"]) % 64)
        return tot

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["grp", "idx"], sort=False)["r"].max()
        return pd.DataFrame({
            "grp": tot.index.get_level_values(0).to_numpy(),
            "idx": tot.index.get_level_values(1).to_numpy(),
            "r": tot.to_numpy().astype("int64"),
        })

    folded = (ds.select_columns([col, group_col])
              .map_batches(partials, batch_format="pandas")
              .groupby("cbkt")
              .map_groups(fold, batch_format="pandas"))

    @ray.remote(num_cpus=0)
    def estimate(*tables) -> pd.DataFrame:
        import pyarrow as pa

        live = [t for t in tables if t.num_rows]
        grps, ests, nnzs = [], [], []
        if live:
            df = pa.concat_tables(live).to_pandas()
            tot = df.groupby(["grp", "idx"], sort=False)["r"].max()
            for grp in sorted(tot.index.get_level_values(0).unique()):
                sub = tot.xs(grp, level=0).to_numpy()
                grps.append(grp)
                ests.append(_estimate_one(sub))
                nnzs.append(len(sub))
        return pd.DataFrame({
            group_col: pd.Series(grps, dtype="object"),
            "n_distinct_est": pd.Series(ests, dtype="int64"),
            "n_registers_hit": pd.Series(nnzs, dtype="int64"),
        })

    return ray.data.from_pandas_refs([estimate.remote(*folded.to_arrow_refs())])


# ---------------------------------------------------------------------------
# Count-Min sketch — frequency point estimates over a token stream

CMS_W = 2048  #: counters per row
CMS_D = 4     #: independent hash rows


def _cms_pos(j: int, vals) -> np.ndarray:
    """Row-j counter positions: md5-upper-half of ``"{j}:{value}"``
    mod width (the sampling-family hash convention — SQL-replayable)."""
    pre = f"{j}:"
    return np.fromiter(
        (int.from_bytes(hashlib.md5((pre + str(v)).encode())
                        .digest()[:8], "big") % CMS_W for v in vals),
        dtype=np.int64, count=len(vals),
    )


def cms_point_estimates(
    ds: ray.data.Dataset,
    col: str,
    probes: tuple,
) -> ray.data.Dataset:
    """Count-Min frequency estimates for the ``probes`` keys over the
    ``col`` stream (Cormode & Muthukrishnan 2005): rows
    ``(key, est_count)`` with the classic one-sided guarantee
    ``est >= true`` (collisions only ever inflate). The sketch is
    CONSTANT d×w counters however large the stream — the hot-key /
    heavy-hitter probe of a 100-TB corpus where exact per-key counts
    would be a vocabulary-scale shuffle.

    Shape: per-batch partials emit at most d×w (row, pos, n) counter
    cells (the combiner), one coarse-bucket fold, and a final
    estimator task that takes the min over rows per probe. All counts
    are exact ints and the hash is md5 — the whole sketch replays in
    SQL (``oracle_sql()['cms_token_counts']``)."""
    probes = tuple(probes)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].to_numpy()
        if not len(vals):
            return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        js, poss, ns = [], [], []
        for j in range(CMS_D):
            counts = np.bincount(_cms_pos(j, vals), minlength=CMS_W)
            live = np.nonzero(counts)[0]
            js.append(np.full(len(live), j, dtype=np.int64))
            poss.append(live.astype(np.int64))
            ns.append(counts[live].astype(np.int64))
        j = np.concatenate(js)
        pos = np.concatenate(poss)
        return pd.DataFrame({"cbkt": (j * CMS_W + pos) % 64,
                             "j": j, "pos": pos,
                             "n": np.concatenate(ns)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["j", "pos"], sort=False)["n"].sum()
        return pd.DataFrame({
            "j": tot.index.get_level_values(0).to_numpy(),
            "pos": tot.index.get_level_values(1).to_numpy(),
            "n": tot.to_numpy().astype("int64"),
        })

    folded = (ds.select_columns([col])
              .map_batches(partials, batch_format="pandas")
              .groupby("cbkt")
              .map_groups(fold, batch_format="pandas"))

    @ray.remote(num_cpus=0)
    def estimate(*tables) -> pd.DataFrame:
        import pyarrow as pa

        cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        live = [t for t in tables if t.num_rows]
        if live:
            t = pa.concat_tables(live)
            cms[t.column("j").to_numpy(),
                t.column("pos").to_numpy()] = t.column("n").to_numpy()
        ests = []
        for p in probes:
            ests.append(min(int(cms[j, _cms_pos(j, [p])[0]])
                            for j in range(CMS_D)))
        return pd.DataFrame({"key": pd.Series(probes, dtype="object"),
                             "est_count": pd.Series(ests, dtype="int64")})

    return ray.data.from_pandas_refs([estimate.remote(*folded.to_arrow_refs())])


# ---------------------------------------------------------------------------
# Bloom filter — membership pre-filter for huge key sets

BLOOM_BITS = 1 << 17  #: 131072 bits = 16 KiB broadcast payload
BLOOM_K = 5           #: hash functions


def _bloom_pos(j: int, vals) -> np.ndarray:
    pre = f"{j}:"
    return np.fromiter(
        (int.from_bytes(hashlib.md5((pre + str(v)).encode())
                        .digest()[:8], "big") % BLOOM_BITS
         for v in vals),
        dtype=np.int64, count=len(vals),
    )


def bloom_candidates(
    ds: ray.data.Dataset,
    members: ray.data.Dataset,
    key_col: str,
    member_col: str | None = None,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose key is POSSIBLY in ``members``, by Bloom
    filter: no false negatives ever, false positives at the classic
    ``(1 - e^{-kn/m})^k`` rate. The deduplication / decontamination
    pre-filter shape for 100 TB: the member set itself may be
    billions of keys, but the thing that ships to every scan task is
    a CONSTANT 16 KiB bit array — candidates (a tiny fraction of the
    corpus) then go through an exact verification join, so the sketch
    can only cost work, never correctness.

    Build: per-batch position partials (distinct (pos) rows, <= m per
    batch — the combiner), one coarse-bucket dedup fold, and a Ray
    task packs the bit array into the object store; the driver never
    holds the member set. Probe: pure ``map_batches`` scan — k
    vectorized bit lookups per row. md5 positions replay in SQL
    (``oracle_sql()['bloom_candidates']``)."""
    member_col = member_col or key_col

    def mpartials(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.unique(df[member_col])
        if not len(vals):
            return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        pos = np.unique(np.concatenate(
            [_bloom_pos(j, vals) for j in range(BLOOM_K)]))
        return pd.DataFrame({"cbkt": pos % 64, "pos": pos})

    def dedup_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"pos": np.unique(g["pos"].to_numpy())})

    folded = (members.select_columns([member_col])
              .map_batches(mpartials, batch_format="pandas")
              .groupby("cbkt")
              .map_groups(dedup_fold, batch_format="pandas"))

    @ray.remote(num_cpus=0)
    def pack_bits(*tables) -> np.ndarray:
        bits = np.zeros(BLOOM_BITS, dtype=bool)
        for t in tables:
            if t.num_rows:
                bits[t.column("pos").to_numpy()] = True
        return bits

    ref = pack_bits.remote(*folded.to_arrow_refs())

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(ref)  # zero-copy plasma read
        if not len(df):
            return df
        ok = np.ones(len(df), dtype=bool)
        vals = df[key_col]
        for j in range(BLOOM_K):
            ok &= bits[_bloom_pos(j, vals)]
        return df.loc[ok]

    return ds.map_batches(probe, batch_format="pandas")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters with an exact recount — EXACT output from
# two streaming scans and a candidate-bounded shuffle


def heavy_hitters(
    ds: ray.data.Dataset,
    min_frac_e4: int = 100,
    k: int | None = None,
    text_col: str = "text",
) -> ray.data.Dataset:
    """EXACT corpus-wide heavy tokens — every token whose occurrence
    count satisfies ``10000 * n >= min_frac_e4 * n_total`` (integer
    cross-multiplication, no division) — without ever shuffling the
    vocabulary. Rows ``(token, n)`` with exact counts.

    The Misra-Gries/pigeonhole trick (Misra & Gries 1982): scan 1
    keeps, per batch, only the tokens with ``c_b > n_b / (k + 1)``
    (vectorized value_counts + an integer cross-multiplied threshold —
    the batch-local frequent filter, an MG(k)-equivalent summary). A
    token with global count ``> n_total / (k + 1)`` must exceed that
    bar in at least one batch (pigeonhole), so with
    ``k + 1 >= 10000 / min_frac_e4`` the candidate UNION provably
    contains every true heavy hitter regardless of how rows were
    batched. Scan 2 recounts ONLY the candidates exactly (combiner
    partials, coarse md5-bucket fold) and applies the threshold — the
    spurious candidates fall out, so the output is the exact answer,
    independent of batch boundaries and parallelism (the default
    ``k = 2 * 10000 // min_frac_e4`` carries a 2x safety margin; any
    ``k`` above the bound changes only the candidate-set size, never
    the output).

    Scale shape: state per batch is <= k + 1 candidate rows + one
    total row; the only shuffle is the recount fold, bounded by the
    candidate cardinality (<= (k+1) x batches worst case, in practice
    the heavy tail). The candidate set broadcasts once via the object
    store; at open-vocabulary scale where even that outgrows one
    object, shard the recount by token hash (the documented
    ``tfidf_topk`` trade). Oracle: ``oracle_sql()['heavy_tokens']``
    (plain GROUP BY + HAVING — exactness makes the sketch
    SQL-checkable, unlike CMS point estimates).
    """
    from web_scraper_ray.ops.decontam import _TOKEN_RE

    if k is None:
        k = max(1, 2 * 10000 // max(min_frac_e4, 1))

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = [t for x in df[text_col].fillna("")
                for t in _TOKEN_RE.findall(x)]
        n_b = len(toks)
        if not n_b:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "nb": pd.Series([], dtype="int64")})
        cnt = pd.Series(toks, dtype="object").value_counts()
        # >= (not >): with a caller-supplied k exactly at the bound
        # k+1 == 10000/min_frac_e4, a token whose GLOBAL count sits
        # exactly on the output threshold has (k+1)*c_b == n_b in the
        # averaging-argument batch — strict > would miss it in every
        # batch and break the exactness guarantee at that boundary
        cand = cnt.index.to_numpy()[(k + 1) * cnt.to_numpy() >= n_b]
        return pd.DataFrame({
            "token": np.concatenate([cand.astype(object), [None]]),
            "nb": np.concatenate([np.zeros(len(cand), dtype=np.int64),
                                  [n_b]]),
        })

    @ray.remote(num_cpus=0)
    def fold_candidates(*tables) -> tuple[frozenset, int]:
        toks: set = set()
        total = 0
        for t in tables:
            if not t.num_rows:
                continue
            for tok, nb in zip(t.column("token").to_pylist(),
                               t.column("nb").to_pylist()):
                if tok is None:
                    total += int(nb)
                else:
                    toks.add(tok)
        return frozenset(toks), total

    stage1 = ds.select_columns([text_col]).map_batches(
        partials, batch_format="pandas")
    ref = fold_candidates.remote(*stage1.to_arrow_refs())

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cand, _ = ray.get(ref)
        toks = [t for x in df[text_col].fillna("")
                for t in _TOKEN_RE.findall(x) if t in cand]
        if not toks:
            return pd.DataFrame({"cbkt": pd.Series([], dtype="int64"),
                                 "token": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        cnt = pd.Series(toks, dtype="object").value_counts()
        t_arr = cnt.index.to_numpy()
        cbkt = np.fromiter(
            (hashlib.md5(t.encode("utf-8")).digest()[0] & 63
             for t in t_arr), dtype=np.int64, count=len(t_arr))
        return pd.DataFrame({"cbkt": cbkt, "token": t_arr,
                             "n": cnt.to_numpy().astype("int64")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        _, n_total = ray.get(ref)
        tot = g.groupby("token", sort=False)["n"].sum()
        n = tot.to_numpy().astype("int64")
        keep = 10000 * n >= min_frac_e4 * n_total
        return pd.DataFrame({"token": tot.index.to_numpy()[keep],
                             "n": n[keep]})

    return (ds.select_columns([text_col])
            .map_batches(recount, batch_format="pandas")
            .groupby("cbkt")
            .map_groups(fold, batch_format="pandas"))
