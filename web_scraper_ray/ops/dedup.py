"""Deduplication family — exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine. Each is expressed Ray-Data-first:

    per-batch vectorized signature (map_batches)
      → explode to (bucket_key, id) rows
      → groupby(bucket) shuffle ONLY on the compact key table
      → candidate pairs verified inside the group
      → (optional) min-label propagation for clusters

The shuffle never moves document text — only ids + signatures — which
is what keeps these viable at 100 TB (SURVEY.md §2.8; guide's
"Aggregation at scale" sketch pattern).

Determinism: every hash is seeded blake2b/ polynomial arithmetic; no
process-salted ``hash()`` anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup

def add_md5_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["content_md5"] = df[text_col].fillna("").map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
    )
    return df


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 64) -> ray.data.Dataset:
    """Keep the min-id row per identical content (hash-partitioned
    shuffle on a coarse md5 bucket; first-wins == min id, matching the
    reference's first-occurrence-wins dedup semantics,
    ``contxt/scraper.py:462-474``)."""
    with_hash = ds.map_batches(
        lambda df: add_md5_batch(df, text_col), batch_format="pandas"
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = df["content_md5"].map(lambda h: int(h[:8], 16) % n_buckets)
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_md5", id_col], kind="mergesort")
        return g.drop_duplicates(subset=["content_md5"], keep="first").drop(
            columns=["bucket"]
        )

    return (
        with_hash.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hash set (uint64) of a document."""
    t = " ".join(text.split())  # normalize whitespace
    if len(t) < k:
        t = t + " " * (k - len(t))
    views = {t[i : i + k] for i in range(len(t) - k + 1)}
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in views
        ),
        dtype=np.uint64,
        count=len(views),
    )
    return out


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod p minwise signature, vectorized over shingles."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = shingles.astype(np.object_)  # python ints: exact 61-bit modmul
    sig = np.empty(len(a), dtype=np.uint64)
    for i in range(len(a)):
        vals = (int(a[i]) * x + int(b[i])) % _MERSENNE
        sig[i] = int(vals.min())
    return sig


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.k = shingle_k
        self.num_perm = num_perm

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(_shingle_hashes(t, self.k), self.a, self.b)
            for t in df["text"].fillna("")
        ]
        out = df.drop(columns=["text"]).copy()
        out["signature"] = [s.tolist() for s in sigs]
        return out


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """MinHash + LSH near-dup candidate pairs with exact signature-level
    Jaccard verification. Returns (id_a, id_b, sig_jaccard) with
    id_a < id_b, deduplicated across bands.

    Stages: signature (actor pool) → explode (band, band_hash, id) →
    groupby band bucket → pairs within bucket → verify estimated
    Jaccard (signature agreement rate) → global pair dedup.
    """
    rows_per_band = num_perm // bands
    if text_col != "text":
        ds = ds.map_batches(
            lambda df: df.rename(columns={text_col: "text"}), batch_format="pandas"
        )
    sigs = ds.select_columns([id_col, "text"]).map_batches(
        MinHasher(num_perm, shingle_k),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids, bnds, keys, sig_col = [], [], [], []
        for _, row in df.iterrows():
            sig = row["signature"]
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                key = int.from_bytes(
                    hashlib.blake2b(
                        repr((b, chunk)).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                ids.append(row[id_col])
                bnds.append(b)
                keys.append(key)
                sig_col.append(sig)
        return pd.DataFrame(
            {id_col: ids, "band": bnds, "band_key": keys, "signature": sig_col}
        )

    exploded = sigs.map_batches(explode_bands, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one LSH bucket: all docs sharing this band chunk
        g = g.sort_values(id_col, kind="mergesort").drop_duplicates(subset=[id_col])
        rows = list(g.itertuples(index=False))
        a_ids, b_ids, jac = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                sa = np.asarray(getattr(rows[i], "signature"), dtype=np.uint64)
                sb = np.asarray(getattr(rows[j], "signature"), dtype=np.uint64)
                est = float(np.mean(sa == sb))
                if est >= jaccard_threshold:
                    a_ids.append(getattr(rows[i], id_col))
                    b_ids.append(getattr(rows[j], id_col))
                    jac.append(est)
        return pd.DataFrame(
            {"id_a": pd.Series(a_ids, dtype="int64"),
             "id_b": pd.Series(b_ids, dtype="int64"),
             "sig_jaccard": pd.Series(jac, dtype="float64")}
        )

    pairs = exploded.groupby(["band", "band_key"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["id_a", "id_b"], kind="mergesort").drop_duplicates(
            subset=["id_a", "id_b"]
        )

    # same pair can surface from multiple bands → global dedup on pair key
    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (df["id_a"] * 1_000_003 + df["id_b"]) % 64
        return df

    return (
        pairs.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(
            lambda g: dedup_pairs(g).drop(columns=["pbucket"]), batch_format="pandas"
        )
    )


def cluster_pairs(pairs_df: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified pairs → id → cluster-representative
    (min id). Driver-side: candidate pair sets are orders of magnitude
    smaller than the corpus; for larger sets run min-label propagation
    as iterated groupbys (guide: 'connected components')."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def remove_near_duplicates(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """The composite training-data op: MinHash-LSH pairs → union-find
    clusters → keep only each cluster's representative (min id) plus
    all unclustered docs. The broadcast drop-set is tiny (cluster
    members minus reps ≪ corpus); the corpus itself is only filtered,
    never shuffled."""
    import ray

    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                              jaccard_threshold=jaccard_threshold,
                              **minhash_kwargs).to_pandas()
    clusters = cluster_pairs(pairs)
    drop = frozenset(k for k, rep in clusters.items() if k != rep)
    drop_ref = ray.put(drop)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        return df.loc[~df[id_col].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (blake2b token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["simhash"] = df[text_col].fillna("").map(simhash64).astype("uint64")
    return df


def simhash_near_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk),
    groupby chunk, verify exact hamming distance in the bucket."""
    hashed = ds.select_columns([id_col, text_col]).map_batches(
        lambda df: simhash_batch(df, text_col).drop(columns=[text_col]),
        batch_format="pandas",
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, chunks, keys, hs = [], [], [], []
        for i, h in zip(df[id_col], df["simhash"]):
            h = int(h)
            for c in range(4):
                ids.append(i)
                chunks.append(c)
                keys.append((h >> (16 * c)) & 0xFFFF)
                hs.append(h)
        return pd.DataFrame({id_col: ids, "chunk": chunks, "key": keys, "simhash": hs})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").drop_duplicates(subset=[id_col])
        rows = list(zip(g[id_col], g["simhash"]))
        a_ids, b_ids, dists = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if d <= max_hamming:
                    a_ids.append(rows[i][0])
                    b_ids.append(rows[j][0])
                    dists.append(d)
        return pd.DataFrame(
            {"id_a": pd.Series(a_ids, dtype="int64"),
             "id_b": pd.Series(b_ids, dtype="int64"),
             "hamming": pd.Series(dists, dtype="int64")}
        )

    cand = hashed.map_batches(explode, batch_format="pandas").groupby(
        ["chunk", "key"]
    ).map_groups(pairs, batch_format="pandas")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["id_a", "id_b"], kind="mergesort").drop_duplicates(
            subset=["id_a", "id_b"]
        ).drop(columns=["pbucket"])

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (df["id_a"] * 1_000_003 + df["id_b"]) % 64
        return df

    return (
        cand.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    k: int = 5,
    threshold: float = 0.4,
) -> ray.data.Dataset:
    """Exact character-k-gram Jaccard similarity for all pairs within a
    blocking key (e.g. same ``source``). The blocking key bounds the
    quadratic comparison; at scale use minhash_lsh_pairs for recall
    beyond blocks."""

    def with_shingles(df: pd.DataFrame) -> pd.DataFrame:
        # raw gram strings, not hashes: this op is the EXACT member of
        # the dedup family (and its DuckDB oracle regenerates the same
        # gram sets with substr()) — hash sets live in minhash/simhash.
        # ASCII whitespace normalization, matching the oracle exactly
        # (DuckDB RE2 \s and trim() are ASCII; Python str.split is
        # Unicode — the explicit class keeps both sides identical on
        # non-ASCII text)
        import re as _re

        _ws = _re.compile(r"[ \t\n\r\f\v]+")

        def grams(t: str) -> list[str]:
            t = _ws.sub(" ", t).strip(" ")
            if len(t) < k:
                t = t + " " * (k - len(t))
            return sorted({t[i : i + k] for i in range(len(t) - k + 1)})

        out = df[[id_col, block_col]].copy()
        out["shingles"] = df[text_col].fillna("").map(grams)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        rows = [(i, frozenset(s)) for i, s in zip(g[id_col], g["shingles"])]
        a_ids, b_ids, jac = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                inter = len(rows[i][1] & rows[j][1])
                union = len(rows[i][1] | rows[j][1])
                v = inter / union if union else 0.0
                if v >= threshold:
                    a_ids.append(rows[i][0])
                    b_ids.append(rows[j][0])
                    jac.append(v)
        return pd.DataFrame(
            {"id_a": pd.Series(a_ids, dtype="int64"),
             "id_b": pd.Series(b_ids, dtype="int64"),
             "jaccard": pd.Series(jac, dtype="float64")}
        )

    return (
        ds.map_batches(with_shingles, batch_format="pandas")
        .groupby(block_col)
        .map_groups(pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    exact: bool = False,
) -> ray.data.Dataset:
    """Near-duplicate vectors by cosine ≥ threshold. Blocking: seeded
    random-hyperplane LSH sign-bucket (vectors with cosine ≥ 0.95 agree
    on most hyperplane signs; we probe the exact bucket — recall path at
    scale is multi-probe). Verification: exact float64 cosine.

    ``exact=True`` disables blocking (every vector in one group): full
    O(n²) comparison — the SQL-oracle-checkable baseline, viable only
    when the vector table is small/sampled."""

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        out = df[[id_col]].copy()
        if exact:
            out["bkt"] = 0  # one global group; skip the LSH entirely
        else:
            dim = mat.shape[1]
            rng = np.random.RandomState(seed)
            planes = rng.standard_normal((dim, n_planes))
            signs = (mat @ planes) >= 0
            out["bkt"] = np.packbits(signs, axis=1)[:, 0].astype(np.int64)
        out["vec"] = [v.tolist() for v in mat]
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v) for v in g["vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        ids = list(g[id_col])
        a_ids, b_ids, cs = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    a_ids.append(a)
                    b_ids.append(b)
                    cs.append(float(sims[i, j]))
        return pd.DataFrame(
            {"id_a": pd.Series(a_ids, dtype="int64"),
             "id_b": pd.Series(b_ids, dtype="int64"),
             "cosine": pd.Series(cs, dtype="float64")}
        )

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bkt")
        .map_groups(pairs, batch_format="pandas")
    )
