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


_P61 = np.uint64(_MERSENNE)
_MASK32 = np.uint64(0xFFFFFFFF)


def _mod61(v: np.ndarray) -> np.ndarray:
    """Exact Mersenne fold of uint64 values into [0, 2^61-1):
    2^61 ≡ 1 (mod p) so v ≡ (v & p) + (v >> 61); one conditional
    subtract finishes (the fold output is < p + 8)."""
    v = (v & _P61) + (v >> np.uint64(61))
    return np.where(v >= _P61, v - _P61, v)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod p minwise signature, exact and FULLY vectorized in
    uint64 (no object dtype, no per-permutation Python loop): the
    122-bit product a*x is computed as 32-bit split partials — each
    partial < 2^64 — and reduced with Mersenne folds
    (a·x = hi·2^64 + mid·2^32 + lo; 2^64 ≡ 8, m·2^32 ≡ (m>>29) +
    ((m mod 2^29) << 32) since 2^61 ≡ 1 mod p). Bit-identical to the
    scalar reference ((a*x+b) % p over Python ints)."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = _mod61(shingles.astype(np.uint64))[None, :]
    a = a.astype(np.uint64)[:, None]
    b = b.astype(np.uint64)[:, None]
    a_hi, a_lo = a >> np.uint64(32), a & _MASK32
    x_hi, x_lo = x >> np.uint64(32), x & _MASK32
    lo = a_lo * x_lo                    # < 2^64 (fits: (2^32-1)^2)
    mid = a_hi * x_lo + a_lo * x_hi     # < 2^62 (a_hi, x_hi < 2^29)
    hi = a_hi * x_hi                    # < 2^58
    m = _mod61(mid)
    r_mid = _mod61((m >> np.uint64(29)) + ((m & np.uint64((1 << 29) - 1)) << np.uint64(32)))
    total = _mod61(_mod61(lo) + r_mid + _mod61(hi << np.uint64(3)) + b)
    return np.minimum.reduce(total, axis=1).astype(np.uint64)


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
    star_bucket_threshold: int = 256,
    n_join_buckets: int = 64,
) -> ray.data.Dataset:
    """MinHash + LSH near-dup candidate pairs with exact signature-level
    Jaccard verification. Returns (id_a, id_b, sig_jaccard) with
    id_a < id_b, deduplicated across bands.

    Shuffle discipline (the 100-TB budget): no stage ever ships a
    signature ×bands. The band explode carries only
    (id, band, band_key) — three scalar columns; full signatures cross
    the wire exactly ONCE, in the id-bucketed join that attaches them
    to the (already deduplicated, ≪ corpus) candidate pair set.

      1. signature (actor pool, vectorized uint64 kernel)
      2. slim explode → (id, band, band_key)
      3. groupby (band, band_key) → candidate id pairs (no signatures)
      4. pair dedup groupby (same pair surfaces from multiple bands)
      5. id-bucketed signature join: each pair half picks up its doc's
         signature — signatures move once, total
      6. pair-bucket groupby → exact signature-agreement verification
         (est. Jaccard = fraction of agreeing permutations) → filter

    Skew guard: an LSH bucket larger than ``star_bucket_threshold``
    (boilerplate explosion — at threshold-level similarity one giant
    bucket would emit O(n²) pairs) emits STAR candidates to its min id
    instead of all pairs. For removal/clustering the star keeps every
    member reachable from the representative; pair *listing* recall
    beyond the star relies on the other bands. Sandbox corpora never
    hit the cap, so outputs are unchanged vs the all-pairs reference.
    """
    rows_per_band = num_perm // bands
    if text_col != "text":
        ds = ds.map_batches(
            lambda df: df.rename(columns={text_col: "text"}), batch_format="pandas"
        )
    # materialize ONCE: the signature stage (shingling + 64-perm modmul,
    # the dominant compute) feeds TWO plan branches — the band explode
    # and the sig_side of the verification join. Ray Data plans are
    # trees, so without pinning, both branches would re-run it over
    # every document. Signatures are compact (num_perm × 8 B per doc),
    # so the pin is cheap and spillable.
    sigs = ds.select_columns([id_col, "text"]).map_batches(
        MinHasher(num_perm, shingle_k),
        batch_format="pandas",
        concurrency=concurrency,
    ).materialize()

    def explode_slim(df: pd.DataFrame) -> pd.DataFrame:
        ids_out, bnds_out, keys_out = [], [], []
        for i, sig in zip(df[id_col].tolist(), df["signature"].tolist()):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                key = int.from_bytes(
                    hashlib.blake2b(
                        repr((b, chunk)).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                ids_out.append(i)
                bnds_out.append(b)
                keys_out.append(key)
        return pd.DataFrame(
            {id_col: pd.Series(ids_out, dtype="int64"),
             "band": pd.Series(bnds_out, dtype="int64"),
             "band_key": pd.Series(keys_out, dtype="uint64")}
        )

    exploded = sigs.select_columns([id_col, "signature"]).map_batches(
        explode_slim, batch_format="pandas"
    )

    def add_cbkt(df: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle key: a (band, band_key) LSH bucket is a
        # function of band_key, so every member lands in one partition
        df = df.copy()
        df["cbkt"] = (df["band_key"] % np.uint64(n_join_buckets)).astype("int64")
        return df

    def cands_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one partition holds MANY complete LSH buckets, nearly all
        # singletons — pair generation must therefore be run-detection
        # over a sorted frame (vectorized), never one UDF call per
        # bucket (a per-group map_groups here costs ~0.5 ms × #docs ×
        # bands in pure invocation overhead)
        g = g.sort_values(["band", "band_key", id_col], kind="mergesort")
        g = g.drop_duplicates(subset=["band", "band_key", id_col])
        ids = g[id_col].to_numpy()
        bk = g["band_key"].to_numpy()
        bd = g["band"].to_numpy()
        new_run = np.flatnonzero(
            np.concatenate(([True], (bk[1:] != bk[:-1]) | (bd[1:] != bd[:-1])))
        )
        run_len = np.diff(np.concatenate((new_run, [len(g)])))
        a_parts, b_parts = [], []
        for s, ln in zip(new_run[run_len >= 2], run_len[run_len >= 2]):
            members = ids[s : s + ln]  # sorted, unique within the run
            if ln <= star_bucket_threshold:
                ia, ib = np.triu_indices(ln, 1)
                a_parts.append(members[ia])
                b_parts.append(members[ib])
            else:  # skew guard: star to the bucket's min id
                a_parts.append(np.full(ln - 1, members[0]))
                b_parts.append(members[1:])
        a = np.concatenate(a_parts) if a_parts else np.empty(0, dtype=np.int64)
        b = np.concatenate(b_parts) if b_parts else np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"),
             "id_b": pd.Series(b, dtype="int64")}
        )

    cand = (
        exploded.map_batches(add_cbkt, batch_format="pandas")
        .groupby("cbkt")
        .map_groups(lambda g: cands_in_partition(g.drop(columns=["cbkt"])),
                    batch_format="pandas")
    )

    # same pair can surface from multiple bands → global dedup on pair key
    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (df["id_a"] * 1_000_003 + df["id_b"]) % n_join_buckets
        return df

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["id_a", "id_b"], kind="mergesort").drop_duplicates(
            subset=["id_a", "id_b"]
        ).drop(columns=["pbucket"])

    uniq = (
        cand.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pandas")
    )

    # --- signature join: sigs move ONCE, keyed by id bucket -------------
    def pair_halves(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame(
            {
                "key": pd.Series(
                    np.concatenate([df["id_a"].to_numpy(), df["id_b"].to_numpy()])
                    if n else np.empty(0, dtype=np.int64), dtype="int64"),
                "id_a": pd.Series(np.tile(df["id_a"].to_numpy(), 2)
                                  if n else np.empty(0, dtype=np.int64), dtype="int64"),
                "id_b": pd.Series(np.tile(df["id_b"].to_numpy(), 2)
                                  if n else np.empty(0, dtype=np.int64), dtype="int64"),
                "role": pd.Series(["a"] * n + ["b"] * n, dtype="object"),
                "signature": pd.Series([None] * (2 * n), dtype="object"),
            }
        )

    def sig_side(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame(
            {
                "key": pd.Series(df[id_col].to_numpy(), dtype="int64"),
                "id_a": pd.Series(np.full(n, -1), dtype="int64"),
                "id_b": pd.Series(np.full(n, -1), dtype="int64"),
                "role": pd.Series(["s"] * n, dtype="object"),
                "signature": pd.Series(df["signature"].tolist(), dtype="object"),
            }
        )

    def add_jbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["jbucket"] = df["key"] % n_join_buckets
        return df

    joined_src = (
        uniq.map_batches(pair_halves, batch_format="pandas")
        .union(sigs.select_columns([id_col, "signature"]).map_batches(
            sig_side, batch_format="pandas"))
        .map_batches(add_jbucket, batch_format="pandas")
    )

    def attach_sig(g: pd.DataFrame) -> pd.DataFrame:
        srows = g.loc[g["role"] == "s", ["key", "signature"]]
        halves = g.loc[g["role"] != "s", ["key", "id_a", "id_b", "role"]]
        m = halves.merge(srows, on="key", how="inner")
        return m[["id_a", "id_b", "role", "signature"]]

    halves_with_sig = joined_src.groupby("jbucket").map_groups(
        attach_sig, batch_format="pandas"
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id_a", "id_b", "role"], kind="mergesort")
        if len(g) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "sig_jaccard": pd.Series([], dtype="float64")}
            )
        mat = np.asarray(g["signature"].tolist(), dtype=np.uint64)
        est = np.mean(mat[0::2] == mat[1::2], axis=1)
        keep = est >= jaccard_threshold
        return pd.DataFrame(
            {"id_a": pd.Series(g["id_a"].to_numpy()[0::2][keep], dtype="int64"),
             "id_b": pd.Series(g["id_b"].to_numpy()[0::2][keep], dtype="int64"),
             "sig_jaccard": pd.Series(est[keep], dtype="float64")}
        )

    def pair_bucket2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["vbucket"] = (df["id_a"] * 1_000_003 + df["id_b"]) % n_join_buckets
        return df

    return (
        halves_with_sig.map_batches(pair_bucket2, batch_format="pandas")
        .groupby("vbucket")
        .map_groups(lambda g: verify(g.drop(columns=["vbucket"])),
                    batch_format="pandas")
    )


@ray.remote
def _components_task(*tables) -> "pa.Table":
    """Union-find over a SMALL pair set in one Ray task (never on the
    driver): the fast path of :func:`components_min_label` below its
    size cutoff, where the iterative loop's per-round shuffle floor
    (~1-2 s × diameter at sandbox scale) dominates the actual work."""
    import pyarrow as pa

    # empty upstream blocks may carry a degenerate no-column schema —
    # keep only real pair blocks, and only the edge columns
    parts = [t.select(["id_a", "id_b"]) for t in tables
             if t.num_rows and "id_a" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas() if parts
          else pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")}))
    mapping = cluster_pairs(df)
    # same contract as the iterative path: one row for EVERY node that
    # appears in a pair, roots labeled with themselves
    nodes = np.unique(np.concatenate([
        df["id_a"].to_numpy(dtype=np.int64), df["id_b"].to_numpy(dtype=np.int64)
    ])) if len(df) else np.empty(0, dtype=np.int64)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array([mapping.get(int(n), int(n)) for n in nodes], pa.int64()),
    })


def components_min_label(
    pairs: ray.data.Dataset,
    n_buckets: int = 64,
    max_iters: int = 64,
    small_edge_cutoff: int = 2_000_000,
) -> ray.data.Dataset:
    """Distributed connected components over a pair/edge Dataset
    (id_a, id_b) by iterative min-label propagation — the scale path
    that replaces driver-side union-find. Returns (node, label) for
    every node that appears in a pair; label = the component's min id.

    Each iteration is two bucketed shuffles of (node, label) + edge
    rows — never document text, never the corpus:

      1. groupby(src bucket): every directed edge (u, v) picks up u's
         current label and emits a candidate (v, label_u); current
         labels re-emit themselves;
      2. groupby(node bucket): each node keeps the min of its own and
         all candidate labels.

    Labels are monotonically non-increasing, so the global label sum
    is a strictly decreasing integer until the fixpoint — one cheap
    ``sum()`` per iteration is the convergence test (at extreme id
    ranges swap it for a changed-count aggregate). Rounds ≈ component
    diameter; near-dup graphs (LSH buckets ≈ cliques/stars) converge
    in a handful."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy()
        b = df["id_b"].to_numpy()
        return pd.DataFrame(
            {"u": pd.Series(np.concatenate([a, b]), dtype="int64"),
             "v": pd.Series(np.concatenate([b, a]), dtype="int64")}
        )

    # pin the pair set ONCE: both the size probe and either components
    # path consume it, and an unpinned Dataset would re-execute the
    # whole upstream LSH pipeline per consumer
    pairs = pairs.materialize()
    n_edges = 2 * pairs.count()
    if n_edges <= small_edge_cutoff:
        # small pair set (the common case — pairs ≪ corpus): one-task
        # union-find beats diameter × per-iteration shuffle floor. The
        # pair blocks stream into the task via object refs; the DRIVER
        # never touches them. The iterative path below is the
        # arbitrarily-large-graph fallback (tested directly with
        # small_edge_cutoff=0).
        ref = _components_task.remote(*pairs.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    edges_raw = pairs.map_batches(to_edges, batch_format="pandas").materialize()
    # Partition count must track the EDGE volume, not the upstream
    # pipeline's block count: Ray's groupby makes one reduce partition
    # per input block, and the union below would otherwise compound
    # label + edge block counts every iteration (each tiny shuffle task
    # costs ~100ms of fixed overhead).
    n_buckets = max(4, min(n_buckets, n_edges // 20_000 + 4))

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(df["u"].to_numpy())
        return pd.DataFrame(
            {"node": pd.Series(nodes, dtype="int64"),
             "label": pd.Series(nodes, dtype="int64")}
        )

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["kind"] = "e"
        out["bkt"] = out["u"] % n_buckets
        return out

    edges_tagged = (
        edges_raw.map_batches(tag_edge, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )
    # duplicate (node, node) rows across batches are fine: the min
    # combine below collapses them on the first iteration
    labels = (
        edges_raw.map_batches(init_labels, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )
    prev_sum: int | None = None

    for _ in range(max_iters):
        def tag_label(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"u": pd.Series(df["node"].to_numpy(), dtype="int64"),
                 "v": pd.Series(df["label"].to_numpy(), dtype="int64"),
                 "kind": pd.Series(["l"] * len(df), dtype="object"),
                 "bkt": pd.Series(df["node"].to_numpy() % n_buckets, dtype="int64")}
            )

        def push(g: pd.DataFrame) -> pd.DataFrame:
            lab = (g.loc[g["kind"] == "l", ["u", "v"]]
                   .groupby("u", sort=False)["v"].min())
            e = g.loc[g["kind"] == "e", ["u", "v"]]
            cand_v = e["v"].to_numpy()
            cand_lab = lab.reindex(e["u"]).to_numpy()
            # self rows: every labeled node re-emits its current label
            out_node = np.concatenate([cand_v, lab.index.to_numpy()])
            out_lab = np.concatenate([cand_lab, lab.to_numpy()])
            return pd.DataFrame(
                {"node": pd.Series(out_node, dtype="int64"),
                 "label": pd.Series(out_lab, dtype="int64")}
            )

        pushed = (
            labels.map_batches(tag_label, batch_format="pandas")
            .union(edges_tagged)
            .groupby("bkt")
            .map_groups(push, batch_format="pandas")
        )

        def add_nbkt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["nbkt"] = df["node"] % n_buckets
            return df

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            m = g.groupby("node", sort=True)["label"].min().reset_index()
            return m.astype({"node": "int64", "label": "int64"})

        labels = (
            pushed.map_batches(add_nbkt, batch_format="pandas")
            .groupby("nbkt")
            .map_groups(lambda g: take_min(g.drop(columns=["nbkt"])),
                        batch_format="pandas")
            .repartition(n_buckets)  # keep block count bounded per iter
            .materialize()
        )
        cur_sum = int(labels.sum("label") or 0)
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # labels are wrong (some nodes not yet at their component min),
        # and using them would under-deduplicate SILENTLY — refuse.
        # Rounds ≈ component diameter; a graph deeper than max_iters
        # needs a bigger budget, not a wrong answer.
        raise RuntimeError(
            f"components_min_label did not converge in {max_iters} "
            "iterations (component diameter exceeds the budget); "
            "raise max_iters"
        )
    return labels


def cluster_pairs(pairs_df: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified pairs → id → cluster-representative
    (min id). Driver-side SMALL-SCALE twin of
    :func:`components_min_label` (kept for tests/spec parity; the
    engine paths use the distributed version)."""
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
    """The composite training-data op: MinHash-LSH pairs → DISTRIBUTED
    min-label components (:func:`components_min_label` — no driver
    union-find, no ``to_pandas`` of the pair set) → keep only each
    cluster's representative (min id) plus all unclustered docs. The
    broadcast drop-set is cluster members minus reps (≪ corpus, and
    built from the already-reduced components table); the corpus itself
    is only filtered, never shuffled."""
    import ray

    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                              jaccard_threshold=jaccard_threshold,
                              **minhash_kwargs)
    comp = components_min_label(pairs)

    def non_reps(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["node"] != df["label"], ["node"]]

    drop = frozenset(
        r["node"]
        for r in comp.map_batches(non_reps, batch_format="pandas").take_all()
    )
    drop_ref = ray.put(drop)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        return df.loc[~df[id_col].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens. Token hash = first 8
    bytes of md5, big-endian — chosen (over blake2b) because DuckDB can
    reproduce it exactly (``('0x' || substr(md5(w),1,16))::UBIGINT``),
    which is what makes the ``simhash_pairs`` query SQL-oracle-checkable
    bit for bit. Bit accumulation is vectorized: one (n_tokens × 64)
    unpackbits + column sum, no per-bit Python loop."""
    words = text.split()
    if not words:
        return 0
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in words),
        dtype=np.uint64, count=len(words),
    )
    # byteswap → big-endian bytes; unpackbits rows are then MSB-first,
    # so column i is bit (63 - i) — the same order the packbits below
    # reassembles
    bits = np.unpackbits(hs.byteswap().view(np.uint8).reshape(-1, 8), axis=1)
    acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
    return int.from_bytes(np.packbits(acc > 0).tobytes(), "big")


def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["simhash"] = df[text_col].fillna("").map(simhash64).astype("uint64")
    return df


def simhash_near_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    star_bucket_threshold: int = 4096,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk),
    groupby chunk, verify exact hamming distance in the bucket.

    Skew guard: a chunk bucket larger than ``star_bucket_threshold``
    (one boilerplate text shared by n docs ⇒ all four chunks collide ⇒
    O(n²) pairs per chunk) emits STAR pairs to its min id instead —
    every member stays reachable from the representative for removal/
    clustering, at the cost of non-star pair listing inside the bucket
    (same trade as minhash_lsh_pairs; the default threshold is high
    enough that only pathological buckets hit it, and those are
    hamming-0 cliques where the star loses nothing)."""
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

    def add_cbkt(df: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle key — a (chunk, key) bucket is a function of
        # (chunk, key), so complete buckets co-locate
        df = df.copy()
        df["cbkt"] = ((df["key"].astype("int64") * 4 + df["chunk"]) % 64).astype("int64")
        return df

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        # run-detection over the sorted partition (most (chunk, key)
        # buckets are singletons — per-bucket map_groups calls would
        # dominate; see minhash cands_in_partition)
        g = g.sort_values(["chunk", "key", id_col], kind="mergesort")
        g = g.drop_duplicates(subset=["chunk", "key", id_col])
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        ck = g["chunk"].to_numpy()
        ky = g["key"].to_numpy()
        new_run = np.flatnonzero(
            np.concatenate(([True], (ky[1:] != ky[:-1]) | (ck[1:] != ck[:-1])))
        )
        run_len = np.diff(np.concatenate((new_run, [len(g)])))
        a_ids, b_ids, dists = [], [], []
        for s, ln in zip(new_run[run_len >= 2], run_len[run_len >= 2]):
            m_ids, m_hs = ids[s : s + ln], hs[s : s + ln]
            if ln > star_bucket_threshold:
                # skew guard: star to the min id (docstring)
                x = m_hs[0] ^ m_hs[1:]
                d = np.zeros(len(x), dtype=np.int64)
                while x.any():
                    d += (x & np.uint64(1)).astype(np.int64)
                    x >>= np.uint64(1)
                keep = d <= max_hamming
                a_ids.append(np.full(int(keep.sum()), m_ids[0]))
                b_ids.append(m_ids[1:][keep])
                dists.append(d[keep])
                continue
            ia, ib = np.triu_indices(ln, 1)
            x = m_hs[ia] ^ m_hs[ib]
            d = np.zeros(len(x), dtype=np.int64)  # vectorized popcount
            while x.any():
                d += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = d <= max_hamming
            a_ids.append(m_ids[ia][keep])
            b_ids.append(m_ids[ib][keep])
            dists.append(d[keep])
        a = np.concatenate(a_ids) if a_ids else np.empty(0, dtype=np.int64)
        b = np.concatenate(b_ids) if b_ids else np.empty(0, dtype=np.int64)
        d = np.concatenate(dists) if dists else np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"),
             "id_b": pd.Series(b, dtype="int64"),
             "hamming": pd.Series(d, dtype="int64")}
        )

    cand = (
        hashed.map_batches(explode, batch_format="pandas")
        .map_batches(add_cbkt, batch_format="pandas")
        .groupby("cbkt")
        .map_groups(lambda g: pairs_in_partition(g.drop(columns=["cbkt"])),
                    batch_format="pandas")
    )

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
    multi_probe: bool = True,
) -> ray.data.Dataset:
    """Near-duplicate vectors by cosine ≥ threshold. Blocking: seeded
    random-hyperplane LSH sign-bucket with MULTI-PROBE — each vector is
    emitted into its exact sign bucket plus every Hamming-1 neighbor
    bucket, so any pair whose sign patterns differ in at most one plane
    co-locates (recall at cosine ≈ 1 is ~1 − C(n,2)·(θ/π)²; the
    recall-vs-exact pytest in tests/test_ops.py measures it on planted
    near-dups). Verification: exact float64 cosine; pairs surfacing
    from several probed buckets are globally deduplicated.

    ``exact=True`` disables blocking (every vector in one group): full
    O(n²) comparison — the SQL-oracle-checkable baseline, viable only
    when the vector table is small/sampled."""

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        n = len(df)
        if exact:
            out = df[[id_col]].copy()
            out["bkt"] = 0  # one global group; skip the LSH entirely
            out["vec"] = [v.tolist() for v in mat]
            return out
        dim = mat.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((dim, n_planes))
        signs = (mat @ planes) >= 0
        # plane k is bit k of the bucket id — supports up to 62 planes
        # (2^n_planes buckets is the scale knob: more planes → smaller
        # buckets → cheaper in-bucket verification, lower recall per
        # probe; multi-probe buys the recall back)
        base = signs @ (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        probes = [base]
        if multi_probe:
            # flipping any single plane probes that Hamming-1 bucket
            probes += [base ^ np.int64(1 << k) for k in range(n_planes)]
        reps = len(probes)
        vecs = [v.tolist() for v in mat]
        return pd.DataFrame(
            {id_col: pd.Series(np.tile(df[id_col].to_numpy(), reps)),
             "bkt": pd.Series(np.concatenate(probes), dtype="int64"),
             "vec": pd.Series(vecs * reps, dtype="object")}
        )

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

    cand = (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bkt")
        .map_groups(pairs, batch_format="pandas")
    )
    if exact:
        return cand  # one global bucket → no cross-bucket duplicates

    # multi-probe: the same pair can surface from several probed
    # buckets → global dedup on the pair key
    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (df["id_a"] * 1_000_003 + df["id_b"]) % 16
        return df

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["id_a", "id_b"], kind="mergesort").drop_duplicates(
            subset=["id_a", "id_b"]
        ).drop(columns=["pbucket"])

    return (
        cand.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pandas")
    )
