"""Text analysis operators over a document table.

All counting operators emit exact integers so results are bit-stable
under any execution order (and hash-comparable against a DuckDB oracle):
ratios are left to the consumer (`n_x / n_words`).

* token estimation — the reference's own estimator ``len(text)//4``
  (``contxt/scraper.py:426``) plus whitespace word count
  (``scraper.py:534``).
* quality counts — length / punctuation / stopword / uppercase counts
  (quality-score family for training-data filtering).
* language ID — character-trigram cosine heuristic (pure, deterministic;
  no external models).
* fingerprint — rolling polynomial hash over word shingles (document
  fingerprinting for near-dup blocking).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_UPPER_RE = re.compile(r"[A-Z]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def text_stats_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized counting stage for ``map_batches(batch_format='pandas')``.

    Emits: n_chars, est_tokens (len//4), n_words (\\S+ runs), n_punct
    (non-word non-space chars), n_upper (ASCII uppercase), n_stop
    (stopword occurrences, whitespace-tokenized, case-sensitive lower)."""
    s = df[text_col].fillna("")
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        if c != text_col:
            out[c] = df[c]
    out["n_chars"] = s.str.len().astype("int64")
    out["est_tokens"] = (out["n_chars"] // 4).astype("int64")
    # re.ASCII: DuckDB's RE2 \w/\s classes are ASCII-only; Python's are
    # Unicode by default — the flag keeps the paired oracle exact on
    # non-ASCII text
    out["n_words"] = s.str.count(r"\S+", flags=re.ASCII).astype("int64")
    out["n_punct"] = s.str.count(r"[^\w\s]", flags=re.ASCII).astype("int64")
    out["n_upper"] = s.str.count(r"[A-Z]").astype("int64")
    ws = re.compile(r"\S+", re.ASCII)
    out["n_stop"] = s.map(
        lambda t: sum(1 for w in ws.findall(t.lower()) if w in STOPWORDS)
    ).astype("int64")
    return out


def quality_mask(
    stats: pd.DataFrame,
    min_words: int = 15,
    max_mean_word_len: float = 12.0,
    min_mean_word_len: float = 2.0,
    max_punct_per_word: float = 0.3,
    min_stop_fraction_pct: int = 2,
) -> pd.Series:
    """The Gopher-style keep predicate over :func:`text_stats_batch`
    columns: word-count bounds, mean word length window, punctuation
    density, stopword presence. All comparisons are exact-integer/
    rational (fractions cross-multiplied — no float division), so any
    consumer is SQL-oracle-checkable bit for bit."""
    w = stats["n_words"]
    return (
        (w >= min_words)
        # mean word length window: n_chars/n_words in [min, max]
        # (approximated on chars incl. single spaces, same both sides)
        & (stats["n_chars"] * 10 <= int(max_mean_word_len * 10) * w)
        & (stats["n_chars"] * 10 >= int(min_mean_word_len * 10) * w)
        # punctuation per word <= max (cross-multiplied)
        & (stats["n_punct"] * 10 <= int(max_punct_per_word * 10) * w)
        & (stats["n_stop"] * 100 >= min_stop_fraction_pct * w)
    )


def quality_filter(ds, **mask_kwargs) -> "ray.data.Dataset":
    """Gopher-style document quality gate (see :func:`quality_mask`)."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        stats = text_stats_batch(df)
        return stats.loc[quality_mask(stats, **mask_kwargs)]

    import ray.data  # noqa: F401 (type note only)

    return ds.map_batches(gate, batch_format="pandas")


#: BPE-style pretokenizer (GPT-2's pattern, adapted): contraction
#: suffixes, space-prefixed letter/digit/symbol runs, whitespace runs.
#: Deliberately ASCII classes and NO lookahead — the exact same pattern
#: string runs under Python re and DuckDB's RE2, so piece counts are
#: SQL-oracle-checkable (verified match on the full corpus). The
#: whitespace class is spelled out as [ \t\n\r\f\v] rather than \s:
#: Python's ASCII \s includes vertical tab, RE2's does not, so the
#: shorthand would silently diverge on any document containing \v.
BPE_PIECE_RE = ("'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
                "| ?[^ \t\n\r\f\vA-Za-z0-9]+|[ \t\n\r\f\v]+")


def token_pieces_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Tokenizer-grade size estimates per document: ``n_bpe_pieces``
    (matches of :data:`BPE_PIECE_RE` — a BPE pretokenizer's piece
    count, the tight upper bound on real BPE token count) next to the
    two reference estimators (whitespace words, len//4). Vectorized
    ``str.count``; no Python loop."""
    s = df[text_col].fillna("")
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        if c != text_col:
            out[c] = df[c]
    out["n_bpe_pieces"] = s.str.count(BPE_PIECE_RE, flags=re.ASCII).astype("int64")
    out["n_ws_tokens"] = s.str.count(r"\S+", flags=re.ASCII).astype("int64")
    out["est_tokens"] = (s.str.len() // 4).astype("int64")
    return out


# ---------------------------------------------------------------------------
# intra-document repetition signals (Gopher §A1.1 rep-removal family)


def repetition_stats_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-document repetition signals as exact integers (numerators /
    denominators; ratios left to the consumer so every column is
    SQL-hash-checkable):

    * ``n_dup_line_chars`` / ``n_line_chars`` — character mass of line
      occurrences beyond each line's first, over all line characters
      (lines split on ``\\n``);
    * ``n_dup_para_chars`` / ``n_para_chars`` — same over paragraphs
      (split on ``\\n\\n``);
    * ``top2_count`` × ``top2_len`` — occurrence count and character
      length of the most frequent word 2-gram (ASCII-ws tokens joined
      by one space; ties broken by lexicographically smallest gram),
      the "top n-gram character fraction" numerator.

    All counting is position-free ((count−1)·len per distinct value ==
    occurrences-after-first mass) and batch-vectorized: explode +
    groupby, no per-document Python loop."""
    s = df[text_col].fillna("")
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        if c != text_col:
            out[c] = df[c]

    def dup_mass(parts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        ex = parts.explode()
        d = pd.DataFrame({"i": ex.index, "v": ex.to_numpy()})
        d["L"] = d["v"].str.len().astype("int64")
        tot = d.groupby("i")["L"].sum()
        g = d.groupby(["i", "v"], sort=False).agg(
            c=("L", "size"), L=("L", "first")
        ).reset_index()
        dup = ((g["c"] - 1) * g["L"]).groupby(g["i"]).sum()
        total = np.zeros(len(parts), dtype=np.int64)
        dmass = np.zeros(len(parts), dtype=np.int64)
        total[tot.index.to_numpy()] = tot.to_numpy()
        dmass[dup.index.to_numpy()] = dup.to_numpy()
        return dmass, total

    lines = s.str.split("\n", regex=False)
    lines.index = pd.RangeIndex(len(s))
    paras = s.str.split("\n\n", regex=False)
    paras.index = pd.RangeIndex(len(s))
    dl, tl = dup_mass(lines)
    dp, tp = dup_mass(paras)
    out["n_dup_line_chars"] = dl
    out["n_line_chars"] = tl
    out["n_dup_para_chars"] = dp
    out["n_para_chars"] = tp

    from web_scraper_ray.ops.decontam import _doc_ngrams

    didx, grams = _doc_ngrams(s, 2)
    t2c = np.zeros(len(s), dtype=np.int64)
    t2l = np.zeros(len(s), dtype=np.int64)
    if len(grams):
        g2 = (
            pd.DataFrame({"i": didx, "g": grams})
            .groupby(["i", "g"], sort=False).size().reset_index(name="c")
            .sort_values(["i", "c", "g"], ascending=[True, False, True],
                         kind="mergesort")
            .drop_duplicates(subset=["i"], keep="first")
        )
        t2c[g2["i"].to_numpy()] = g2["c"].to_numpy()
        t2l[g2["i"].to_numpy()] = g2["g"].str.len().to_numpy()
    out["top2_count"] = t2c
    out["top2_len"] = t2l
    return out


def repetition_filter(
    ds,
    max_dup_line_frac_pct: int = 30,
    max_dup_para_frac_pct: int = 30,
    max_top2_char_frac_pct: int = 20,
) -> "ray.data.Dataset":
    """Gopher-style repetition gate: drop documents whose duplicate-line
    / duplicate-paragraph / top-2-gram character fractions exceed the
    thresholds. Cross-multiplied integer predicates (no float
    division), one pure filtering scan."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        st = repetition_stats_batch(df)
        n_chars = df["text"].fillna("").str.len().astype("int64")
        keep = (
            (st["n_dup_line_chars"] * 100
             <= max_dup_line_frac_pct * st["n_line_chars"])
            & (st["n_dup_para_chars"] * 100
               <= max_dup_para_frac_pct * st["n_para_chars"])
            & (st["top2_count"] * st["top2_len"] * 100
               <= max_top2_char_frac_pct * n_chars)
        )
        return df.loc[keep]

    return ds.map_batches(gate, batch_format="pandas")


# ---------------------------------------------------------------------------
# language identification (n-gram heuristic)

_LANG_PROFILES = {
    # tiny trigram profiles of function-word patterns; deterministic and
    # self-contained (heuristic quality, not a model)
    "en": ("the", " th", "he ", "ing", "and", " of", "ion", " to", "ed "),
    "de": ("der", "ein", "und", "sch", "ich", "die", " de", "en ", "ung"),
    "fr": ("les", " de", "des", "ent", " le", "que", "ion", "ait", " la"),
    "es": (" de", "los", " la", "que", "ción", "ado", " el", "las", "nte"),
}


class LangIdModel:
    """Stateful stage: profiles built once per actor (``__init__``),
    scored per batch — the actor-pool pattern (SURVEY.md §2.4)."""

    def __init__(self):
        self.profiles = {k: tuple(v) for k, v in _LANG_PROFILES.items()}

    def predict(self, text: str) -> str:
        t = f" {text.lower()} "
        best, best_score = "unknown", 0
        for lang, grams in self.profiles.items():
            score = sum(t.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pred_lang"] = df["text"].fillna("").map(self.predict)
        return df


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash)

_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def _word_hashes(text: str) -> np.ndarray:
    words = text.split()
    return np.array(
        [hash_word(w) for w in words], dtype=np.uint64
    ) if words else np.array([], dtype=np.uint64)


def hash_word(w: str) -> int:
    h = 0
    for ch in w.encode("utf-8"):
        h = (h * _FP_BASE + ch) % _FP_MOD
    return h


def rolling_fingerprint(text: str, k: int = 5) -> int:
    """Min-hash of rolling polynomial hashes over word k-grams — a
    single 64-bit document fingerprint (equal fingerprints ⇒ likely
    shared k-gram content)."""
    hs = _word_hashes(text)
    if len(hs) == 0:
        return 0
    if len(hs) < k:
        acc = 0
        for h in hs.tolist():
            acc = (acc * _FP_BASE + int(h)) % _FP_MOD
        return acc
    best = _FP_MOD
    acc_pows = pow(_FP_BASE, k - 1, _FP_MOD)
    acc = 0
    for h in hs[:k].tolist():
        acc = (acc * _FP_BASE + int(h)) % _FP_MOD
    best = min(best, acc)
    for i in range(k, len(hs)):
        acc = (acc - int(hs[i - k]) * acc_pows) % _FP_MOD
        acc = (acc * _FP_BASE + int(hs[i])) % _FP_MOD
        best = min(best, acc)
    return best


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text", k: int = 5) -> pd.DataFrame:
    df = df.copy()
    df["fingerprint"] = df[text_col].fillna("").map(lambda t: rolling_fingerprint(t, k)).astype("uint64")
    return df


# ---------------------------------------------------------------------------
# PII redaction

#: Each pattern is written for IDENTICAL semantics under Python re
#: (re.ASCII) and DuckDB RE2: explicit ASCII classes only, no \s
#: shorthand, no lookarounds, no backreferences. The email TLD is
#: [A-Za-z][A-Za-z]+ (>= 2 alpha); \b is safe (both engines share the
#: ASCII word-boundary definition here).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9]{7,15}"),
)

_PII_COMPILED = tuple(
    (name, re.compile(pat, re.ASCII)) for name, pat in PII_PATTERNS
)


def pii_redact_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Replace emails, dotted-quad IPs and international phone numbers
    with ``<EMAIL>`` / ``<IPV4>`` / ``<PHONE>`` tokens, applied in that
    fixed order (each pattern over the previous pattern's output, as
    the SQL twin's nested ``regexp_replace`` does). Per-type match
    counts (``n_email`` / ``n_ipv4`` / ``n_phone``) are taken on the
    ORIGINAL text, each pattern independently. Fully vectorized
    (pandas ``.str`` kernels over compiled patterns)."""
    out = df.copy()
    orig = out[text_col].fillna("")
    red = orig
    for name, cre in _PII_COMPILED:
        out[f"n_{name}"] = orig.str.count(cre).astype("int64")
        red = red.str.replace(cre, f"<{name.upper()}>", regex=True)
    out[text_col] = red
    return out


def redact_pii(ds, text_col: str = "text") -> "ray.data.Dataset":
    """Dataset-level PII scrub: pure ``map_batches`` — no shuffle, no
    state, embarrassingly parallel at any corpus size."""
    return ds.map_batches(
        lambda df: pii_redact_batch(df, text_col), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# corpus vocabulary statistics: document frequency + tf/df ranking

#: ASCII-whitespace token runs — the SAME compiled object as the
#: decontam/repetition token class (one parity-load-bearing regex,
#: one definition)
from web_scraper_ray.ops.decontam import _TOKEN_RE as _DF_TOKEN_RE  # noqa: E402


def _doc_token_pairs(df: pd.DataFrame, id_col: str,
                     text_col: str) -> pd.DataFrame:
    """Distinct (doc, token) pairs of a batch (flat-array explode —
    one C-level findall per row, no per-token Python loop)."""
    token_lists = [_DF_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    ids = np.repeat(df[id_col].to_numpy(), lens)
    flat = [tok for lst in token_lists for tok in lst]
    return pd.DataFrame({id_col: ids, "token": flat}).drop_duplicates()


def doc_frequency(ds, id_col: str = "doc_id",
                  text_col: str = "text") -> "ray.data.Dataset":
    """Vocabulary-wide document frequency: (token, df) where ``df`` =
    number of documents containing the token at least once.

    Scale shape: each batch pre-aggregates its distinct (doc, token)
    pairs into LOCAL (token, partial-count) rows — the combiner
    pattern — so the all-to-all moves one row per (token, batch),
    never one per occurrence. The shuffle key is a coarse
    md5-derived bucket, NOT the token itself: the vocabulary is
    corpus-cardinality and Ray's per-group machinery costs ~0.65 ms
    per distinct key (measured in ops/spans.py:_dup_hash_set — 146 s
    for a bare Sum over 224k keys); the per-token fold runs
    vectorized inside each of the 64 partitions instead."""
    import hashlib

    import ray.data

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _doc_token_pairs(df, id_col, text_col)
        cnt = pairs.groupby("token", sort=False).size()
        toks = cnt.index.to_numpy()
        cbkt = np.fromiter(
            (hashlib.md5(t.encode("utf-8")).digest()[0] & 63
             for t in toks),
            dtype=np.int64, count=len(toks),
        )
        return pd.DataFrame(
            {"cbkt": cbkt, "token": toks,
             "n": cnt.to_numpy().astype("int64")}
        )

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", sort=False)["n"].sum()
        return pd.DataFrame({"token": tot.index.to_numpy(),
                             "df": tot.to_numpy().astype("int64")})

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("cbkt")
        .map_groups(fold_partition, batch_format="pandas")
    )


def tfidf_topk(ds, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> "ray.data.Dataset":
    """Per-document top-k tokens by df-normalized term frequency
    (score = tf / df — rarer-in-corpus tokens rank higher; a single
    correctly-rounded IEEE division, so numpy and the SQL twin produce
    the bit-identical double and the ranking replays exactly; ties by
    token ascending). Returns (id, rank, token, tf, df).

    Two phases, ONE shuffle total: the :func:`doc_frequency` table is
    folded into an object-store dict and broadcast (fits memory for
    real vocabularies after the tokenizer's run-class collapses
    whitespace; at open-vocabulary web scale shard it by token hash
    and bucket-join instead — documented trade), then scoring is a
    pure per-batch scan: local tf counts, dict-mapped df, vectorized
    per-doc head(k)."""
    import ray
    import ray.data

    @ray.remote(num_cpus=0)
    def _fold(*tables) -> dict:
        # runs as a task: the DRIVER never holds the vocabulary
        import pyarrow as pa

        tabs = [t for t in tables if t.num_rows]
        if not tabs:
            return {}
        t = pa.concat_tables(tabs)
        return dict(zip(t.column("token").to_pylist(),
                        t.column("df").to_pylist()))

    ref = _fold.remote(*doc_frequency(
        ds, id_col=id_col, text_col=text_col).to_arrow_refs())

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        token_lists = [_DF_TOKEN_RE.findall(t)
                       for t in df[text_col].fillna("")]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=len(token_lists))
        ids = np.repeat(df[id_col].to_numpy(), lens)
        flat = [tok for lst in token_lists for tok in lst]
        tf = (
            pd.DataFrame({id_col: ids, "token": flat})
            .groupby([id_col, "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        tf["df"] = tf["token"].map(lookup).astype("int64")
        tf["score"] = tf["tf"].astype("float64") / tf["df"].astype("float64")
        tf = tf.sort_values([id_col, "score", "token"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = tf.groupby(id_col, sort=False).head(k).copy()
        top["rank"] = top.groupby(id_col, sort=False).cumcount() + 1
        top["tf"] = top["tf"].astype("int64")
        return top[[id_col, "rank", "token", "tf", "df"]]

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# text normalization (the CCNet-style pre-hash canonicalization)

_NORM_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_NORM_LOWER = "abcdefghijklmnopqrstuvwxyz"
_NORM_TABLE = str.maketrans(_NORM_UPPER, _NORM_LOWER)
_ASCII_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def normalize_text_batch(df: pd.DataFrame,
                         text_col: str = "text") -> pd.DataFrame:
    """Canonicalize text before hashing/dedup (the CCNet recipe's
    deterministic core): ASCII-lowercase (explicit A-Z→a-z translate —
    full-Unicode case mapping is locale-hazardous and diverges between
    engines), collapse ASCII-whitespace runs to one space, strip
    leading/trailing spaces. Adds ``norm_text``; pure vectorized."""
    out = df.copy()
    s = out[text_col].fillna("").str.translate(_NORM_TABLE)
    s = s.str.replace(_ASCII_WS_RE, " ", regex=True).str.strip(" ")
    out["norm_text"] = s
    return out


def normalize_text(ds, text_col: str = "text") -> "ray.data.Dataset":
    """Dataset-level normalization: pure map_batches, no shuffle."""
    return ds.map_batches(
        lambda df: normalize_text_batch(df, text_col),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# document chunking (fixed-token windows, strided overlap)

def chunk_documents_batch(df: pd.DataFrame, window: int, stride: int,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> pd.DataFrame:
    """Explode each document into token windows ``[s, s+window)`` for
    ``s = 0, stride, 2*stride, …`` while ``s < n_tokens`` — the
    chunking step of a RAG/embedding pipeline (overlap = ``window -
    stride``). Tokens are ASCII-whitespace-delimited (the repo's RE2-
    parity class) and chunk text is re-joined with single spaces, so
    whitespace runs normalize; empty/whitespace-only docs emit no
    chunks. Output rows: (id, chunk_id, n_tokens, chunk_text)."""
    ids, cids, ns, texts = [], [], [], []
    for i, t in zip(df[id_col], df[text_col]):
        toks = [x for x in _ASCII_WS_RE.split(t or "") if x]
        for c, s in enumerate(range(0, len(toks), stride)):
            w = toks[s:s + window]
            ids.append(i)
            cids.append(c)
            ns.append(len(w))
            texts.append(" ".join(w))
    return pd.DataFrame({
        id_col: pd.Series(ids, dtype=df[id_col].dtype),
        "chunk_id": pd.Series(cids, dtype="int64"),
        "n_tokens": pd.Series(ns, dtype="int64"),
        "chunk_text": pd.Series(texts, dtype="object"),
    })


def chunk_documents(ds: "ray.data.Dataset", window: int = 32,
                    stride: int = 24, id_col: str = "doc_id",
                    text_col: str = "text") -> "ray.data.Dataset":
    """Dataset-level chunking: a pure exploding ``map_batches`` — no
    shuffle, no state; output size is bounded by ``ceil(n/stride)``
    rows per doc, so block sizes stay proportional to input blocks."""
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, "
                         f"got {window}/{stride}")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return chunk_documents_batch(df, window, stride, id_col, text_col)

    return ds.map_batches(explode, batch_format="pandas")
