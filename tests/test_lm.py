"""Unigram-LM surprisal scoring / filtering and BPE merge counting
(ops/lm.py) against sequential pure-Python reference models."""

import re
from collections import Counter

import pandas as pd
import pytest

_TOK = re.compile(r"[^ \t\n\r\f\v]+")


def _ref_model(target_texts):
    cnt = Counter()
    for t in target_texts:
        cnt.update(_TOK.findall(t))
    total = sum(cnt.values())
    bits = {tok: (total // (n + 1)).bit_length() - 1
            for tok, n in cnt.items()}
    return bits, total.bit_length() - 1


def _ref_scores(texts, ids, bits, oov):
    rows = []
    for i, t in zip(ids, texts):
        toks = _TOK.findall(t or "")
        if not toks:
            continue
        tb = sum(bits.get(tok, oov) for tok in toks)
        rows.append((i, len(toks), tb, (100 * tb) // len(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "total_bits",
                                       "mean_bits_e2"])


@pytest.fixture(scope="module")
def lm_corpus(ray_session):
    import ray.data

    target = ["the cat sat on the mat", "the dog sat on the log",
              "a cat and a dog met on the mat"]
    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},       # in-domain
        {"doc_id": 1, "text": "zyx qwv unseen tokens only"},   # all OOV
        {"doc_id": 2, "text": "the dog met a cat"},            # mixed
        {"doc_id": 3, "text": ""},                              # zero tokens
        {"doc_id": 4, "text": " \t\n "},                        # ws only
        {"doc_id": 5, "text": "the the the the"},               # high freq
    ]
    return (ray.data.from_items(docs),
            ray.data.from_items([{"text": t} for t in target]),
            docs, target)


def test_surprisal_matches_reference(lm_corpus):
    from web_scraper_ray.ops.lm import surprisal_scores

    ds, target_ds, docs, target = lm_corpus
    got = (surprisal_scores(ds, target_ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    bits, oov = _ref_model(target)
    want = _ref_scores([d["text"] for d in docs],
                       [d["doc_id"] for d in docs], bits, oov)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # zero-token docs dropped; OOV doc scores strictly worse than in-domain
    assert set(got["doc_id"]) == {0, 1, 2, 5}
    by_id = got.set_index("doc_id")["mean_bits_e2"]
    assert by_id[1] > by_id[0] and by_id[1] > by_id[5]


def test_surprisal_filter_threshold(lm_corpus):
    from web_scraper_ray.ops.lm import surprisal_filter, surprisal_scores

    ds, target_ds, _, _ = lm_corpus
    scores = surprisal_scores(ds, target_ds).to_pandas()
    thr = int(scores["mean_bits_e2"].median())
    kept = surprisal_filter(ds, target_ds, max_mean_bits_e2=thr).to_pandas()
    want = set(scores.loc[scores["mean_bits_e2"] <= thr, "doc_id"])
    assert set(kept["doc_id"]) == want
    assert 0 < len(kept) < 6  # nontrivial split; empties dropped


def test_bpe_merge_counts_reference(ray_session):
    import ray.data
    from web_scraper_ray.ops.lm import bpe_merge_counts

    texts = ["a b a b c", "a b", "c", "", "x", "b c a b a b"]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = bpe_merge_counts(ds, k=4).to_pandas()
    ref = Counter()
    for t in texts:
        toks = _TOK.findall(t)
        ref.update(zip(toks, toks[1:]))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(map(tuple, got[["p1", "p2"]].to_numpy())) == \
        [p for p, _ in want]
    assert list(got["n"]) == [n for _, n in want]
    # tie order is (n desc, p1 asc, p2 asc) — deterministic
    assert got.iloc[0][["p1", "p2"]].tolist() == ["a", "b"]


def test_lm_degenerate_inputs(ray_session):
    import ray.data
    from web_scraper_ray.ops.lm import bpe_merge_counts, surprisal_scores

    # corpus of only empty/whitespace docs: no scored rows, no pairs
    ds = ray.data.from_items(
        [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "  "}])
    target = ray.data.from_items([{"text": "the cat"}])
    assert surprisal_scores(ds, target).count() == 0
    assert bpe_merge_counts(ds, k=5).count() == 0
    # single-token docs produce no pairs either
    singles = ray.data.from_items(
        [{"doc_id": 0, "text": "one"}, {"doc_id": 1, "text": "two"}])
    assert bpe_merge_counts(singles, k=5).count() == 0


def test_surprisal_buckets_trisection(ray_session):
    """head/middle/tail labels follow the exact 33/67 percentile cuts
    of the scored distribution; all three buckets are populated on a
    spread-out corpus and labels agree with a sequential replay."""
    import ray.data
    from web_scraper_ray.ops.lm import surprisal_buckets, surprisal_scores

    target = ray.data.from_items(
        [{"text": "the cat sat on the mat and the dog sat on the log"}])
    docs = [{"doc_id": i,
             "text": " ".join((["the", "cat", "sat"] * (6 - i)
                               + [f"rare{j}" for j in range(i)]))}
            for i in range(6)]
    ds = ray.data.from_items(docs)
    got = (surprisal_buckets(ds, target).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    scores = (surprisal_scores(ds, target).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    m = scores["mean_bits_e2"].to_numpy()
    n = len(m)
    sm = sorted(m)
    # replicate the integer quantile rule: first value whose cumcount
    # reaches ceil(q * n / 100)
    import numpy as np
    cum = np.arange(1, n + 1)
    c1 = sm[int(np.searchsorted(cum, (33 * n + 99) // 100))]
    c2 = sm[int(np.searchsorted(cum, (67 * n + 99) // 100))]
    want = ["head" if v <= c1 else ("middle" if v <= c2 else "tail")
            for v in m]
    assert list(got["bucket"]) == want
    assert set(got["bucket"]) == {"head", "middle", "tail"}


def test_surprisal_degenerate_single_type_target(ray_session):
    """A target of one repeated token type makes T // (c+1) == 0; the
    clamp keeps bits at 0 (DuckDB length(bin(0))-1 parity) instead of
    -1."""
    import ray.data
    from web_scraper_ray.ops.lm import surprisal_scores

    target = ray.data.from_items([{"text": "the the the"}])
    ds = ray.data.from_items([{"doc_id": 0, "text": "the the"},
                              {"doc_id": 1, "text": "oov tokens"}])
    got = (surprisal_scores(ds, target).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "total_bits"] == 0  # in-vocab: clamped to 0
    assert got.loc[0, "mean_bits_e2"] == 0
    assert got.loc[1, "total_bits"] == 2  # OOV: T=3 -> 1 bit each


def _ref_bigram_scores(texts, ids, target_texts):
    uni, bi = Counter(), Counter()
    for t in target_texts:
        toks = _TOK.findall(t)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())

    def bl(x):
        return max(x.bit_length() - 1, 0)

    rows = []
    for i, t in zip(ids, texts):
        toks = _TOK.findall(t or "")
        if not toks:
            continue
        tb = 0
        for j, tok in enumerate(toks):
            prev = toks[j - 1] if j else None
            if prev is None or uni.get(prev, 0) == 0:
                c = uni.get(tok)
                tb += bl(total) if c is None else bl(total // (c + 1))
            else:
                tb += bl((uni[prev] + 1) // (bi.get((prev, tok), 0) + 1))
        rows.append((i, len(toks), tb, (100 * tb) // len(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "total_bits",
                                       "mean_bits_e2"])


def test_bigram_surprisal_matches_reference(lm_corpus):
    """Bigram-with-backoff scores equal the sequential model on every
    lane (doc start, in-vocab pair, seen-context/unseen-pair, OOV
    context, OOV token), and context sharpens the signal: in-domain
    word order scores no worse than the same words shuffled."""
    import ray.data

    from web_scraper_ray.ops.lm import bigram_surprisal_scores

    ds, target_ds, docs, target = lm_corpus
    got = (bigram_surprisal_scores(ds, target_ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _ref_bigram_scores([d["text"] for d in docs],
                              [d["doc_id"] for d in docs], target)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert set(got["doc_id"]) == {0, 1, 2, 5}

    # word order matters now: the exact target sentence beats its
    # reversal under the bigram model
    probe = ray.data.from_items([
        {"doc_id": 10, "text": "the cat sat on the mat"},
        {"doc_id": 11, "text": "mat the on sat cat the"},
    ])
    p = (bigram_surprisal_scores(probe, target_ds).to_pandas()
         .set_index("doc_id")["total_bits"])
    assert p[10] < p[11]
    # partitioning-stable
    again = (bigram_surprisal_scores(ds.repartition(4), target_ds)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(again.astype("int64"),
                                  got.astype("int64"))


def test_surprisal_by_group_matches_per_doc(lm_corpus):
    """Group sums equal the per-doc scores folded by group, at any
    partitioning; zero-token docs contribute nothing."""
    import ray.data

    from web_scraper_ray.ops.lm import surprisal_by_group, surprisal_scores

    ds, target_ds, docs, _ = lm_corpus
    grp = {0: "a", 1: "b", 2: "a", 3: "b", 4: "a", 5: "b"}
    rows = [{**d, "src": grp[d["doc_id"]]} for d in docs]
    per_doc = surprisal_scores(ds, target_ds).to_pandas()
    per_doc["src"] = per_doc["doc_id"].map(grp)
    want = (per_doc.groupby("src")[["n_tokens", "total_bits"]].sum()
            .reset_index())
    want["mean_bits_e2"] = ((100 * want["total_bits"])
                            // want["n_tokens"])
    for parts in (None, 4):
        gds = ray.data.from_items(rows)
        if parts:
            gds = gds.repartition(parts)
        got = (surprisal_by_group(gds, target_ds, "src")
               .to_pandas().sort_values("src").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["src", "n_tokens", "total_bits", "mean_bits_e2"]]
            .astype({"n_tokens": "int64", "total_bits": "int64",
                     "mean_bits_e2": "int64"}),
            want.astype({"n_tokens": "int64", "total_bits": "int64",
                         "mean_bits_e2": "int64"}))


def test_bpe_train_matches_sequential(ray_session):
    """The distributed training loop equals a sequential reference:
    same winners in order, later steps count fused units (a merge of
    a merge), leftmost-greedy overlap rule, deterministic ties."""
    import ray.data

    from web_scraper_ray.ops.lm import bpe_train

    texts = (["a b c"] * 5          # "a b" wins step 0 (ties: a<b<c)
             + ["a b"] * 2          # reinforce (a, b)
             + ["x x x"]            # overlap: leftmost pair only
             + ["", "  "])          # no tokens

    def ref_train(texts, n):
        state = [" " + " ".join(_TOK.findall(t)) + " "
                 for t in texts if _TOK.findall(t)]
        out = []
        for step in range(n):
            cnt = Counter()
            for s in state:
                toks = s.strip(" ").split(" ")
                cnt.update(zip(toks, toks[1:]))
            if not cnt:
                break
            (p1, p2), n_best = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, p1, p2, n_best))
            state = [s.replace(f" {p1} {p2} ", f" {p1}\x01{p2} ")
                     for s in state]
        return out

    want = ref_train(texts, 3)
    # the loop must chain: step 1's winner contains step 0's fused unit
    assert want[0][1:3] == ("a", "b")
    assert "\x01" in want[1][1] + want[1][2]

    for parts in (None, 5):
        ds = ray.data.from_items([{"text": t} for t in texts])
        if parts:
            ds = ds.repartition(parts)
        got = [tuple(r) for r in bpe_train(ds, n_merges=3).to_pandas()
               .itertuples(index=False)]
        assert got == want
    # n_merges=0 and all-empty input: empty merge tables
    assert bpe_train(ray.data.from_items([{"text": "a b"}]),
                     n_merges=0).count() == 0
    assert bpe_train(ray.data.from_items([{"text": ""}]),
                     n_merges=2).count() == 0


def test_bpe_encode_applies_merges(ray_session):
    """Encode applies trained merges in order: unit counts drop by
    exactly the number of fused occurrences, untouched docs keep
    n_units == n_pretokens, zero-token docs are dropped."""
    import ray.data

    from web_scraper_ray.ops.lm import bpe_encode, bpe_train

    texts = ["a b c a b", "c c c", "a b", ""]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    merges = bpe_train(ds, n_merges=2)
    got = (bpe_encode(ds, merges).to_pandas()
           .set_index("doc_id").sort_index())
    # step 0 fuses (a, b) [3 occurrences]; step 1 fuses (c, c) [2,
    # leftmost-greedy gives 1 fuse in "c c c"]
    m = merges.to_pandas()
    assert list(zip(m["p1"], m["p2"])) == [("a", "b"), ("c", "c")]
    assert got.loc[0, "n_pretokens"] == 5 and got.loc[0, "n_units"] == 3
    assert got.loc[1, "n_pretokens"] == 3 and got.loc[1, "n_units"] == 2
    assert got.loc[2, "n_units"] == 1
    assert 3 not in got.index  # empty doc dropped
    # empty merge table: identity encode
    ident = (bpe_encode(ds, bpe_train(ds, n_merges=0)).to_pandas()
             .set_index("doc_id"))
    assert (ident["n_units"] == ident["n_pretokens"]).all()


def test_bpe_oracles_degenerate_early_termination(ray_session):
    """When the corpus supports fewer merges than requested, the
    train AND encode SQL oracles must match the engine instead of
    NULL-propagating through the empty-winner replace()."""
    import duckdb
    import ray.data

    import __ray_entry__ as entry
    from web_scraper_ray.ops.lm import bpe_encode, bpe_train

    # exactly ONE mergeable pair corpus-wide -> training dries up
    # after step 0 of 3
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["a a", "b", "c"]})
    con = duckdb.connect()
    con.register("documents", docs)
    sql_train = con.execute(entry._bpe_train_sql(3)).df()
    sql_encode = (con.execute(entry._bpe_encode_sql(3)).df()
                  .sort_values("doc_id").reset_index(drop=True))

    ds = ray.data.from_pandas(docs)
    got_train = bpe_train(ds, n_merges=3).to_pandas()
    got_encode = (bpe_encode(ds, bpe_train(ds, n_merges=3)).to_pandas()
                  .sort_values("doc_id").reset_index(drop=True))

    assert len(got_train) == 1 and len(sql_train) == 1
    assert tuple(sql_train.iloc[0][["p1", "p2"]]) == ("a", "a")
    assert not sql_encode["n_units"].isna().any()
    pd.testing.assert_frame_equal(
        got_encode.astype({"n_pretokens": "int64", "n_units": "int64"}),
        sql_encode.astype({"n_pretokens": "int64", "n_units": "int64"}))
