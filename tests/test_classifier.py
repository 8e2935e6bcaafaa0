"""NB seed-vs-crawl classifier (ops/classifier.py): planted-signal
direction, gate arithmetic (integer cross-multiplication on negative
margins), and model-table semantics on the union vocabulary."""

import pandas as pd
import pytest

import ray
import ray.data

from web_scraper_ray.ops.classifier import nb_filter, nb_scores, nb_top_tokens


@pytest.fixture(scope="module")
def planted(ray_session):
    # positive class speaks "good quality prose", negative speaks
    # "spam junk noise"; "shared" appears equally in both
    pos = ray.data.from_items(
        [{"text": "good quality prose shared"} for _ in range(8)])
    neg = ray.data.from_items(
        [{"text": "spam junk noise shared"} for _ in range(8)])
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "good quality good prose"},
        {"doc_id": 2, "text": "spam junk spam noise"},
        {"doc_id": 3, "text": "shared shared"},
        {"doc_id": 4, "text": ""},           # zero tokens -> dropped
    ])
    return docs, pos, neg


def test_nb_margin_direction(planted):
    docs, pos, neg = planted
    got = nb_scores(docs, pos, neg).to_pandas().set_index("doc_id")
    assert set(got.index) == {1, 2, 3}  # empty doc dropped
    # seed-like doc scores strictly above crawl-like doc
    assert got.loc[1, "margin_bits"] > 0
    assert got.loc[2, "margin_bits"] < 0
    # both classes have 32 tokens total, "shared" counts 8 in each ->
    # identical whole-bit surprisal on both sides: margin exactly 0
    assert got.loc[3, "margin_bits"] == 0
    # margin is definitionally neg_bits - pos_bits
    assert (got["margin_bits"]
            == got["neg_bits"] - got["pos_bits"]).all()


def test_nb_scores_match_sequential_model(planted):
    """Bit-exact replay of the whole-bit NB arithmetic in plain
    Python (the module's executable spec)."""
    docs, pos, neg = planted
    got = (nb_scores(docs, pos, neg).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def counts(rows):
        c = {}
        for r in rows:
            for t in r.split():
                c[t] = c.get(t, 0) + 1
        return c, sum(c.values())

    cp, tp = counts(["good quality prose shared"] * 8)
    cn, tn = counts(["spam junk noise shared"] * 8)

    def bits(c, t, tok):
        return max((t // (c.get(tok, 0) + 1)).bit_length() - 1, 0)

    exp = []
    for doc_id, text in [(1, "good quality good prose"),
                         (2, "spam junk spam noise"),
                         (3, "shared shared")]:
        toks = text.split()
        pb = sum(bits(cp, tp, t) for t in toks)
        nb = sum(bits(cn, tn, t) for t in toks)
        exp.append({"doc_id": doc_id, "n_tokens": len(toks),
                    "pos_bits": pb, "neg_bits": nb,
                    "margin_bits": nb - pb})
    pd.testing.assert_frame_equal(
        got.astype("int64"), pd.DataFrame(exp).astype("int64"))


def test_nb_filter_cross_multiplication(planted):
    """The gate decision 100*margin >= thr_e2*n must be exact on
    NEGATIVE thresholds and margins (no division anywhere)."""
    docs, pos, neg = planted
    scored = nb_scores(docs, pos, neg).to_pandas().set_index("doc_id")
    for thr in (-500, -1, 0, 1, 500):
        kdf = nb_filter(docs, pos, neg, min_margin_e2=thr).to_pandas()
        kept = set(kdf["doc_id"]) if len(kdf) else set()
        want = {d for d, r in scored.iterrows()
                if 100 * r["margin_bits"] >= thr * r["n_tokens"]}
        assert kept == want, f"thr={thr}: {kept} != {want}"


def test_nb_top_tokens_union_vocab(planted):
    _, pos, neg = planted
    got = nb_top_tokens(pos, neg, k=10).to_pandas()
    # union vocabulary: 3 pos-only + 3 neg-only + 1 shared
    assert len(got) == 7
    assert set(got["token"]) == {"good", "quality", "prose", "spam",
                                 "junk", "noise", "shared"}
    w = got.set_index("token")["w_bits"]
    # pos-only tokens weigh strictly above the shared token, which
    # weighs strictly above neg-only tokens
    assert min(w[t] for t in ("good", "quality", "prose")) > w["shared"]
    assert w["shared"] > max(w[t] for t in ("spam", "junk", "noise"))
    assert w["shared"] == 0  # symmetric counts -> zero weight
    # output is ordered (w desc, token asc) and counts are exact
    assert list(got["w_bits"]) == sorted(got["w_bits"], reverse=True)
    row = got.set_index("token").loc["good"]
    assert (row["c_pos"], row["c_neg"]) == (8, 0)


def test_nb_filter_top_self_calibrating(planted, ray_session):
    """nb_filter_top keeps ~keep_pct% by the corpus's own margin
    percentile, and an external population fixes the cut."""
    import ray.data
    from web_scraper_ray.ops.classifier import nb_filter_top, nb_scores

    _, pos, neg = planted
    rng = __import__("random").Random(3)
    words = ["good", "quality", "prose", "spam", "junk", "noise", "shared"]
    docs = [{"doc_id": i,
             "text": " ".join(rng.choice(words) for _ in range(12))}
            for i in range(300)]
    ds = ray.data.from_items(docs)
    kept = nb_filter_top(ds, pos, neg, keep_pct=30).to_pandas()
    frac = len(kept) / 300
    assert 0.25 <= frac <= 0.45  # percentile rule + value ties
    # kept docs have margins >= every dropped doc's margin (scaled)
    sc = nb_scores(ds, pos, neg).to_pandas()
    sc["mm"] = (100 * sc["margin_bits"] + 6400 * sc["n_tokens"]) // sc["n_tokens"]
    kept_ids = set(kept["doc_id"])
    mm_kept = sc.loc[sc.doc_id.isin(kept_ids), "mm"]
    mm_drop = sc.loc[~sc.doc_id.isin(kept_ids), "mm"]
    assert mm_kept.min() > mm_drop.max() or mm_kept.min() >= mm_drop.max()
    # a stricter external population raises the cut
    elite = ray.data.from_items(
        [{"doc_id": 10_000 + i, "text": "good quality prose"}
         for i in range(50)])
    kept_elite = nb_filter_top(ds, pos, neg, keep_pct=30,
                               population=elite).to_pandas()
    assert len(kept_elite) < len(kept)


def test_nb_filter_top_empty_population(planted, ray_session):
    """An empty (or all-zero-token) calibration population has no
    quantile: the gate keeps nothing instead of crashing on int(NaN)
    inside the scoring tasks."""
    import ray.data
    from web_scraper_ray.ops.classifier import nb_filter_top

    docs, pos, neg = planted
    empty_pop = ray.data.from_items(
        [{"doc_id": 99, "text": ""}])  # tokenizes to zero tokens
    kept = nb_filter_top(docs, pos, neg, keep_pct=30,
                         population=empty_pop).to_pandas()
    assert len(kept) == 0
