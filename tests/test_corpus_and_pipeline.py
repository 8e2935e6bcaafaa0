"""Corpus generator determinism + the flagship Ray pipeline end to end,
including the per-row byte-parity invariant (BASELINE.json input_hint)."""

import glob

import pyarrow.parquet as pq
import pytest

from web_scraper_ray.corpus import build_page_rows, build_corpus
from web_scraper_ray.kernel.extract import extract_page


def test_corpus_schema_matches_input_hint(small_corpus):
    files = sorted(glob.glob(f"{small_corpus}/pages/*.parquet"))
    schema = pq.read_schema(files[0])
    assert schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(schema.field("warc_ts").type) == "timestamp[us]"
    assert str(schema.field("html").type) == "binary"


def test_corpus_deterministic():
    a = build_page_rows(42, 5, 10, 120, 12)
    b = build_page_rows(42, 5, 10, 120, 12)
    assert a.equals(b)


def test_text_column_is_kernel_output(small_corpus):
    files = sorted(glob.glob(f"{small_corpus}/pages/*.parquet"))
    tbl = pq.read_table(files[0])
    for url, html, text in zip(
        tbl["url"].to_pylist()[:25], tbl["html"].to_pylist()[:25], tbl["text"].to_pylist()[:25]
    ):
        assert extract_page(html, url)["text"] == text


def test_extract_pipeline_e2e(ray_session, small_corpus, tmp_path):
    from web_scraper_ray.pipelines.flagship import extract_pipeline

    out = str(tmp_path / "out")
    ds = extract_pipeline(f"{small_corpus}/pages", out_dir=out)
    n = pq.read_table(out).num_rows
    assert n == 120
    # stable schema
    schema = pq.read_schema(sorted(glob.glob(f"{out}/*.parquet"))[0])
    assert "text" in schema.names and "links" in schema.names


def test_verify_pipeline_all_match(ray_session, small_corpus):
    """Distributed re-extraction is byte-identical to the sequential
    oracle for every row — the parity gate."""
    from web_scraper_ray.pipelines.flagship import verify_pipeline

    ds = verify_pipeline(f"{small_corpus}/pages")
    import pyarrow.compute as pc

    total, matched = 0, 0
    for batch in ds.iter_batches(batch_format="pyarrow"):
        total += batch.num_rows
        matched += pc.sum(batch["text_match"]).as_py()
    assert total == 120
    assert matched == total


def test_build_training_corpus_composite(ray_session, sf_dir, tmp_path):
    """The training-corpus composite end to end: quality gate → exact
    dedup → near-dup removal → langid/fingerprint/token counts →
    partitioned parquet + atomic manifest."""
    import json
    import os

    import pyarrow.parquet as pq

    from web_scraper_ray.pipelines.training_corpus import (
        CORPUS_COLUMNS,
        build_training_corpus,
    )

    out = str(tmp_path / "curated")
    m = build_training_corpus(f"{sf_dir}/documents.parquet", out, near_dedup=True)
    assert 0 < m["n_out"] <= m["n_in"]
    assert sum(m["lang_counts"].values()) == m["n_out"]
    t = pq.read_table(out)
    assert t.column_names == CORPUS_COLUMNS
    assert t.num_rows == m["n_out"]
    disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert disk == m

    # the near-dup stage only ever removes rows vs the spine
    out2 = str(tmp_path / "curated_spine")
    m2 = build_training_corpus(f"{sf_dir}/documents.parquet", out2,
                               near_dedup=False)
    assert m["n_out"] <= m2["n_out"]
