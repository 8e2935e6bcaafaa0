"""Webtext release pipeline (pipelines/webtext.py): chain semantics
match the hash-checked webtext_clean query; sink follows the
resumable-output contract."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus():
    from web_scraper_ray.corpus import build_corpus

    return build_corpus("/tmp/wsr_corpus_round0", n_pages=400, n_hosts=24,
                        seed=42, n_seeds=40, links_per_page=6,
                        use_ray=False)


def test_release_matches_query_semantics(ray_session, corpus, tmp_path):
    import __ray_entry__ as entry

    out = str(tmp_path / "release")
    from web_scraper_ray.pipelines.webtext import webtext_release

    manifest = webtext_release(f"{corpus}/pages", out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert manifest["n_files"] == len(files) > 0

    got = (pq.read_table(out).to_pandas()
           .sort_values("url").reset_index(drop=True))
    ref = (entry.queries()["webtext_clean"]("unused").to_pandas())
    ref = (ref[ref["kept"] == 1]
           .rename(columns={"clean_text": "text"})
           [["url", "text", "n_lines", "n_kept"]]
           .sort_values("url").reset_index(drop=True))
    assert manifest["n_rows"] == len(ref)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_release_from_checkpoint(ray_session, corpus, tmp_path):
    import shutil

    from web_scraper_ray.crawl import CrawlConfig, run_crawl
    from web_scraper_ray.pipelines.webtext import webtext_release

    ckpt = str(tmp_path / "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    run_crawl(f"{corpus}/pages", f"{corpus}/seeds.parquet", ckpt,
              robots_path=f"{corpus}/robots.parquet",
              config=CrawlConfig(max_depth=1))
    out = str(tmp_path / "release")
    manifest = webtext_release(ckpt, out, from_checkpoint=True)
    assert manifest["n_rows"] >= 0 and manifest["n_files"] >= 1
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh)["from_checkpoint"] is True
    # rerun overwrites cleanly (idempotent counts)
    again = webtext_release(ckpt, out, from_checkpoint=True)
    assert again["n_rows"] == manifest["n_rows"]


def test_cli_crawl_release_flag(ray_session, corpus, tmp_path, capsys):
    """`--crawl --release DIR` runs the release pipeline over the
    fresh checkpoint and reports its manifest in the summary JSON."""
    import pyarrow.parquet as pq

    from web_scraper_ray.__main__ import main

    url = (pq.read_table(f"{corpus}/pages", columns=["url"])
           .column("url")[0].as_py())
    rel = str(tmp_path / "rel")
    rc = main([url, "--corpus", corpus, "--crawl",
               "--checkpoint-dir", str(tmp_path / "ckpt"),
               "--release", rel, "--max-depth", "1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["release"]["n_files"] >= 1
    assert os.path.exists(os.path.join(rel, "_manifest.json"))


def test_release_missing_checkpoint(ray_session, tmp_path):
    from web_scraper_ray.pipelines.webtext import webtext_release

    with pytest.raises(FileNotFoundError):
        webtext_release(str(tmp_path / "nope"), str(tmp_path / "out"),
                        from_checkpoint=True)


def test_release_refuses_foreign_out_dir(ray_session, corpus, tmp_path):
    """A non-empty out_dir without _manifest.json is not a prior
    release — webtext_release must refuse rather than delete data."""
    import pytest

    from web_scraper_ray.pipelines.webtext import webtext_release

    out = tmp_path / "not_a_release"
    out.mkdir()
    (out / "precious.parquet").write_bytes(b"not ours")
    with pytest.raises(ValueError, match="_manifest.json"):
        webtext_release(f"{corpus}/pages", str(out))
    assert (out / "precious.parquet").read_bytes() == b"not ours"
