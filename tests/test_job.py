"""End-to-end job pipeline (the reference CLI lifecycle, cli.py:241-395)."""

import glob

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_urls(small_corpus):
    f = sorted(glob.glob(f"{small_corpus}/pages/*.parquet"))[0]
    urls = pq.read_table(f, columns=["url"])["url"].to_pylist()
    return [u for u in urls if "/tags/" not in u and "/category/" not in u][:4]


def test_job_print_per_url(ray_session, small_corpus, corpus_urls):
    from web_scraper_ray.pipelines.job import run_job

    res = run_job(
        corpus_urls + ["not-a-url"],
        {"organization": {"single_file": False}},
        pages_path=f"{small_corpus}/pages",
    )
    assert res.stats["successful"] == len(corpus_urls)
    assert res.stats["failed"] == 1
    assert len(res.printed) == len(corpus_urls)
    # seed order preserved (T4)
    for doc, url in zip(res.printed, corpus_urls):
        assert f'source: "{url}"' in doc


def test_job_combined_print(ray_session, small_corpus, corpus_urls):
    from web_scraper_ray.pipelines.job import run_job

    res = run_job(
        corpus_urls,
        {"organization": {"single_file": True}},
        pages_path=f"{small_corpus}/pages",
    )
    assert len(res.printed) == 1
    assert res.printed[0].count("=" * 50) == len(corpus_urls) - 1


def test_job_file_destination(ray_session, small_corpus, corpus_urls, tmp_path):
    from web_scraper_ray.pipelines.job import run_job

    res = run_job(
        corpus_urls,
        {
            "output": {"destination": "file", "directory": str(tmp_path),
                       "format": "raw"},
            "organization": {"single_file": False},
        },
        pages_path=f"{small_corpus}/pages",
    )
    assert len(res.files) == len(corpus_urls)
    assert all(f.endswith(".html") for f in res.files)
    content = open(res.files[0]).read()
    assert content.startswith("<!DOCTYPE html>")


def test_job_all_invalid(ray_session, small_corpus):
    from web_scraper_ray.pipelines.job import run_job

    res = run_job(["nope", "/rel"], pages_path=f"{small_corpus}/pages")
    assert res.stats["successful"] == 0 and res.stats["failed"] == 2


def test_job_include_images_map(ray_session, small_corpus, corpus_urls, tmp_path):
    """cli.py:75-79 flow: images downloaded (stub), deduped, hash-named;
    the formatter's Images section uses local paths via the J1 map."""
    import glob
    import os

    from web_scraper_ray.pipelines.job import run_job

    res = run_job(
        corpus_urls,
        {
            "output": {"destination": "file", "directory": str(tmp_path),
                       "format": "markdown"},
            "organization": {"single_file": False},
            "scraping": {"include_images": True},
        },
        pages_path=f"{small_corpus}/pages",
    )
    imgs = glob.glob(str(tmp_path / "images" / "*"))
    assert len(imgs) >= 1
    md = open(res.files[0]).read()
    assert "## Images" in md
    assert str(tmp_path / "images") in md  # local path substituted


def test_job_duplicate_seed_urls(ray_session, small_corpus, corpus_urls):
    """Review regression: a URL listed twice must be processed twice
    (the reference's per-URL loop semantics) — the scan-join fetch
    re-expands multiplicity rather than collapsing the set."""
    from web_scraper_ray.pipelines.job import run_job

    res = run_job(
        [corpus_urls[0], corpus_urls[0], corpus_urls[1]],
        {"organization": {"single_file": False}},
        pages_path=f"{small_corpus}/pages",
    )
    assert res.stats["successful"] == 3
    assert res.stats["failed"] == 0
    assert len(res.printed) == 3
    assert sum(corpus_urls[0] in doc for doc in res.printed) == 2
