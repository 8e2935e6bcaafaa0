"""Image pipeline: flat_map, stub download, md5 dedup, hash-named sink."""

import glob
import os

from web_scraper_ray.ops.images import image_ext


def test_image_ext_rules():  # scraper.py:476-482
    assert image_ext("https://e.x/a/b.png") == ".png"
    assert image_ext("https://e.x/a/b.PNG") == ".jpg"  # whitelist is lowercase
    assert image_ext("https://e.x/a/b") == ".jpg"
    assert image_ext("https://e.x/a/b.exe") == ".jpg"
    assert image_ext("https://e.x/a/b.webp?x=1") == ".webp"


def test_image_pipeline_e2e(ray_session, small_corpus, tmp_path):
    from web_scraper_ray.ops.images import (
        dedup_images,
        image_pipeline,
        images_flat,
        ImageDownloader,
    )
    from web_scraper_ray.pipelines.flagship import extract_pipeline

    extracted = extract_pipeline(f"{small_corpus}/pages")
    flat = images_flat(extracted)
    n_refs = flat.count()
    assert n_refs == 120  # one img per generated page

    out = image_pipeline(extracted, str(tmp_path / "imgs")).to_pandas()
    # corpus uses img_{i%17}.png per host → far fewer unique contents
    files = glob.glob(str(tmp_path / "imgs" / "*"))
    assert len(files) == len(out) < n_refs
    # hash-named, extension from url
    for f in files:
        base = os.path.basename(f)
        assert base.endswith(".png") and len(base) == 32 + 4
    # idempotent rerun → same file set
    out2 = image_pipeline(extracted, str(tmp_path / "imgs")).to_pandas()
    assert sorted(out2["path"]) == sorted(out["path"])


def test_dedup_scope_page_vs_global(ray_session):
    import ray.data
    from web_scraper_ray.ops.images import ImageDownloader, dedup_images

    rows = [
        {"page_url": "p1", "image_url": "https://e.x/same.png", "alt": "", "width": "", "height": ""},
        {"page_url": "p2", "image_url": "https://e.x/same.png", "alt": "", "width": "", "height": ""},
        {"page_url": "p1", "image_url": "https://e.x/other.png", "alt": "", "width": "", "height": ""},
    ]
    ds = ray.data.from_items(rows).map_batches(
        ImageDownloader, batch_format="pyarrow", concurrency=1
    )
    assert dedup_images(ds, scope="global").count() == 2
    assert dedup_images(ds, scope="page").count() == 3
