"""Committed golden extraction outputs: the kernel's bytes are pinned to
files in git, so any semantic drift in the kernel breaks loudly here
(stronger than the regenerated corpus oracle, which moves with the
kernel)."""

import glob
import json
import os

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
CASES = sorted(
    os.path.basename(p)[:-5] for p in glob.glob(f"{FIXTURE_DIR}/*.json")
)


@pytest.mark.parametrize("case", CASES)
def test_golden_extraction(case):
    from web_scraper_ray.kernel.extract import extract_page

    with open(f"{FIXTURE_DIR}/{case}.html") as f:
        html = f.read()
    with open(f"{FIXTURE_DIR}/{case}.json") as f:
        want = json.load(f)
    rec = extract_page(html, want["url"])
    for key in ("title", "text", "content_html", "og_title", "og_description",
                "links", "images", "token_count"):
        assert rec[key] == want[key], f"{case}:{key} diverged"


def test_golden_cases_exist():
    assert len(CASES) >= 5
