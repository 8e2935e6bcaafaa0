"""Distributed-equivalence (SURVEY.md §5.5 / north rule): the identical
crawl job at two parallelism levels in FRESH processes produces
byte-identical crawl order, seen set, and extracted text."""

import json
import subprocess
import sys

import pytest

SCRIPT = r"""
import sys, json, shutil, hashlib
ncpu, corpus, ckpt = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import ray
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from web_scraper_ray.crawl import CrawlConfig, run_crawl
from web_scraper_ray.crawl.frontier import load_crawl_order
shutil.rmtree(ckpt, ignore_errors=True)
res = run_crawl(f"{corpus}/pages", f"{corpus}/seeds.parquet", ckpt,
                robots_path=f"{corpus}/robots.parquet",
                config=CrawlConfig(max_depth=2, seen_shards=4))
order = load_crawl_order(ckpt)
order_sig = hashlib.sha256(
    "\n".join(f"{r}|{u}|{v}" for r, u, v in
              zip(order["round"], order["url"], order["vt"])).encode()
).hexdigest()
seen_sig = hashlib.sha256("\n".join(sorted(res.seen.snapshot())).encode()).hexdigest()
# extracted text bytes, order-insensitive
import glob
import pyarrow.parquet as pq
texts = []
for d in sorted(glob.glob(f"{ckpt}/output_*")):
    t = pq.read_table(d, columns=["url", "text"])
    texts.extend(zip(t["url"].to_pylist(), t["text"].to_pylist()))
text_sig = hashlib.sha256(
    "\n".join(f"{u}\x00{x}" for u, x in sorted(texts)).encode()
).hexdigest()
print(json.dumps({"order": order_sig, "seen": seen_sig, "text": text_sig,
                  "n": len(order)}))
ray.shutdown()
"""


@pytest.mark.slow
def test_crawl_identical_across_parallelism(small_corpus, tmp_path):
    sigs = {}
    for ncpu in (2, 8):
        out = subprocess.run(
            [sys.executable, "-c", SCRIPT, str(ncpu), small_corpus,
             str(tmp_path / f"ckpt_{ncpu}")],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        sigs[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    assert sigs[2]["n"] > 10
    assert sigs[2] == sigs[8]
