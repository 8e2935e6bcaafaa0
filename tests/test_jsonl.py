"""JSONL source (sources/jsonl.py) ↔ shard sink (sinks.py) roundtrip.
The value-level parity vs the original parquet is pinned by
test_queries_oracle.py (jsonl_roundtrip); these cover the source's
failure modes."""

import json
import os
import shutil

import pytest


def _export(tmp, n=40):
    import ray.data

    from web_scraper_ray.sinks import write_jsonl_shards

    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i} — Größe & <tag>", "n": i * 2}
         for i in range(n)])
    manifest = write_jsonl_shards(ds, tmp, rows_per_shard=10)
    return manifest


def test_jsonl_roundtrip_values(ray_session, tmp_path):
    from web_scraper_ray.sources.jsonl import read_jsonl

    out = str(tmp_path / "shards")
    m = _export(out)
    assert m["n_rows"] == 40
    back = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == 40
    # unicode + markup survive the JSON encode/decode
    assert back.loc[3, "text"] == "doc 3 — Größe & <tag>"
    assert back.loc[3, "n"] == 6
    # column pruning post-parse
    two = read_jsonl(out, columns=["doc_id"]).schema().names
    assert two == ["doc_id"]


def test_jsonl_manifest_mismatch(ray_session, tmp_path):
    from web_scraper_ray.sources.jsonl import read_jsonl

    out = str(tmp_path / "shards")
    _export(out)
    shards = [f for f in os.listdir(out) if not f.startswith("_")]
    os.remove(os.path.join(out, shards[0]))
    with pytest.raises(FileNotFoundError, match="manifest"):
        read_jsonl(out)
    # opt-out still reads the surviving shards
    n = read_jsonl(out, verify_manifest=False).count()
    assert 0 < n < 40


def test_jsonl_empty_dir(ray_session, tmp_path):
    from web_scraper_ray.sources.jsonl import read_jsonl

    out = str(tmp_path / "empty")
    os.makedirs(out)
    with pytest.raises(FileNotFoundError):
        read_jsonl(out)
