"""Seen-set internals: cuckoo filter invariants (no false negatives —
SURVEY.md §4.2 "false-negative-free by construction"), shard rebuild,
idempotent check_and_add, driver-handle routing."""

from hypothesis import given, settings
from hypothesis import strategies as st

from web_scraper_ray.crawl.seen import CuckooFilter, SeenShard


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=300, unique=True))
def test_cuckoo_no_false_negatives(items):
    f = CuckooFilter(capacity=64)  # deliberately small → eviction + overflow paths
    for it in items:
        f.insert(it)
    assert all(f.contains(it) for it in items)


def test_cuckoo_deterministic():
    a, b = CuckooFilter(128), CuckooFilter(128)
    for i in range(200):
        a.insert(f"u{i}")
        b.insert(f"u{i}")
    assert a.buckets == b.buckets


def test_cuckoo_negative_lookup_mostly_false():
    f = CuckooFilter(capacity=4096)
    for i in range(1000):
        f.insert(f"https://h{i}.example/p")
    fp = sum(f.contains(f"https://other{i}.example/q") for i in range(1000))
    assert fp < 50  # 16-bit fingerprints → ~per-mille false positives


def test_shard_rebuild_preserves_membership():
    s = SeenShard(0, 1, filter_capacity=64)  # tiny → forces rebuilds
    urls = [f"https://h.example/{i}" for i in range(2000)]
    s.add_batch(urls)
    assert s.filter.n_buckets > 16  # rebuilt bigger
    assert s.contains_batch(urls) == [True] * len(urls)
    assert s.size() == 2000


def test_check_and_add_within_batch_and_across_rounds():
    s = SeenShard(0, 1)
    # within one call, a duplicate url is still reported new (the
    # pending tier answers True until the round commits) — in-round
    # uniqueness is the admission dedup's job, not the shard's
    first = s.check_and_add(["a", "b", "a"])
    assert first == [True, True, True]
    s.commit_round()
    again = s.check_and_add(["a", "b", "c"])
    assert again == [False, False, True]


def test_seenset_routing_and_snapshot(ray_session):
    from web_scraper_ray.crawl.seen import SeenSet

    ss = SeenSet(n_shards=4)
    urls = [f"https://h{i % 7}.example/p{i}" for i in range(100)]
    out = ss.check_and_add(urls)
    assert all(out)
    ss.commit_round()
    assert ss.check_and_add(urls) == [False] * 100
    assert ss.size() == 100
    assert ss.snapshot() == set(urls)


def test_check_and_add_retry_idempotent_until_commit():
    """A Ray task retry re-asks about urls its failed attempt already
    added; the pending tier must answer True again (no silent drops)."""
    s = SeenShard(0, 1)
    assert s.check_and_add(["a", "b"]) == [True, True]
    # simulated retry of the same task before the round commits:
    assert s.check_and_add(["a", "b"]) == [True, True]
    s.commit_round()
    assert s.check_and_add(["a", "c"]) == [False, True]
    assert s.size() == 3
    assert s.snapshot() == ["a", "b", "c"]
