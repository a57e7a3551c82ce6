"""Cuckoo filter: no false negatives, bounded false positives, delete,
serialization, and the sharded pool's exact-membership guarantee."""

import numpy as np
import pytest

from hydra_ray.state.cuckoo import CuckooFilter


def test_no_false_negatives():
    f = CuckooFilter(capacity=1 << 14)
    keys = np.arange(10_000, dtype=np.uint64) * 2654435761
    assert f.insert_batch(keys).all()
    assert f.contains_batch(keys).all()


def test_false_positive_rate_bounded():
    f = CuckooFilter(capacity=1 << 14)
    keys = np.arange(10_000, dtype=np.uint64) * 2654435761
    f.insert_batch(keys)
    probe = np.arange(1_000_000, 1_100_000, dtype=np.uint64) * 97
    fp = f.contains_batch(probe).mean()
    assert fp < 0.01, f"false positive rate too high: {fp}"


def test_delete():
    f = CuckooFilter(capacity=1 << 10)
    keys = np.array([1, 2, 3], dtype=np.uint64)
    f.insert_batch(keys)
    assert f.delete_batch(np.array([2], dtype=np.uint64)).all()
    got = f.contains_batch(keys)
    assert got[0] and not got[1] and got[2]


def test_serialization_roundtrip():
    f = CuckooFilter(capacity=1 << 12)
    keys = np.arange(1000, dtype=np.uint64) * 31
    f.insert_batch(keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.count == f.count
    assert g.contains_batch(keys).all()


def test_load_factor_insertable():
    # fill to ~90% load without failures
    f = CuckooFilter(capacity=1 << 12)
    n = int((1 << 12) * 0.9)
    keys = (np.arange(n, dtype=np.uint64) + 7) * 0x9E3779B9
    ok = f.insert_batch(keys)
    assert ok.mean() > 0.99
    assert f.load_factor > 0.85


@pytest.mark.usefixtures("ray_session")
def test_urlseen_pool_exactness():
    from hydra_ray.state.urlseen import UrlSeenPool

    pool = UrlSeenPool.create(n_shards=2, capacity_per_shard=1 << 12)
    keys = np.arange(500, dtype=np.int64) * 1234567
    first = pool.add_if_new(keys)
    assert first.all()
    again = pool.add_if_new(keys)
    assert not again.any()
    # intra-batch duplicates: first occurrence wins
    dup = np.array([10**6, 10**6, 10**6 + 1], dtype=np.int64)
    got = pool.add_if_new(dup)
    assert got.tolist() == [True, False, True]
    assert pool.contains(keys).all()
    # checkpoint roundtrip
    blobs = pool.serialize()
    pool2 = UrlSeenPool.create(n_shards=2, capacity_per_shard=1 << 12)
    pool2.restore(blobs)
    assert not pool2.add_if_new(keys[:10]).any()


def test_overfull_never_false_negative():
    """Victim stash (Fan et al. §4): past the kick-chain limit a failed
    insert must never drop a PREVIOUSLY inserted key's fingerprint —
    every key whose insert reported True stays findable, refused inserts
    report False up front, and the stash survives serialization."""
    f = CuckooFilter(capacity=1 << 6)  # 16 buckets x 4 slots = 64 slots
    keys = (np.arange(512, dtype=np.uint64) + 3) * 0x9E3779B97F4A7C15
    ok = f.insert_batch(keys)
    assert not ok.all()  # 512 keys into 64 slots: inserts must refuse
    inserted = keys[ok]
    assert f.contains_batch(inserted).all(), "lost a successfully inserted key"
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.contains_batch(inserted).all()
    assert g.count == f.count
    # stash entries are deletable like table entries
    if f.stash:
        victim_ok = f.delete_batch(inserted)
        assert victim_ok.all()


def test_stash_roundtrip_pre_stash_blob():
    """A checkpoint written before the stash existed (no trailing pairs)
    still restores."""
    f = CuckooFilter(capacity=1 << 10)
    keys = np.arange(100, dtype=np.uint64) * 31
    f.insert_batch(keys)
    header_and_table = f.to_bytes()  # empty stash == legacy layout
    g = CuckooFilter.from_bytes(header_and_table)
    assert g.stash == [] and g.contains_batch(keys).all()


@pytest.mark.usefixtures("ray_session")
def test_urlseen_exact_mode_survives_filter_refusals():
    """With a deliberately tiny filter, add_if_new refusals must not
    re-admit seen URLs (the exact set is authoritative in exact mode)."""
    from hydra_ray.state.urlseen import UrlSeenPool

    pool = UrlSeenPool.create(n_shards=1, capacity_per_shard=1 << 6)
    keys = np.arange(2000, dtype=np.int64) * 1234567
    first = pool.add_if_new(keys)
    assert first.all()
    again = pool.add_if_new(keys)
    assert not again.any(), "filter refusal re-admitted a seen URL"
    assert pool.contains(keys).all()
