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
