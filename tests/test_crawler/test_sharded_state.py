"""Per-shard crawl-state checkpoints.

The round-1 format pickled every politeness window + cuckoo filter
into ONE driver-side file per iteration — a driver-memory and
single-writer bottleneck at 10^9-domain scale. The sharded format
writes one file per state shard, by the shard actor itself, with a
meta.json commit marker written last (write-then-commit, same pattern
as the table manifests). These tests pin: layout, restore parity,
legacy single-pickle read-compat, shard-count re-routing, and GC.
"""

import json
import os
import pickle

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.state.politeness import PolitenessPool
from hydra_ray.state.urlseen import UrlSeenPool

from .test_resume import checks_fingerprint, small_seed


@pytest.mark.usefixtures("ray_session")
def test_state_dir_layout(tmp_path, make_crawl_engine):
    e = make_crawl_engine(str(tmp_path / "wd"), batch_size=30, actor_pools=False)
    e.load_catalog(small_seed())
    e.run(1)
    d = e._state_dir(1)
    assert os.path.isdir(d)
    names = sorted(os.listdir(d))
    n_pol, n_seen = e.politeness.n, e.urlseen.n
    assert names == sorted(
        [f"politeness-{i:03d}.pkl" for i in range(n_pol)]
        + [f"urlseen-{i:03d}.pkl" for i in range(n_seen)]
        + ["meta.json"]
    )
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta == {"iteration": 1, "politeness_shards": n_pol, "urlseen_shards": n_seen}
    e.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_legacy_single_pickle_still_restores(tmp_path, make_crawl_engine):
    """A workdir checkpointed by the round-1 format resumes unchanged."""
    import shutil

    wd = str(tmp_path / "wd")
    e = make_crawl_engine(wd, batch_size=30, actor_pools=False)
    e.load_catalog(small_seed())
    e.run(2)
    # rewrite the newest checkpoint in the legacy single-file format
    blob = {
        "iteration": e.iteration,
        "politeness": e.politeness.serialize(),
        "urlseen": e.urlseen.serialize(),
    }
    for it in range(e.iteration + 1):
        p = e._state_dir(it)
        if os.path.isdir(p):
            shutil.rmtree(p)
    with open(e._state_path(e.iteration), "wb") as f:
        pickle.dump(blob, f)
    e.shutdown()

    e2 = make_crawl_engine(wd, batch_size=30, actor_pools=False)
    assert e2.iteration == 2
    tbl = e2.catalog.read_arrow()
    keys = tbl["url_key"].to_numpy(zero_copy_only=False).astype("int64")
    assert not any(e2.urlseen.add_if_new(keys[:20]))
    e2.run(1)
    assert e2.checks.count() > 0
    e2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_resume_with_different_shard_counts(tmp_path, make_crawl_engine):
    """Checkpoint with K shards, resume with K' ≠ K: state is re-routed
    by the stable hash and the crawl continues identically (politeness
    dict re-scatter; URL-seen exact-key re-insert)."""
    kw = dict(batch_size=30, actor_pools=False)
    straight = make_crawl_engine(
        str(tmp_path / "s"), politeness_shards=2, urlseen_shards=3, **kw
    )
    straight.load_catalog(small_seed())
    straight.run(4)

    wd = str(tmp_path / "r")
    a = make_crawl_engine(wd, politeness_shards=2, urlseen_shards=3, **kw)
    a.load_catalog(small_seed())
    a.run(2)
    a.shutdown()
    b = make_crawl_engine(wd, politeness_shards=5, urlseen_shards=2, **kw)
    assert b.iteration == 2
    b.run(2)
    assert checks_fingerprint(straight) == checks_fingerprint(b)
    straight.shutdown()
    b.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_pool_level_save_load_roundtrip(tmp_path):
    pol = PolitenessPool.create(n_shards=3)
    pol.record_agg([("a.example", 5, 200, None, None), ("b.example", 2, 429, "0", "10")], now=100.0)
    seen = UrlSeenPool.create(n_shards=2, capacity_per_shard=1 << 12)
    keys = np.arange(50, dtype=np.int64) * 7919
    assert all(seen.add_if_new(keys))

    d = str(tmp_path / "st")
    os.makedirs(d)
    import ray

    ray.get(pol.save_shards(d) + seen.save_shards(d))
    assert sorted(os.listdir(d)) == sorted(
        [f"politeness-{i:03d}.pkl" for i in range(3)]
        + [f"urlseen-{i:03d}.pkl" for i in range(2)]
    )

    pol2 = PolitenessPool.create(n_shards=3)
    pol2.load_shards([os.path.join(d, f"politeness-{i:03d}.pkl") for i in range(3)])
    assert pol2.should_backoff(["b.example"], now=101.0)[0][0]  # 429 cool-off
    assert not pol2.should_backoff(["c.example"], now=101.0)[0][0]

    # mismatched count → driver re-route, same membership
    seen2 = UrlSeenPool.create(n_shards=5, capacity_per_shard=1 << 12)
    seen2.load_shards([os.path.join(d, f"urlseen-{i:03d}.pkl") for i in range(2)])
    assert not any(seen2.add_if_new(keys))
    assert all(seen2.add_if_new(keys + 1))
    for actor in pol.shards + pol2.shards + seen.shards + seen2.shards:
        ray.kill(actor)


@pytest.mark.usefixtures("ray_session")
def test_gc_prunes_old_state_dirs(tmp_path, make_crawl_engine):
    e = make_crawl_engine(str(tmp_path / "wd"), batch_size=30, actor_pools=False)
    e.load_catalog(small_seed())
    e.run(5)
    state_root = os.path.join(e.workdir, "state")
    assert len(os.listdir(state_root)) >= 5
    e.gc(keep_state=2)
    kept = sorted(os.listdir(state_root))
    assert kept == ["iter000004", "iter000005"]
    # resume still works off the kept checkpoints
    e.shutdown()
    e2 = make_crawl_engine(str(tmp_path / "wd"), batch_size=30, actor_pools=False)
    assert e2.iteration == 5
    e2.run(1)
    e2.shutdown()
