"""Checkpoint/resume + cross-parallelism determinism (north rule:
resumable from per-partition checkpoints; identical results at any
parallelism level under the seeded ordering contract)."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.synth import catalog_from_documents


def small_seed(n=120):
    docs = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64())})
    return catalog_from_documents(docs)


def checks_fingerprint(engine):
    t = engine.checks.read_arrow()
    rows = sorted(
        zip(
            t["id"].to_pylist(),
            t["resource_id"].to_pylist(),
            t["status"].to_pylist(),
            t["timeout"].to_pylist(),
            t["checksum"].to_pylist(),
            t["created_at"].to_pylist(),
            t["next_check_at"].to_pylist(),
        )
    )
    return rows


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume_equals_straight_run(tmp_path, make_crawl_engine):
    kw = dict(batch_size=30, actor_pools=False)

    # straight 4-iteration run
    e1 = make_crawl_engine(str(tmp_path / "straight"), **kw)
    e1.load_catalog(small_seed())
    e1.run(4)

    # 2 iterations, "crash", new engine resumes from checkpoint, 2 more
    wd = str(tmp_path / "resumed")
    e2a = make_crawl_engine(wd, **kw)
    e2a.load_catalog(small_seed())
    e2a.run(2)
    e2a.shutdown()
    e2b = make_crawl_engine(wd, **kw)  # restores iteration + actor state
    assert e2b.iteration == 2
    e2b.run(2)

    assert checks_fingerprint(e1) == checks_fingerprint(e2b)
    # catalog frontier state identical too
    c1 = e1.catalog.read_arrow().sort_by("resource_id")
    c2 = e2b.catalog.read_arrow().sort_by("resource_id")
    assert c1.equals(c2)


@pytest.mark.usefixtures("ray_session")
def test_resume_crash_window_falls_back_to_older_state(tmp_path, make_crawl_engine):
    """Catalog manifest at iteration N but the exact iterN checkpoint
    missing (the commit/save crash window): resume must restore the
    newest committed state <= N, never silently start with empty
    politeness / URL-seen state. An *uncommitted* save dir (shard files
    present, meta.json missing) must be skipped the same way."""
    import glob
    import os
    import shutil

    wd = str(tmp_path / "cw")
    e = make_crawl_engine(wd, batch_size=30, actor_pools=False)
    e.load_catalog(small_seed())
    e.run(2)
    e.shutdown()
    # simulate the crash window: newest checkpoint uncommitted (marker
    # missing — a crash mid-save), manifest already ahead
    newest = e._state_dir(e.iteration)
    os.remove(os.path.join(newest, "meta.json"))
    e2 = make_crawl_engine(wd, batch_size=30, actor_pools=False)
    assert e2.iteration == 2
    # URL-seen state restored from iter1 (non-empty): reloading the same
    # catalog must not treat already-seen URLs as new
    tbl = e2.catalog.read_arrow()
    keys = tbl["url_key"].to_numpy(zero_copy_only=False).astype("int64")
    assert not any(e2.urlseen.add_if_new(keys[:20]))
    e2.shutdown()

    # no committed state at all for a nonzero iteration → loud failure
    for p in glob.glob(os.path.join(wd, "state", "iter*")):
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    with pytest.raises(RuntimeError, match="refusing"):
        make_crawl_engine(wd, batch_size=30, actor_pools=False)


@pytest.mark.usefixtures("ray_session")
def test_sink_part_names_deterministic(tmp_path, make_crawl_engine):
    """Part files are named from block content (min check id), so a
    re-executed sink task overwrites instead of duplicating: two
    identical runs produce identical part-file name sets."""
    import os

    names = []
    for sub in ("s1", "s2"):
        e = make_crawl_engine(str(tmp_path / sub), batch_size=40, actor_pools=False)
        e.load_catalog(small_seed())
        e.run(2)
        files = sorted(os.path.basename(f) for f in e.checks.files())
        names.append(files)
        e.shutdown()
        assert all(n.startswith("part-") and len(n) == len("part-") + 16 + len(".parquet") for n in files)
    assert names[0] == names[1]


@pytest.mark.usefixtures("ray_session")
def test_results_identical_across_parallelism(tmp_path, make_crawl_engine):
    """Same seed catalog, different fetch parallelism → byte-identical
    checks (the scaling-criterion determinism prerequisite)."""
    a = make_crawl_engine(str(tmp_path / "p1"), batch_size=40, fetch_concurrency=1, actor_pools=False)
    a.load_catalog(small_seed())
    a.run(2)
    b = make_crawl_engine(str(tmp_path / "p4"), batch_size=40, fetch_concurrency=4, actor_pools=True)
    b.load_catalog(small_seed())
    b.run(2)
    assert checks_fingerprint(a) == checks_fingerprint(b)


@pytest.mark.usefixtures("ray_session")
def test_results_identical_with_domain_partitioning(tmp_path, make_crawl_engine):
    """Row-range slicing vs hash-partitioned + hot-salted blocks → same
    checks (partitioning is a physical layout choice, not semantics)."""
    a = make_crawl_engine(str(tmp_path / "rows"), batch_size=60, actor_pools=False)
    a.load_catalog(small_seed())
    a.run(2)
    b = make_crawl_engine(
        str(tmp_path / "parts"), batch_size=60, actor_pools=False, partition_by_domain=True
    )
    b.load_catalog(small_seed())
    b.run(2)
    assert checks_fingerprint(a) == checks_fingerprint(b)


@pytest.mark.usefixtures("ray_session")
def test_429_domain_across_blocks_deterministic(tmp_path, make_crawl_engine):
    """A domain with mixed 200/429 responses spanning many blocks: the
    politeness 429 cool-off must key off the MAX-check_id row (a pure
    function of url+iteration), never row position in the
    nondeterministically-ordered result table (VERDICT r2 #1).

    Two fresh runs and two parallelism levels must produce identical
    per-iteration stats (incl. backoff counts) and byte-identical
    checks."""
    from hydra_ray.functions.urls import url_md5

    hot = [f"https://hot-mixed.example/f{i:03d}.csv" for i in range(60)]
    responses = {}
    for i, u in enumerate(hot):
        if i % 2 == 0:
            responses[("head", u)] = {
                "kind": "error", "status": 429, "headers": {}, "error": "Too Many Requests",
            }
        else:
            responses[("head", u)] = {
                "kind": "ok",
                "status": 200,
                "headers": {
                    "content-type": "text/csv",
                    "content-length": "1234",
                    "last-modified": "Mon, 01 Jan 2024 00:00:00 GMT",
                },
            }
    seed = pa.table(
        {
            "dataset_id": [f"ds-{i}" for i in range(len(hot))],
            "resource_id": [url_md5(u) for u in hot],
            "url": hot,
            "format": ["csv"] * len(hot),
        }
    )

    def run(sub, conc, pools):
        e = make_crawl_engine(
            str(tmp_path / sub),
            transport={"kind": "mock", "responses": responses},
            batch_size=30,
            fetch_concurrency=conc,
            actor_pools=pools,
        )
        e.load_catalog(seed)
        stats = [e.run_iteration() for _ in range(2)]
        fp = checks_fingerprint(e)
        e.shutdown()
        return stats, fp

    s1, f1 = run("c1", 1, False)
    s1b, f1b = run("c1b", 1, False)  # fresh rerun, same parallelism
    s4, f4 = run("c4", 4, True)  # 4-way actor pool → different block order
    assert s1 == s1b == s4
    assert f1 == f1b == f4
    # the cool-off actually engaged: iteration 1 must defer the whole
    # domain iff iteration 0's max-check_id row was a 429 — either way
    # the count is pinned identical above; assert the scenario is live
    # (some backoff happened somewhere, so the race path was exercised)
    assert any(s["backoff"] > 0 for s in s1) or s1[1]["selected"] == 0


@pytest.mark.usefixtures("ray_session")
def test_docs_span_invariant_across_runs(tmp_path, make_crawl_engine):
    from hydra_ray.stages.spans import span_sequences_equal

    a = make_crawl_engine(str(tmp_path / "d1"), batch_size=60, actor_pools=False)
    a.load_catalog(small_seed())
    a.run(2)
    b = make_crawl_engine(str(tmp_path / "d2"), batch_size=60, fetch_concurrency=3, actor_pools=False)
    b.load_catalog(small_seed())
    b.run(2)
    da, db = a.read_documents(), b.read_documents()
    ok, bad = span_sequences_equal(da, db)
    assert ok, f"span mismatch for {bad[:5]}"
    assert da.num_rows > 0
    # merge-on-read resolution: one row per doc_id
    assert len(set(da["doc_id"].to_pylist())) == da.num_rows


@pytest.mark.usefixtures("ray_session")
def test_over_cache_frontier_dataset_path_identical(tmp_path, make_crawl_engine):
    """The >CACHE_MAX_ROWS frontier path (pipelines/crawl.py _frontier:
    distributed Dataset read + non-cached merge_insert checkpointing)
    produces byte-identical checks and catalog state to the driver-cached
    path — pins the 10^10-frontier branch at a scaled-down threshold."""
    kw = dict(batch_size=30, actor_pools=False)

    e1 = make_crawl_engine(str(tmp_path / "cached"), **kw)
    e1.load_catalog(small_seed())
    e1.run(2)

    e2 = make_crawl_engine(str(tmp_path / "dataset"), **kw)
    e2.CACHE_MAX_ROWS = 8  # force the distributed Dataset frontier
    e2.load_catalog(small_seed())
    assert e2._frontier_cache is None or e2.catalog.count() <= 8
    e2.run(2)
    assert not isinstance(e2._frontier(), pa.Table)  # really on the Dataset path

    assert checks_fingerprint(e1) == checks_fingerprint(e2)
    c1 = e1.catalog.read_arrow().sort_by("resource_id")
    c2 = e2.catalog.read_arrow().sort_by("resource_id")
    assert c1.equals(c2)
