"""Frontier selection semantics (reference crawl/select_batch.py +
db/resource.py excluded clause; tests/test_crawl/test_crawl.py:167-230,
698-728, 810-853)."""

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from hydra_ray.config import config_override
from hydra_ray.pipelines.crawl import _add_frontier_columns
from hydra_ray.functions.urls import canonicalize_batch
from hydra_ray.stages.frontier import select_batch

NOW = datetime(2026, 1, 10, 12, 0, 0)
NOW64 = np.datetime64(NOW, "us")


def make_frontier(rows: list[dict]) -> rd.Dataset:
    base = {
        "dataset_id": "ds-1",
        "url": "https://a.example/x.csv",
        "format": "csv",
        "deleted": False,
        "priority": False,
        "status": None,
    }
    full = []
    for i, r in enumerate(rows):
        row = {**base, "resource_id": f"r{i}", **r}
        full.append(row)
    cols = {k: [r.get(k) for r in full] for k in full[0].keys()}
    tbl = pa.table(cols)
    tbl = canonicalize_batch(tbl)
    tbl = _add_frontier_columns(tbl)
    # allow per-row overrides of last-check columns
    for col in ("last_check_id", "next_check_at"):
        if any(col in r for r in rows):
            vals = [r.get(col) for r in rows]
            typ = pa.int64() if col == "last_check_id" else pa.timestamp("us")
            tbl = tbl.drop_columns([col]).append_column(col, pa.array(vals, type=typ))
    return rd.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
class TestFrontier:
    def test_priority_tier_first(self):
        ds = make_frontier(
            [
                {"url": "https://a.example/1.csv"},
                {"url": "https://a.example/2.csv", "priority": True},
                {"url": "https://a.example/3.csv"},
            ]
        )
        got = select_batch(ds, iteration=0, now=NOW64, batch_size=2)
        assert got.num_rows == 2
        assert got["tier"].to_pylist()[0] == 1
        assert got["resource_id"].to_pylist()[0] == "r1"

    def test_excluded_patterns(self):
        ds = make_frontier(
            [
                {"url": "http://geo.data.gouv.fr/thing.csv"},
                {"url": "https://a.example/ok.csv?format=shp&x=1"},
                {"url": "https://a.example/fine.csv"},
            ]
        )
        got = select_batch(ds, iteration=0, now=NOW64, batch_size=10)
        assert got["resource_id"].to_pylist() == ["r2"]

    def test_deleted_and_status_excluded(self):
        ds = make_frontier(
            [
                {"url": "https://a.example/1.csv", "deleted": True},
                {"url": "https://a.example/2.csv", "status": "CRAWLING_URL"},
                {"url": "https://a.example/3.csv", "status": "BACKOFF"},
                {"url": "https://a.example/4.csv"},
            ]
        )
        got = select_batch(ds, iteration=0, now=NOW64, batch_size=10)
        assert sorted(got["resource_id"].to_pylist()) == ["r2", "r3"]

    def test_next_check_gating(self):
        ds = make_frontier(
            [
                # never checked → tier 2, always eligible
                {"url": "https://a.example/1.csv"},
                # checked, due
                {"url": "https://a.example/2.csv", "last_check_id": 1,
                 "next_check_at": NOW - timedelta(hours=1)},
                # checked, not due
                {"url": "https://a.example/3.csv", "last_check_id": 2,
                 "next_check_at": NOW + timedelta(hours=1)},
                # checked, next_check NULL → due
                {"url": "https://a.example/4.csv", "last_check_id": 3},
            ]
        )
        got = select_batch(ds, iteration=0, now=NOW64, batch_size=10)
        ids = got["resource_id"].to_pylist()
        assert "r2" not in ids
        assert set(ids) == {"r0", "r1", "r3"}
        # tier 2 (never checked) before tier 3 (outdated)
        tiers = got["tier"].to_pylist()
        assert tiers == sorted(tiers)

    def test_seeded_ordering_is_deterministic(self):
        rows = [{"url": f"https://a.example/{i}.csv"} for i in range(50)]
        ds = make_frontier(rows)
        a = select_batch(ds, iteration=3, now=NOW64, batch_size=10)["resource_id"].to_pylist()
        b = select_batch(ds, iteration=3, now=NOW64, batch_size=10)["resource_id"].to_pylist()
        assert a == b
        c = select_batch(ds, iteration=4, now=NOW64, batch_size=10)["resource_id"].to_pylist()
        assert a != c  # different iteration reshuffles

    def test_ordering_independent_of_partitioning(self):
        rows = [{"url": f"https://a.example/{i}.csv"} for i in range(100)]
        ds1 = make_frontier(rows)
        ds4 = make_frontier(rows).repartition(7)
        a = select_batch(ds1, iteration=1, now=NOW64, batch_size=20)["resource_id"].to_pylist()
        b = select_batch(ds4, iteration=1, now=NOW64, batch_size=20)["resource_id"].to_pylist()
        assert a == b

    def test_batch_size_cap(self):
        rows = [{"url": f"https://a.example/{i}.csv"} for i in range(100)]
        with config_override(BATCH_SIZE=7):
            got = select_batch(make_frontier(rows), iteration=0, now=NOW64)
        assert got.num_rows == 7
