"""Serving surface (EngineApi): reference routes/checks.py +
routes/status.py semantics over the versioned tables."""

import pytest

from hydra_ray.pipelines.api import EngineApi, Gone, NotFound

from .test_resume import small_seed


@pytest.fixture()
def api(tmp_path, make_crawl_engine, request):
    e = make_crawl_engine(str(tmp_path / "api"), batch_size=50, actor_pools=False)
    e.load_catalog(small_seed())
    e.run(2)
    return EngineApi(e)


@pytest.mark.usefixtures("ray_session")
class TestApi:
    def test_latest_check(self, api):
        checks = api.engine.checks.read_arrow()
        rid = checks["resource_id"][0].as_py()
        row = api.get_latest_check(resource_id=rid)
        assert row["resource_id"] == rid
        # latest = max check id for that resource
        sub = [r for r in checks.to_pylist() if r["resource_id"] == rid]
        assert row["id"] == max(r["id"] for r in sub)
        # by URL too
        assert api.get_latest_check(url=row["url"])["id"] == row["id"]
        with pytest.raises(NotFound):
            api.get_latest_check(resource_id="nope")
        with pytest.raises(ValueError):
            api.get_latest_check()

    def test_all_checks_sorted_desc(self, api):
        checks = api.engine.checks.read_arrow().to_pylist()
        from collections import Counter

        rid, n = Counter(r["resource_id"] for r in checks).most_common(1)[0]
        rows = api.get_all_checks(resource_id=rid)
        assert len(rows) == n
        ids = [r["id"] for r in rows]
        created = [r["created_at"] for r in rows]
        assert created == sorted(created, reverse=True) or ids == sorted(ids, reverse=True)

    def test_checks_aggregate_today(self, api):
        agg = api.get_checks_aggregate("today", "domain")
        total = sum(r["count"] for r in agg)
        assert total == api.engine.checks.count()
        assert agg == sorted(agg, key=lambda r: (-r["count"], str(r["value"])))
        with pytest.raises(ValueError):
            api.get_checks_aggregate("today", "no_such_column")

    def test_create_check(self, api):
        cat = api.engine.catalog.read_arrow()
        rid = cat["resource_id"][7].as_py()
        before = api.engine.checks.count()
        check = api.create_check(rid)
        assert check["resource_id"] == rid
        assert api.engine.checks.count() == before + 1
        assert api.get_latest_check(resource_id=rid)["id"] == check["check_id"]
        with pytest.raises(NotFound):
            api.create_check("missing-resource")

    def test_resource_and_status_counts(self, api):
        cat = api.engine.catalog.read_arrow()
        rid = cat["resource_id"][3].as_py()
        row = api.get_resource(rid)
        assert row["resource_id"] == rid and "url" in row
        counts = api.get_resources_status_counts()
        assert sum(counts.values()) == cat.num_rows
        # all crawlable states (None) or BACKOFF after a finished run
        assert set(counts) <= {None, "BACKOFF"}

    def test_crawler_status(self, api):
        st = api.get_crawler_status()
        cat = api.engine.catalog.read_arrow()
        assert st["count_checked"] + st["count_never_checked"] == cat.num_rows
        assert st["count_checked"] > 0
        assert st["count_in_progress"] == 0  # no stuck leases after run()

    def test_deleted_resource_gone(self, api):
        import pyarrow as pa
        import pyarrow.compute as pc

        eng = api.engine
        checks = eng.checks.read_arrow()
        rid = checks["resource_id"][0].as_py()
        cat = eng.catalog.read_arrow()
        deleted = pc.if_else(
            pc.equal(cat["resource_id"], rid), pa.scalar(True), cat["deleted"]
        )
        cat = cat.set_column(cat.column_names.index("deleted"), "deleted", deleted)
        eng.catalog.overwrite(cat, meta={"iteration": eng.iteration})
        eng._frontier_cache = cat
        with pytest.raises(Gone):
            api.get_latest_check(resource_id=rid)

    def test_health(self, api):
        h = api.health()
        assert h["status"] == "ok" and h["iteration"] == 2
        assert h["catalog_rows"] > 0 and h["checks_rows"] > 0
