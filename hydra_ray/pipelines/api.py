"""Serving surface: the reference's HTTP API as engine-level calls.

Mirrors udata_hydra's aiohttp routes (routes/__init__.py:52-79) as
plain functions over the versioned tables — the sandbox mapping of the
serving layer (no web framework is needed to express the semantics;
a deployment wraps these in any HTTP server):

  GET  /api/checks/latest     → get_latest_check(url|resource_id)
       (routes/checks.py:16-25; Check.get_latest)
  GET  /api/checks/all        → get_all_checks(url|resource_id)
  GET  /api/checks/aggregate  → get_checks_aggregate(created_at, group_by)
       (routes/checks.py:37-57)
  POST /api/checks            → create_check(resource_id)
       (routes/checks.py:60-96 — delegates to CrawlEngine.check_resource_now)
  GET  /api/resources/{id}    → get_resource(resource_id)
  GET  /api/status/crawler    → get_crawler_status()
       (routes/status.py:29-77: never-checked / checked / outdated /
        in-progress over non-excluded rows)
  GET  /api/status (counts)   → get_resources_status_counts()
  GET  /api/health            → health()

Small-result queries run as vectorized Arrow kernels over the latest
table versions; at 10^10-catalog scale the same calls read through
``VersionedTable.read(columns=...)`` (lazy Dataset) with predicate
filters — the layout (hash-partitioned parts) keeps point lookups to
one partition.
"""

from __future__ import annotations

from datetime import date, datetime

import pyarrow as pa
import pyarrow.compute as pc

from hydra_ray.config import config


class NotFound(KeyError):
    """404 equivalent."""


class Gone(KeyError):
    """410 equivalent (deleted resource)."""


class EngineApi:
    def __init__(self, engine):
        self.engine = engine

    # -- checks ------------------------------------------------------------
    def _checks_filtered(self, url: str | None, resource_id: str | None) -> pa.Table:
        if url is None and resource_id is None:
            raise ValueError("provide url or resource_id")
        t = self.engine.checks.read_arrow()
        mask = (
            pc.equal(t["resource_id"], resource_id)
            if resource_id is not None
            else pc.equal(t["url"], url)
        )
        return t.filter(mask)

    def get_latest_check(self, url: str | None = None, resource_id: str | None = None) -> dict:
        t = self._checks_filtered(url, resource_id)
        if t.num_rows == 0:
            raise NotFound(url or resource_id)
        idx = pc.index(t["id"], pc.max(t["id"]).as_py()).as_py()
        row = {c: t[c][idx].as_py() for c in t.column_names}
        cat = self.engine.catalog.read_arrow(columns=["resource_id", "deleted"])
        dmask = pc.and_(
            pc.equal(cat["resource_id"], row["resource_id"]), pc.equal(cat["deleted"], True)
        )
        if pc.any(dmask).as_py():
            raise Gone(row["resource_id"])
        return row

    def get_all_checks(self, url: str | None = None, resource_id: str | None = None) -> list[dict]:
        t = self._checks_filtered(url, resource_id)
        if t.num_rows == 0:
            raise NotFound(url or resource_id)
        t = t.sort_by([("created_at", "descending"), ("id", "descending")])
        return t.to_pylist()

    def get_checks_aggregate(self, created_at: "str | date", group_by: str) -> list[dict]:
        """Counts per ``group_by`` value for checks created on a date
        ('today' = the engine's virtual today)."""
        if created_at == "today":
            created_at = self.engine.now_dt().date()
        elif isinstance(created_at, str):
            created_at = date.fromisoformat(created_at)
        t = self.engine.checks.read_arrow()
        if group_by not in t.column_names:
            raise ValueError(f"unknown group_by column {group_by!r}")
        days = pc.cast(t["created_at"], pa.date32())
        t = t.filter(pc.equal(days, pa.scalar(created_at, type=pa.date32())))
        if t.num_rows == 0:
            raise NotFound(str(created_at))
        g = t.group_by(group_by).aggregate([([], "count_all")])  # rows, not non-nulls
        g = g.rename_columns(["value", "count"])
        out = g.to_pylist()
        out.sort(key=lambda r: (-r["count"], str(r["value"])))
        return out

    def create_check(self, resource_id: str) -> dict:
        """POST /api/checks: immediate synchronous check + commit."""
        try:
            return self.engine.check_resource_now(resource_id)
        except KeyError as err:
            raise NotFound(resource_id) from err

    # -- resources ---------------------------------------------------------
    def get_resource(self, resource_id: str) -> dict:
        cat = self.engine.catalog.read_arrow()
        t = cat.filter(pc.equal(cat["resource_id"], resource_id))
        if t.num_rows == 0:
            raise NotFound(resource_id)
        return {c: t[c][0].as_py() for c in t.column_names}

    def get_resources_status_counts(self) -> dict:
        cat = self.engine.catalog.read_arrow(columns=["status"])
        status = pc.fill_null(cat["status"], "NULL")
        g = pa.table({"status": status}).group_by("status").aggregate([("status", "count")])
        out = {None: 0}
        for row in g.to_pylist():
            key = None if row["status"] == "NULL" else row["status"]
            out[key] = row["status_count"]
        return out

    def get_crawler_status(self) -> dict:
        """never-checked / checked / outdated / in-progress over
        non-excluded, non-deleted rows (routes/status.py:29-77)."""
        cat = self.engine.catalog.read_arrow(
            columns=["url", "deleted", "status", "last_check_id", "next_check_at"]
        )
        keep = pc.equal(cat["deleted"], False)
        for pattern in config.EXCLUDED_PATTERNS or []:
            keep = pc.and_(keep, pc.invert(pc.match_like(cat["url"], pattern)))
        t = cat.filter(keep)
        has_check = pc.is_valid(t["last_check_id"])
        now64 = pa.scalar(self.engine.now_dt(), type=pa.timestamp("us"))
        outdated = pc.fill_null(pc.less_equal(t["next_check_at"], now64), False)
        in_progress = pc.and_(
            pc.is_valid(t["status"]), pc.not_equal(pc.fill_null(t["status"], ""), "BACKOFF")
        )

        def n(mask):
            return int(pc.sum(pc.cast(mask, pa.int32())).as_py() or 0)

        return {
            "count_never_checked": n(pc.invert(has_check)),
            "count_checked": n(has_check),
            "count_outdated": n(outdated),
            "count_in_progress": n(in_progress),
        }

    # -- health ------------------------------------------------------------
    def health(self) -> dict:
        return {
            "status": "ok",
            "iteration": self.engine.iteration,
            "catalog_rows": self.engine.catalog.count() if not self.engine.catalog.is_empty() else 0,
            "checks_rows": self.engine.checks.count() if not self.engine.checks.is_empty() else 0,
            "virtual_now": self.engine.now_dt().isoformat(),
        }
