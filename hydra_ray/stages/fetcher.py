"""Fetch stage: HEAD/GET checks as an actor-pool ``map_batches`` stage.

Reproduces the reference's per-URL check flow
(udata_hydra/crawl/check_resources.py:58-234):
  - empty netloc → error check "Not netloc in url"
  - HEAD with timeout; if ``has_nice_head`` fails → retry as GET
  - raise_for_status → error check carrying status/headers
  - on success: OPTIONS CORS preflight (stored only for 2xx/3xx probes,
    check_resources.py:121-139), then the check row fields
  - timeout → check {timeout: true}; client errors → check {error,...}

The HTTP client is pluggable ("Transport"): ``SyntheticTransport`` is
the deterministic sandbox web (hydra_ray/synth.py) — in production the
same actor would hold an aiohttp session exactly like the reference's
T1 (one session per worker, created once in ``__init__``).
``MockTransport`` powers the parity tests (the aioresponses role).

Used as ``ds.map_batches(Fetcher, fn_constructor_kwargs=...,
concurrency=N, batch_size=B)`` — a stateful actor pool; per-batch work
is a python loop over URLs because each URL is an independent
request/response conversation (I/O-bound in production, never a
vectorizable kernel).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa

from hydra_ray import synth
from hydra_ray.functions.headers import convert_headers, fix_surrogates, has_nice_head

OUTCOME_OK = "ok"
OUTCOME_TIMEOUT = "timeout"
OUTCOME_ERROR = "error"
OUTCOME_BACKOFF = "backoff"


class SyntheticTransport:
    """Deterministic in-process web (see synth.synthetic_response)."""

    def __init__(self, epoch: int = 0):
        self.epoch = epoch

    def request(self, url: str, method: str) -> dict:
        return synth.synthetic_response(url, method=method, epoch=self.epoch)

    def cors(self, url: str) -> dict | None:
        return synth.synthetic_cors(url)

    def body(self, url: str, max_bytes: int) -> bytes:
        return synth.synthetic_body(url, epoch=self.epoch, max_bytes=max_bytes)


class MockTransport:
    """Scripted responses for tests (the aioresponses equivalent).

    ``responses`` maps (method, url) → response dict or list of dicts
    consumed in order (last one repeats). Unknown URLs → 404.
    """

    def __init__(self, responses: dict[tuple[str, str], Any] | None = None, bodies: dict | None = None):
        self.responses = {k: (list(v) if isinstance(v, list) else [v]) for k, v in (responses or {}).items()}
        self.bodies = bodies or {}

    def request(self, url: str, method: str) -> dict:
        key = (method, url)
        if key not in self.responses:
            return {"kind": "error", "status": 404, "headers": {}, "error": "Not Found"}
        seq = self.responses[key]
        return seq.pop(0) if len(seq) > 1 else seq[0]

    def cors(self, url: str) -> dict | None:
        resp = self.responses.get(("options", url))
        if resp:
            return resp.pop(0) if len(resp) > 1 else resp[0]
        return None

    def body(self, url: str, max_bytes: int) -> bytes:
        return self.bodies.get(url, b"")[:max_bytes]


def make_transport(spec: dict) -> Any:
    kind = spec.get("kind", "synthetic")
    if kind == "synthetic":
        return SyntheticTransport(epoch=spec.get("epoch", 0))
    if kind == "mock":
        return MockTransport(responses=spec.get("responses"), bodies=spec.get("bodies"))
    raise ValueError(f"unknown transport kind {kind}")


def fetch_one(url: str, domain: str, transport: Any) -> dict:
    """One URL's check fields (pure given a transport). Returns dict with
    outcome, status, headers(dict), cors_headers(dict|None), timeout,
    error, method."""
    if not domain:
        return {
            "outcome": OUTCOME_ERROR,
            "status": None,
            "headers": {},
            "cors_headers": None,
            "timeout": False,
            "error": "Not netloc in url",
            "method": None,
        }

    method = "head"
    resp = transport.request(url, method)
    if resp.get("kind") == "ok" and not has_nice_head(resp.get("status"), resp.get("headers", {})):
        method = "get"
        resp = transport.request(url, method)

    kind = resp.get("kind")
    if kind == "timeout":
        return {
            "outcome": OUTCOME_TIMEOUT,
            "status": None,
            "headers": None,
            "cors_headers": None,
            "timeout": True,
            "error": None,
            "method": method,
        }
    if kind == "conn_error":
        return {
            "outcome": OUTCOME_ERROR,
            "status": None,
            "headers": {},
            "cors_headers": None,
            "timeout": False,
            "error": fix_surrogates(resp.get("error") or "connection error"),
            "method": method,
        }
    status = resp.get("status")
    headers = convert_headers(resp.get("headers") or {})
    if kind == "error" or not (200 <= int(status) < 400):
        # raise_for_status path: error check carrying status + headers
        return {
            "outcome": OUTCOME_ERROR,
            "status": int(status) if status is not None else None,
            "headers": headers,
            "cors_headers": None,
            "timeout": False,
            "error": fix_surrogates(resp.get("error") or f"HTTP {status}"),
            "method": method,
        }

    # success → CORS preflight; keep only successful (2xx/3xx, no error) probes
    cors_probe = transport.cors(url)
    cors_headers = None
    if cors_probe and not cors_probe.get("error"):
        cstatus = cors_probe.get("status")
        try:
            if cstatus is not None and 200 <= int(cstatus) < 400:
                cors_headers = dict(cors_probe)
                cors_headers["status"] = int(cstatus)
        except (TypeError, ValueError):
            pass

    return {
        "outcome": OUTCOME_OK,
        "status": int(status),
        "headers": headers,
        "cors_headers": cors_headers,
        "timeout": False,
        "error": None,
        "method": method,
    }


class Fetcher:
    """Actor-pool stage body. One transport per actor (created once)."""

    def __init__(self, transport: dict | None = None):
        self.transport = make_transport(transport or {"kind": "synthetic"})

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        domains = batch["domain"].to_pylist()
        keys = batch["url_key"].to_numpy(zero_copy_only=False)

        outcome, status, headers_js, cors_js, timeout, error = [], [], [], [], [], []
        for url, domain in zip(urls, domains):
            r = fetch_one(url, domain, self.transport)
            outcome.append(r["outcome"])
            status.append(r["status"])
            headers_js.append(json.dumps(r["headers"], sort_keys=True) if r["headers"] is not None else None)
            cors_js.append(
                json.dumps(r["cors_headers"], sort_keys=True) if r["cors_headers"] is not None else None
            )
            timeout.append(r["timeout"])
            error.append(r["error"])

        # deterministic pseudo response time (reference records wall time)
        response_time = ((keys.astype(np.uint64) % np.uint64(1000)).astype(np.float64)) / 5000.0

        out = batch
        for name, arr in (
            ("outcome", pa.array(outcome, type=pa.string())),
            ("check_status", pa.array(status, type=pa.int32())),
            ("check_headers", pa.array(headers_js, type=pa.string())),
            ("check_cors_headers", pa.array(cors_js, type=pa.string())),
            ("check_timeout", pa.array(timeout, type=pa.bool_())),
            ("check_error", pa.array(error, type=pa.string())),
            ("response_time", pa.array(response_time)),
        ):
            out = out.append_column(name, arr)
        return out
