"""Deterministic synthetic inputs (seed catalog + synthetic web).

Everything derives from md5 of stable identifiers — no RNG state, no
wall clock — so any scale factor reproduces bit-identically across
processes and parallelism levels (required for the two-parallelism
scaling benchmark and the seeded crawl-ordering contract).

``catalog_from_documents`` derives a data.gouv.fr-style seed catalog
from the driver's ``documents.parquet`` table; the same derivation is
expressible in DuckDB SQL (see pipelines/queries.py) so the driver's
oracle can verify it. ``synthetic_response`` is the deterministic
"web" used by the fetcher's SyntheticTransport.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FORMATS = ["csv", "json", "geojson", "parquet", "xlsx", "pdf"]
N_DOMAINS = 20

# Deterministic hot-domain skew: doc_id % 100 < 55 → domain 0
# ("static.data.example") holds ~55% of all URLs, mirroring
# static.data.gouv.fr's dominance in the reference's real catalog.
HOT_DOMAIN_PCT = 55


def _domain_for(doc_id: int) -> str:
    if doc_id % 100 < HOT_DOMAIN_PCT:
        return "static.data.example"
    return f"host{doc_id % N_DOMAINS:02d}.data.example"


def _format_for(doc_id: int) -> str:
    return FORMATS[doc_id % len(FORMATS)]


def catalog_from_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, source:string, ...) → catalog seed rows.

    url      = 'https://' || domain || '/res/' || doc_id || '.' || format
    dataset  = 'ds-' || doc_id % 50
    resource = md5(url) truncated to 32 (uuid-ish, unique per url)
    priority = doc_id % 97 == 0 (sparse priority tier)
    """
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    domains = [_domain_for(int(d)) for d in doc_ids]
    formats = [_format_for(int(d)) for d in doc_ids]
    urls = [
        f"https://{dom}/res/{int(d)}.{fmt}" for d, dom, fmt in zip(doc_ids, domains, formats)
    ]
    resource_ids = [hashlib.md5(u.encode()).hexdigest() for u in urls]
    dataset_ids = [f"ds-{int(d) % 50}" for d in doc_ids]
    titles = [f"resource {int(d)}" for d in doc_ids]
    priority = (doc_ids % 97 == 0)
    return pa.table(
        {
            "dataset_id": pa.array(dataset_ids),
            "resource_id": pa.array(resource_ids),
            "url": pa.array(urls),
            "type": pa.array(["main"] * len(doc_ids)),
            "format": pa.array(formats),
            "title": pa.array(titles),
            "deleted": pa.array(np.zeros(len(doc_ids), dtype=bool)),
            "priority": pa.array(priority),
        }
    )


# ---------------------------------------------------------------------------
# Synthetic web: deterministic HTTP-ish responses per URL.
# ---------------------------------------------------------------------------

_CT_BY_FORMAT = {
    "csv": "text/csv",
    "json": "application/json",
    "geojson": "application/vnd.geo+json",
    "parquet": "application/vnd.apache.parquet",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pdf": "application/pdf",
    # OGC services answer GetCapabilities with XML, not octet-stream —
    # octet-stream would (mis)route them into the reference's Csvgz
    # detector (same precedence as data_formats/detect.py)
    "wfs": "application/xml",
    "wms": "application/xml",
}


def synthetic_response(url: str, method: str = "head", epoch: int = 0) -> dict:
    """Deterministic response for a URL.

    Outcome classes keyed on md5(url) bytes (stable across epochs):
      h0 % 100 < 84  → 200 OK with headers
      84..88         → 404
      89..91         → 500
      92..93         → timeout
      94..95         → 429 (rate limited)
      96..97         → connection error
      98..99         → HEAD lacks content-length/last-modified (forces GET retry)
    ``epoch`` shifts content-length/last-modified for a deterministic
    ~10% of resources per epoch, driving the change-detection paths.
    """
    digest = hashlib.md5(url.encode("utf-8", "surrogateescape")).digest()
    h0 = digest[0] * 256 + digest[1]
    cls = h0 % 100
    fmt = url.rsplit(".", 1)[-1] if "." in url.rsplit("/", 1)[-1] else "bin"
    if fmt == "bin":
        # extension-less OGC endpoints (…/geoserver/wfs?service=wfs)
        low = url.lower()
        path = low.split("?", 1)[0].rstrip("/")
        for ogc in ("wfs", "wms"):
            if path.endswith(f"/{ogc}") or f"service={ogc}" in low:
                fmt = ogc
                break
    content_type = _CT_BY_FORMAT.get(fmt, "application/octet-stream")
    base_len = 1000 + (h0 % 100000)
    changes_this_epoch = (digest[2] % 10) == (epoch % 10)  # ~10% change per epoch
    eff_epoch = epoch if changes_this_epoch else (digest[2] % max(epoch, 1) if epoch else 0)
    content_length = base_len + 17 * eff_epoch
    last_modified = f"Mon, 0{1 + eff_epoch % 9} Jan 2024 0{digest[3] % 10}:00:00 GMT"

    if cls < 84:
        headers = {
            "content-type": content_type,
            "content-length": str(content_length),
            "last-modified": last_modified,
        }
        if digest[4] % 20 == 0:  # 5% of hosts advertise rate-limit headers
            headers["x-ratelimit-limit"] = "100"
            headers["x-ratelimit-remaining"] = str(max(0, 100 - (digest[5] % 110)))
        return {"kind": "ok", "status": 200, "headers": headers}
    if cls < 89:
        return {"kind": "error", "status": 404, "headers": {}, "error": "Not Found"}
    if cls < 92:
        return {"kind": "error", "status": 500, "headers": {}, "error": "Internal Server Error"}
    if cls < 94:
        return {"kind": "timeout"}
    if cls < 96:
        return {"kind": "error", "status": 429, "headers": {}, "error": "Too Many Requests"}
    if cls < 98:
        return {"kind": "conn_error", "error": "Cannot connect to host"}
    # bad HEAD: 200 but useless headers → caller retries with GET
    if method == "head":
        return {"kind": "ok", "status": 200, "headers": {"content-type": "text/html"}}
    return {
        "kind": "ok",
        "status": 200,
        "headers": {
            "content-type": content_type,
            "content-length": str(content_length),
            "last-modified": last_modified,
        },
    }


def synthetic_body(url: str, epoch: int = 0, max_bytes: int = 1 << 16) -> bytes:
    """Deterministic pseudo-content for checksum/mime analysis."""
    seed = hashlib.md5(f"{url}#{epoch}".encode()).digest()
    reps = max(1, min(max_bytes, 4096) // 16)
    return (seed * reps)[:max_bytes]


def synthetic_robots(domain: str) -> str:
    """Deterministic robots.txt per domain: ~25% of hosts disallow one
    /res/<digit> prefix; the rest allow everything."""
    digest = hashlib.md5(f"robots:{domain}".encode()).digest()
    if digest[0] % 4 == 0:
        return f"User-agent: *\nDisallow: /res/{digest[1] % 10}\n"
    return "User-agent: *\nDisallow:\n"


def synthetic_text(url: str, epoch: int = 0, max_rows: int = 40) -> str:
    """Deterministic pseudo-CSV text content for a resource (the stand-in
    for a downloaded tabular file in the sandbox).

    Two opt-in URL routes extend the world WITHOUT touching the bytes of
    any existing ``/res/`` URL (the crawl_checks oracle depends on those):
      - ``/geo/``    → a lat/lon table (drives the GeoJSON/PMTiles export
                       lifecycle, reference analysis/exports.py)
      - ``/ragged/`` → body row 2 carries an extra cell (drives the
                       parsing_error "step:cause" contract, reference
                       utils/errors.py:113-135); the bad row's position
                       and width are FIXED so the error string is a
                       closed-form function of the URL
    """
    digest = hashlib.md5(f"{url}#{epoch}".encode()).digest()
    nrows = 5 + (digest[0] * 256 + digest[1]) % max_rows
    acc = int.from_bytes(digest[:8], "big")
    if "/geo/" in url:
        lines = ["id,name,latitude,longitude"]
        for i in range(nrows):
            acc = (acc * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            lat = (acc % 12000) / 100.0 - 60.0
            lon = ((acc >> 16) % 30000) / 100.0 - 150.0
            lines.append(f"{i},item-{acc % 9973},{lat:.2f},{lon:.2f}")
        return "\n".join(lines)
    lines = ["id,name,value"]
    for i in range(nrows):
        acc = (acc * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        lines.append(f"{i},item-{acc % 9973},{(acc >> 32) % 100000}")
    if "/ragged/" in url and len(lines) > 2:
        lines[2] = lines[2] + ",surprise"
    return "\n".join(lines)


def synthetic_cors(url: str) -> dict | None:
    """Deterministic CORS preflight result (~60% of OK hosts permissive)."""
    digest = hashlib.md5(f"cors:{url}".encode()).digest()
    if digest[0] % 10 < 6:
        return {
            "status": 200,
            "error": None,
            "allow-origin": "*",
            "allow-methods": "GET, HEAD",
            "allow-headers": "authorization,content-type",
            "expose-headers": None,
            "max-age": "3600",
            "allow-credentials": None,
        }
    return None
