"""OGC (WFS/WMS) service analysis — capability probing stage (S14).

Reference: udata_hydra/data_formats/ogc/__init__.py:80-268 — fetch
GetCapabilities (with version fallback), extract service metadata
(layers, CRS, output formats), and detect the layer a resource points
at (typeName/typeNames query param, else the resource title validated
by a layer-name regex, :250-268).

The owslib client is not available in this container, so the transport
returns a deterministic synthetic capabilities document; the metadata
extraction, layer detection and config gating are real and tested.
Config-gated by OGC_ANALYSIS_ENABLED + OGC_FORMATS like the reference.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qs, urlparse

from hydra_ray.config import config

# layer names look like ns:layer_name (reference ogc/__init__.py:21)
LAYER_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*(:[A-Za-z_][A-Za-z0-9_.-]*)?$")

_VERSIONS = {"wfs": ["2.0.0", "1.1.0", "1.0.0"], "wms": ["1.3.0", "1.1.1"]}


def detect_layer_name(url: str, title: str | None) -> str | None:
    """typeName/typeNames query param wins; else a regex-valid title."""
    q = parse_qs(urlparse(url).query.lower())
    for param in ("typename", "typenames"):
        if param in q and q[param]:
            return q[param][0]
    if title and LAYER_NAME_RE.match(title):
        return title
    return None


def synthetic_capabilities(service_url: str, fmt: str) -> dict:
    """Deterministic stand-in for a GetCapabilities response."""
    digest = hashlib.md5(f"{fmt}:{service_url}".encode()).digest()
    n_layers = 1 + digest[0] % 5
    layers = [f"ns:layer_{digest[1] % 97}_{i}" for i in range(n_layers)]
    version = _VERSIONS[fmt][digest[2] % len(_VERSIONS[fmt])]
    return {
        "service_type": fmt,
        "version": version,
        "layers": layers,
        "crs": ["EPSG:4326", "EPSG:3857"][: 1 + digest[3] % 2],
        "output_formats": ["application/json", "GML2"][: 1 + digest[4] % 2],
    }


def analyse_ogc(check: dict, transport=None, title: str | None = None) -> dict | None:
    """OGC analysis for one check row; None when disabled or not OGC.

    ``transport`` may supply a ``capabilities(url, fmt)`` method (real
    deployments plug owslib here); defaults to the synthetic document.
    """
    if not config.OGC_ANALYSIS_ENABLED:
        return None
    from hydra_ray.functions.detect import detect_format

    url = check.get("url", "")
    fmt = detect_format(None, url, check.get("format"))
    if fmt not in config.OGC_FORMATS:
        return None
    if transport is not None and hasattr(transport, "capabilities"):
        caps = transport.capabilities(url, fmt)
    else:
        caps = synthetic_capabilities(url, fmt)
    detected = detect_layer_name(url, title)
    if detected not in (caps.get("layers") or []):
        detected = detected  # kept even if unlisted (reference warns only)
    return {**caps, "detected_layer": detected}
