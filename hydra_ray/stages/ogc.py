"""OGC (WFS/WMS) service analysis — capability probing stage (S14).

Reference: udata_hydra/data_formats/ogc/__init__.py:80-268 — fetch
GetCapabilities (with version fallback), extract service metadata
(layers, CRS, output formats), and detect the layer a resource points
at (typeName/typeNames query param, else the resource title validated
by a layer-name regex, :250-268).

owslib is not in this container, but GetCapabilities is plain XML:
``parse_capabilities_xml`` extracts the same metadata owslib would
(WFS 2.0/1.1/1.0 FeatureTypeList + outputFormat parameters; WMS
1.3/1.1 nested Layer tree + GetMap formats) with the stdlib parser.
No HTTP in the sandbox, so the transport supplies the DOCUMENT — the
default is a deterministic synthetic XML byte stream that the real
parser then parses (same pattern as the xls/pmtiles codecs).
Config-gated by OGC_ANALYSIS_ENABLED + OGC_FORMATS like the reference.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qs, urlparse
from xml.etree import ElementTree as ET

from hydra_ray.config import config

# layer names look like ns:layer_name (reference ogc/__init__.py:21)
LAYER_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*(:[A-Za-z_][A-Za-z0-9_.-]*)?$")

_VERSIONS = {"wfs": ["2.0.0", "1.1.0", "1.0.0"], "wms": ["1.3.0", "1.1.1"]}


def detect_layer_name(url: str, title: str | None) -> str | None:
    """typeName/typeNames query param wins; else a regex-valid title.

    Reference ogc/__init__.py:256-267: the param KEY lookup is
    case-insensitive but the VALUE keeps its case (layer names are
    case-sensitive), and a value that fails the layer-name regex falls
    through to the title instead of being returned."""
    q = parse_qs(urlparse(url).query)
    for key, values in q.items():
        if key.lower() in ("typename", "typenames") and values and LAYER_NAME_RE.match(values[0]):
            return values[0]
    if title and LAYER_NAME_RE.match(title):
        return title
    return None


def synthetic_capabilities(service_url: str, fmt: str) -> dict:
    """Deterministic stand-in for a GetCapabilities response.

    When the probed URL carries a typeName, the synthetic server
    SERVES that layer for half the URL space (md5-parity gate) — real
    services usually do list the layer a resource links to, and the
    split keeps both detected-layer branches (exact match kept /
    unlisted candidate discarded) live in the oracled queries."""
    digest = hashlib.md5(f"{fmt}:{service_url}".encode()).digest()
    n_layers = 1 + digest[0] % 5
    layers = [f"ns:layer_{digest[1] % 97}_{i}" for i in range(n_layers)]
    requested = detect_layer_name(service_url, None)
    if requested and digest[5] % 2 == 0 and requested not in layers:
        layers.append(requested)
    version = _VERSIONS[fmt][digest[2] % len(_VERSIONS[fmt])]
    return {
        "service_type": fmt,
        "version": version,
        "layers": layers,
        "crs": ["EPSG:4326", "EPSG:3857"][: 1 + digest[3] % 2],
        "output_formats": ["application/json", "GML2"][: 1 + digest[4] % 2],
    }


_WFS_NS = {
    "2.0.0": "http://www.opengis.net/wfs/2.0",
    "1.1.0": "http://www.opengis.net/wfs",
    "1.0.0": "http://www.opengis.net/wfs",
}


def synthetic_capabilities_xml(service_url: str, fmt: str) -> bytes:
    """The synthetic_capabilities dict rendered as a REAL
    GetCapabilities XML document (WFS FeatureTypeList / WMS Layer tree),
    so the production parse path runs on every probe."""
    caps = synthetic_capabilities(service_url, fmt)
    v = caps["version"]
    if fmt == "wfs":
        fts = "".join(
            "<FeatureType><Name>{0}</Name>{1}{2}</FeatureType>".format(
                name,
                "".join(
                    f"<{'DefaultCRS' if i == 0 else 'OtherCRS'}>"
                    f"urn:ogc:def:crs:EPSG::{c.split(':')[1]}"
                    f"</{'DefaultCRS' if i == 0 else 'OtherCRS'}>"
                    for i, c in enumerate(caps["crs"])
                ),
                "<OutputFormats>"
                + "".join(f"<Format>{f}</Format>" for f in caps["output_formats"])
                + "</OutputFormats>",
            )
            for name in caps["layers"]
        )
        doc = (
            f'<wfs:WFS_Capabilities version="{v}" xmlns:wfs="{_WFS_NS[v]}">'
            f"<FeatureTypeList>{fts}</FeatureTypeList></wfs:WFS_Capabilities>"
        )
    else:  # wms
        layers = "".join(
            f"<Layer queryable=\"1\"><Name>{name}</Name><Title>{name}</Title></Layer>"
            for name in caps["layers"]
        )
        crs_tag = "CRS" if v == "1.3.0" else "SRS"
        crs = "".join(f"<{crs_tag}>{c}</{crs_tag}>" for c in caps["crs"])
        formats = "".join(f"<Format>{f}</Format>" for f in caps["output_formats"])
        doc = (
            f'<WMS_Capabilities version="{v}">'
            f"<Capability><Request><GetMap>{formats}</GetMap></Request>"
            f"<Layer><Title>root</Title>{crs}{layers}</Layer></Capability>"
            f"</WMS_Capabilities>"
        )
    return ('<?xml version="1.0" encoding="UTF-8"?>' + doc).encode("utf-8")


def _normalize_crs(text: str) -> str | None:
    """'urn:ogc:def:crs:EPSG::4326' / 'EPSG:4326' → 'EPSG:4326'."""
    text = (text or "").strip()
    if not text:
        return None
    if text.upper().startswith("URN:"):
        parts = [p for p in text.split(":") if p]
        if len(parts) >= 2:
            return f"{parts[-2]}:{parts[-1]}"
    return text


def parse_capabilities_xml(data: bytes) -> dict:
    """GetCapabilities XML → the owslib-equivalent metadata dict
    (reference ogc/__init__.py:80-248 reads .contents/.identification
    off owslib; this reads the same fields off the document):

      WFS (2.0.0 / 1.1.0 / 1.0.0): FeatureTypeList/FeatureType names,
      DefaultCRS/OtherCRS/DefaultSRS/SRS, per-type OutputFormats plus
      OperationsMetadata outputFormat allowed values.
      WMS (1.3.0 / 1.1.1): nested Layer tree names (named layers only),
      CRS/SRS elements, Request/GetMap formats.
    """
    root = ET.fromstring(data)
    tag = root.tag.rsplit("}", 1)[-1].lower()
    version = root.get("version") or ""
    if "wfs" in tag:
        service = "wfs"
        layers = [
            (el.text or "").strip()
            for el in root.findall(".//{*}FeatureTypeList/{*}FeatureType/{*}Name")
        ]
        crs: list[str] = []
        for path in ("DefaultCRS", "OtherCRS", "DefaultSRS", "OtherSRS", "SRS"):
            for el in root.findall(f".//{{*}}FeatureType/{{*}}{path}"):
                c = _normalize_crs(el.text)
                if c and c not in crs:
                    crs.append(c)
        fmts: list[str] = []
        for el in root.findall(".//{*}FeatureType/{*}OutputFormats/{*}Format"):
            f = (el.text or "").strip()
            if f and f not in fmts:
                fmts.append(f)
        for op in root.findall(".//{*}Operation"):
            if op.get("name") != "GetFeature":
                continue
            for par in op.findall(".//{*}Parameter"):
                if (par.get("name") or "").lower() != "outputformat":
                    continue
                for val in par.findall(".//{*}Value"):
                    f = (val.text or "").strip()
                    if f and f not in fmts:
                        fmts.append(f)
    elif "wms" in tag:
        service = "wms"
        layers = []
        for lay in root.findall(".//{*}Layer"):
            name = lay.find("{*}Name")
            if name is not None and (name.text or "").strip():
                layers.append(name.text.strip())
        crs = []
        for crs_tag in ("CRS", "SRS"):
            for el in root.findall(f".//{{*}}Layer/{{*}}{crs_tag}"):
                c = _normalize_crs(el.text)
                if c and c not in crs:
                    crs.append(c)
        fmts = []
        for el in root.findall(".//{*}Request/{*}GetMap/{*}Format"):
            f = (el.text or "").strip()
            if f and f not in fmts:
                fmts.append(f)
    else:
        raise ValueError(f"not a WFS/WMS capabilities document (root {root.tag!r})")
    return {
        "service_type": service,
        "version": version,
        "layers": layers,
        "crs": crs,
        "output_formats": fmts,
    }


def analyse_ogc(check: dict, transport=None, title: str | None = None) -> dict | None:
    """OGC analysis for one check row; None when disabled or not OGC.

    ``transport`` may supply ``capabilities_xml(url, fmt) -> bytes``
    (a real deployment returns the HTTP GetCapabilities body) or a
    pre-parsed ``capabilities(url, fmt) -> dict``; the default
    synthesizes an XML document and runs the production parser on it.
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
    elif transport is not None and hasattr(transport, "capabilities_xml"):
        caps = parse_capabilities_xml(transport.capabilities_xml(url, fmt))
    else:
        caps = parse_capabilities_xml(synthetic_capabilities_xml(url, fmt))
    # reference ogc/__init__.py:196-209: keep the candidate only when it
    # matches a served layer — exact first (namespace included), else a
    # local-name match resolved to the UNIQUE namespaced layer, else None
    detected = detect_layer_name(url, title)
    layers = caps.get("layers") or []
    if detected and detected not in layers:
        matches = [l for l in layers if l.split(":")[-1] == detected]
        detected = matches[0] if len(matches) == 1 else None
    return {**caps, "detected_layer": detected}
