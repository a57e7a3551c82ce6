"""Pure-stdlib PMTiles v3 writer/reader + Mapbox Vector Tile codec.

The reference converts GeoJSON resources to PMTiles by shelling out to
tippecanoe (data_formats/geojson/to_pmtiles.py:16-47). That binary is
not in this container, but both output formats are open specs:

  - PMTiles v3 (github.com/protomaps/PMTiles/blob/main/spec/v3):
    127-byte header, Hilbert-ordered tile ids, varint-delta root
    directory, clustered tile data.
  - Mapbox Vector Tile 2.1 (github.com/mapbox/vector-tile-spec):
    protobuf Tile/Layer/Feature messages, zigzag command-integer
    geometries.

This module implements the subset tippecanoe produces for the
reference's point-feature GeoJSON exports: one MVT layer per tile,
point geometries, string/int/double properties, leaf directories when
the root exceeds the spec's 16 KB budget (run_length=0 root pointers),
no compression (internal_compression = tile_compression = 1/none, both
legal per spec).

The distributed path lives in stages/geo.py: feature → tile
assignment is a vectorized map_batches, tiles are assembled under a
hash-partitioned shuffle, and only the finished (small) per-tile MVT
blobs reach the driver for the final archive concat.
"""

from __future__ import annotations

import json
import struct

EXTENT = 4096
MAX_ROOT_DIR_BYTES = 16384 - 127


# ---------------------------------------------------------------------------
# varint / zigzag / protobuf primitives
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _pb_key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_varint(field: int, v: int) -> bytes:
    return _pb_key(field, 0) + _varint(v)


def _pb_bytes(field: int, payload: bytes) -> bytes:
    return _pb_key(field, 2) + _varint(len(payload)) + payload


def _pb_walk(data: bytes):
    """Yield (field, wire, value) over one protobuf message; value is
    int for varint fields, bytes for length-delimited, raw 8/4 bytes
    for fixed."""
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _read_varint(data, pos)
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            v = data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            v = data[pos : pos + 4]
            pos += 4
        elif wire == 1:
            v = data[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# ---------------------------------------------------------------------------
# MVT layer encode / decode (points)
# ---------------------------------------------------------------------------


def _mvt_value(v) -> bytes:
    if isinstance(v, bool):
        return _pb_varint(7, int(v))
    if isinstance(v, int):
        return _pb_varint(6, _zigzag(v))  # sint_value
    if isinstance(v, float):
        return _pb_key(3, 1) + struct.pack("<d", v)
    return _pb_bytes(1, str(v).encode("utf-8"))


def encode_mvt_layer(
    name: str, features: list[tuple[int, int, int, dict]], extent: int = EXTENT
) -> bytes:
    """features: (feature_id, px, py, properties) with px/py in tile
    pixel coordinates [0, extent). Returns one MVT Tile message with a
    single point layer."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    feats = []
    for fid, px, py, props in features:
        tags = bytearray()
        for k, v in props.items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            enc = _mvt_value(v)
            if enc not in val_idx:
                val_idx[enc] = len(vals)
                vals.append(enc)
            tags += _varint(key_idx[k]) + _varint(val_idx[enc])
        geom = _varint((1) | (1 << 3)) + _varint(_zigzag(px)) + _varint(_zigzag(py))
        body = _pb_varint(1, fid) + _pb_bytes(2, bytes(tags)) + _pb_varint(3, 1) + _pb_bytes(4, geom)
        feats.append(body)
    layer = bytearray()
    layer += _pb_varint(15, 2)  # version
    layer += _pb_bytes(1, name.encode("utf-8"))
    for f in feats:
        layer += _pb_bytes(2, f)
    for k in keys:
        layer += _pb_bytes(3, k.encode("utf-8"))
    for v in vals:
        layer += _pb_bytes(4, v)
    layer += _pb_varint(5, extent)
    return _pb_bytes(3, bytes(layer))  # Tile.layers


def decode_mvt_layer(tile: bytes) -> dict:
    """Inverse of encode_mvt_layer (single point layer, for tests)."""
    out = {"name": None, "extent": EXTENT, "features": []}
    for field, _w, v in _pb_walk(tile):
        if field != 3:
            continue
        keys: list[str] = []
        values: list[object] = []
        raw_feats: list[bytes] = []
        for lf, _lw, lv in _pb_walk(v):
            if lf == 1:
                out["name"] = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                val = None
                for vf, _vw, vv in _pb_walk(lv):
                    if vf == 1:
                        val = vv.decode("utf-8")
                    elif vf == 3:
                        val = struct.unpack("<d", vv)[0]
                    elif vf == 6:
                        val = _unzigzag(vv)
                    elif vf == 7:
                        val = bool(vv)
                values.append(val)
            elif lf == 5:
                out["extent"] = lv
        for rf in raw_feats:
            feat = {"id": None, "props": {}, "xy": None}
            for ff, _fw, fv in _pb_walk(rf):
                if ff == 1:
                    feat["id"] = fv
                elif ff == 2:
                    pos = 0
                    while pos < len(fv):
                        ki, pos = _read_varint(fv, pos)
                        vi, pos = _read_varint(fv, pos)
                        feat["props"][keys[ki]] = values[vi]
                elif ff == 4:
                    _cmd, pos = _read_varint(fv, 0)
                    zx, pos = _read_varint(fv, pos)
                    zy, pos = _read_varint(fv, pos)
                    feat["xy"] = (_unzigzag(zx), _unzigzag(zy))
            out["features"].append(feat)
    return out


# ---------------------------------------------------------------------------
# Hilbert tile ids + directory + header
# ---------------------------------------------------------------------------


def hilbert_tile_id(z: int, x: int, y: int) -> int:
    """PMTiles tile id: tiles-before-zoom offset + Hilbert position."""
    acc = (4**z - 1) // 3
    s = (1 << z) >> 1
    d = 0
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def tile_id_to_zxy(tile_id: int) -> tuple[int, int, int]:
    z = 0
    while tile_id >= (4 ** (z + 1) - 1) // 3:
        z += 1
    d = tile_id - (4**z - 1) // 3
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s <<= 1
    return z, x, y


def _serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by id."""
    out = bytearray(_varint(len(entries)))
    last_id = 0
    for tid, _o, _l, _r in entries:
        out += _varint(tid - last_id)
        last_id = tid
    for _t, _o, _l, r in entries:
        out += _varint(r)
    for _t, _o, ln, _r in entries:
        out += _varint(ln)
    for i, (_t, off, _l, _r) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _varint(0)
        else:
            out += _varint(off + 1)
    return bytes(out)


def _deserialize_directory(data: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(data, 0)
    ids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(data, pos)
        last += d
        ids.append(last)
    for _ in range(n):
        r, pos = _read_varint(data, pos)
        runs.append(r)
    for _ in range(n):
        ln, pos = _read_varint(data, pos)
        lens.append(ln)
    for i in range(n):
        o, pos = _read_varint(data, pos)
        if o == 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(o - 1)
    return list(zip(ids, offs, lens, runs))


def _pack_header(
    root_len: int,
    meta_off: int,
    meta_len: int,
    tile_off: int,
    tile_len: int,
    n_tiles: int,
    minz: int,
    maxz: int,
    bounds: tuple[float, float, float, float],
    leaf_off: int = 0,
    leaf_len: int = 0,
) -> bytes:
    h = bytearray(127)
    h[0:7] = b"PMTiles"
    h[7] = 3
    struct.pack_into("<QQ", h, 8, 127, root_len)
    struct.pack_into("<QQ", h, 24, meta_off, meta_len)
    struct.pack_into("<QQ", h, 40, leaf_off, leaf_len)
    struct.pack_into("<QQ", h, 56, tile_off, tile_len)
    struct.pack_into("<QQQ", h, 72, n_tiles, n_tiles, n_tiles)
    h[96] = 1  # clustered
    h[97] = 1  # internal compression: none
    h[98] = 1  # tile compression: none
    h[99] = 1  # tile type: MVT
    h[100] = minz
    h[101] = maxz
    lon0, lat0, lon1, lat1 = bounds
    struct.pack_into(
        "<iiii", h, 102, int(lon0 * 1e7), int(lat0 * 1e7), int(lon1 * 1e7), int(lat1 * 1e7)
    )
    h[118] = minz
    struct.pack_into("<ii", h, 119, int((lon0 + lon1) / 2 * 1e7), int((lat0 + lat1) / 2 * 1e7))
    return bytes(h)


def _split_to_leaves(entries: list[tuple[int, int, int, int]]) -> tuple[bytes, bytes]:
    """Spec leaf-directory split for archives whose root directory
    exceeds 16 KB: tile entries are packed into fixed-count leaf
    directories and the root holds one entry per leaf — (first tile id,
    offset within the leaf section, serialized length, run_length=0;
    run_length 0 is the spec's leaf marker). Leaf size starts at 4096
    entries (what the protomaps writers use) and doubles until the root
    fits. Returns (root_bytes, leaf_section_bytes)."""
    leaf_n = 4096
    while True:
        leaf_blobs = []
        root_entries = []
        off = 0
        for i in range(0, len(entries), leaf_n):
            chunk = entries[i : i + leaf_n]
            blob = _serialize_directory(chunk)
            root_entries.append((chunk[0][0], off, len(blob), 0))
            leaf_blobs.append(blob)
            off += len(blob)
        root = _serialize_directory(root_entries)
        if len(root) <= MAX_ROOT_DIR_BYTES:
            return root, b"".join(leaf_blobs)
        leaf_n *= 2


def build_pmtiles_bytes(
    tiles: dict[tuple[int, int, int], bytes],
    bounds: tuple[float, float, float, float] = (-180.0, -85.0511, 180.0, 85.0511),
    metadata: dict | None = None,
) -> bytes:
    """(z,x,y)→MVT bytes → a v3 archive as bytes. Small archives get a
    root-only directory; once the root would exceed the spec's 16 KB
    budget the entries spill into leaf directories (run_length=0 root
    pointers), so archive size is unbounded."""
    if not tiles:
        raise ValueError("no tiles to write")
    by_id = sorted((hilbert_tile_id(z, x, y), blob) for (z, x, y), blob in tiles.items())
    entries = []
    data = bytearray()
    for tid, blob in by_id:
        entries.append((tid, len(data), len(blob), 1))
        data += blob
    root = _serialize_directory(entries)
    leaves = b""
    if len(root) > MAX_ROOT_DIR_BYTES:
        root, leaves = _split_to_leaves(entries)
    meta = json.dumps(metadata or {"vector_layers": [{"id": "features"}]}, sort_keys=True).encode()
    zs = [z for z, _x, _y in tiles]
    meta_off = 127 + len(root)
    leaf_off = meta_off + len(meta)
    tile_off = leaf_off + len(leaves)
    header = _pack_header(
        len(root), meta_off, len(meta), tile_off, len(data), len(entries),
        min(zs), max(zs), bounds,
        leaf_off=leaf_off if leaves else 0, leaf_len=len(leaves),
    )
    return header + root + meta + leaves + bytes(data)


def write_pmtiles(
    tiles: dict[tuple[int, int, int], bytes],
    out_path: str,
    bounds: tuple[float, float, float, float] = (-180.0, -85.0511, 180.0, 85.0511),
    metadata: dict | None = None,
) -> str:
    blob = build_pmtiles_bytes(tiles, bounds, metadata)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os

    os.replace(tmp, out_path)
    return out_path


def write_pmtiles_streaming(
    tile_meta: list[tuple[int, int, int]],
    blob_iter,
    out_path: str,
    bounds: tuple[float, float, float, float] = (-180.0, -85.0511, 180.0, 85.0511),
    metadata: dict | None = None,
) -> str:
    """Streaming sibling of write_pmtiles: directories are built from
    ``tile_meta`` = [(tile_id, byte_length, zoom)] (tiny — no blobs),
    then tile DATA is appended from ``blob_iter`` — an iterator of
    (tile_id, bytes) in ascending-tile-id (Hilbert) order — so driver
    memory is one blob batch, never the whole tile set. Byte-identical
    to write_pmtiles on the same tiles (round-trip pinned by test)."""
    if not tile_meta:
        raise ValueError("no tiles to write")
    meta_sorted = sorted(tile_meta)
    entries = []
    off = 0
    for tid, ln, _z in meta_sorted:
        entries.append((tid, off, ln, 1))
        off += ln
    root = _serialize_directory(entries)
    leaves = b""
    if len(root) > MAX_ROOT_DIR_BYTES:
        root, leaves = _split_to_leaves(entries)
    meta = json.dumps(metadata or {"vector_layers": [{"id": "features"}]}, sort_keys=True).encode()
    zs = [z for _, _, z in tile_meta]
    meta_off = 127 + len(root)
    leaf_off = meta_off + len(meta)
    tile_off = leaf_off + len(leaves)
    header = _pack_header(
        len(root), meta_off, len(meta), tile_off, off, len(entries),
        min(zs), max(zs), bounds,
        leaf_off=leaf_off if leaves else 0, leaf_len=len(leaves),
    )
    import os

    tmp = out_path + ".tmp"
    expect = iter(meta_sorted)
    written = 0
    with open(tmp, "wb") as f:
        f.write(header + root + meta + leaves)
        for tid, blob in blob_iter:
            want = next(expect, None)
            if want is None or want[0] != tid or want[1] != len(blob):
                raise ValueError(
                    f"blob stream out of Hilbert order or length mismatch at tile {tid}"
                )
            f.write(blob)
            written += len(blob)
    if written != off:
        raise ValueError(f"tile data truncated: wrote {written} of {off} bytes")
    os.replace(tmp, out_path)
    return out_path


def read_pmtiles(path: str) -> dict:
    """Archive → {'header': {...}, 'metadata': dict,
    'tiles': {(z,x,y): bytes}}. Root-only and leaf-directory archives
    both decode: a root entry with run_length 0 points into the leaf
    section (offset, serialized length) and its tile entries are read
    from the referenced leaf directory."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[0:7] != b"PMTiles" or raw[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    root_off, root_len = struct.unpack_from("<QQ", raw, 8)
    meta_off, meta_len = struct.unpack_from("<QQ", raw, 24)
    leaf_off, leaf_len = struct.unpack_from("<QQ", raw, 40)
    tile_off, tile_len = struct.unpack_from("<QQ", raw, 56)
    header = {
        "min_zoom": raw[100],
        "max_zoom": raw[101],
        "clustered": raw[96] == 1,
        "tile_type": raw[99],
        "n_entries": struct.unpack_from("<Q", raw, 80)[0],
        "n_leaf_bytes": leaf_len,
        "bounds": tuple(v / 1e7 for v in struct.unpack_from("<iiii", raw, 102)),
    }
    entries = []
    for tid, off, ln, run in _deserialize_directory(raw[root_off : root_off + root_len]):
        if run == 0:  # leaf pointer
            entries.extend(_deserialize_directory(raw[leaf_off + off : leaf_off + off + ln]))
        else:
            entries.append((tid, off, ln, run))
    tiles = {}
    for tid, off, ln, _run in entries:
        tiles[tile_id_to_zxy(tid)] = raw[tile_off + off : tile_off + off + ln]
    meta = json.loads(raw[meta_off : meta_off + meta_len]) if meta_len else {}
    return {"header": header, "metadata": meta, "tiles": tiles}
