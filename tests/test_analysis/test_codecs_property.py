"""Property-based tests (hypothesis) for the stdlib binary codecs:
PMTiles varint/zigzag/directory/Hilbert and the BIFF .xls round-trip.

These codecs parse/emit byte-exact formats; fuzzing the value space is
the cheapest way to catch boundary bugs (7-bit varint seams, RK sign
bits, SST CONTINUE splits at odd offsets).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from hydra_ray.sources.pmtiles import (
    _deserialize_directory,
    _read_varint,
    _serialize_directory,
    _unzigzag,
    _varint,
    _zigzag,
    hilbert_tile_id,
    tile_id_to_zxy,
)
from hydra_ray.sources.xls import read_xls_rows, write_xls

# keep hypothesis fast and deterministic (no wall-clock dependence)
_FAST = settings(max_examples=60, deadline=None)


@_FAST
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(v):
    data = _varint(v)
    out, pos = _read_varint(data, 0)
    assert out == v and pos == len(data)


@_FAST
@given(st.integers(min_value=-(2**62), max_value=2**62 - 1))
def test_zigzag_roundtrip(v):
    assert _unzigzag(_zigzag(v)) == v


@_FAST
@given(
    st.integers(min_value=0, max_value=12),
    st.data(),
)
def test_hilbert_bijection(z, data):
    n = 1 << z
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    assert tile_id_to_zxy(hilbert_tile_id(z, x, y)) == (z, x, y)


@_FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=0, max_value=2**30),
            st.integers(min_value=1, max_value=2**20),
            st.integers(min_value=1, max_value=16),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_directory_roundtrip(raw_entries):
    # ids must be strictly increasing (delta encoding assumes sorted)
    entries = []
    last = -1
    for tid, off, ln, run in sorted(raw_entries):
        if tid <= last:
            tid = last + 1
        last = tid
        entries.append((tid, off, ln, run))
    assert _deserialize_directory(_serialize_directory(entries)) == entries


_CELL_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " éàüßøñ漢字-_.,;",
    max_size=40,
)
_CELL = st.one_of(
    _CELL_TEXT,
    st.integers(min_value=-(2**28), max_value=2**28),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(_CELL, min_size=1, max_size=6), min_size=1, max_size=8),
)
def test_xls_roundtrip_property(rows):
    width = max(len(r) for r in rows)
    rows = [list(r) + [""] * (width - len(r)) for r in rows]
    out = read_xls_rows(write_xls(rows))

    def expect(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float):
            f = float(v)
            return str(int(f)) if f == int(f) and abs(f) < 1e15 else repr(f)
        return str(v)

    # the fixture writer emits a record for every cell (empty strings
    # included), so the read-back grid is dense
    assert out == [[expect(v) for v in r] for r in rows]
