"""Distributed suffix-array construction (prefix doubling) and the
exact-substring dedup built on it.

This is the true Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better", §4) ExactSubstr formulation: order every
suffix of the corpus, then read duplicated substrings straight off the
rank structure. The sibling `stages/dedup.py::char_dup_spans` gets the
same spans via rolling-hash candidates + an exact text re-verify; here
NO text ever re-ships and NO hash is involved — window equality is
decided by two integer rank lookups, so the pipeline is exact by
construction (reference scope: udata_hydra has no dedup layer at all;
this extends the LLM-curation surface, like stages/dedup.py).

Construction (Manber–Myers prefix doubling, re-expressed Ray-Data-first):

  * Suffixes are doc-local ``(doc, pos)`` pairs — suffixes never cross
    document boundaries, so no global concatenation or separator
    sentinels are needed, and the round count is log2(max DOC length),
    not log2(corpus length). Both paths seed the ranks with PACKED
    first-4-byte keys (exact, base-257 — not a hash), skipping the
    first two doubling rounds outright.
  * State is one rank table ``(did, pos, r)`` — one row per corpus
    BYTE. Round h (h = 1, 2, 4, …) turns "r groups suffixes by their
    first h chars" into "first 2h chars":
      1. doc-keyed co-partition (`keyed_map_partitions`): each
         partition holds whole documents, so ``r2[p] = r[p+h]`` (or -1
         past the doc end) is one vectorized shift — no donor-row
         union, no random access;
      2. global ``Dataset.sort`` by (r, r2) — the one all-to-all
         exchange per round;
      3. dense-rank assignment over the sorted blocks: an O(blocks)
         driver probe reads each block's (first key, last key, distinct
         count), stitches boundary-equal runs, and hands each block an
         integer base — the blocks then re-rank themselves in parallel.
         The driver holds per-BLOCK scalars only, never rows.
  * Rounds stop when every rank is distinct (or h reaches the max doc
    length, at which point equal ranks mean genuinely equal suffixes —
    ties share a dense rank, deterministically).

At 100 TB the rank table is one row per byte: the sort is the standard
Ray Data range-partitioned shuffle and the per-round driver state stays
O(blocks). The documented partitioning assumption is that a single
DOCUMENT fits a worker partition (same assumption as every per-doc
stage in this engine).

`sa_dup_spans` needs only the first ⌈log2(min_len)⌉ rounds: with
w = 2^⌊log2 min_len⌋ and δ = min_len - w, two suffixes share their
first min_len chars iff (r_w[p], r_w[p+δ]) == (r_w[q], r_w[q+δ]) — the
classic two-rank substring-equality trick. Grouping positions by that
integer key pair and keeping groups of size ≥ min_occ yields EXACTLY
the duplicated-window position set of `char_dup_spans` (pinned by
test), after which the island merge is shared code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


# --------------------------------------------------------------------------
# shared local kernels (used by the driver fast path AND inside workers)


def _explode_bytes(ids: np.ndarray, texts: list[str]):
    """(doc ids, texts) → contiguous (did, pos, r) arrays in (did, pos)
    order; r = UTF-8 byte value (groups suffixes by their first char)."""
    bufs = [(t or "").encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    did = np.repeat(ids.astype(np.int64), lens)
    pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) if len(lens) else np.empty(0, np.int64)
    r = (
        np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
        if did.size
        else np.empty(0, np.int64)
    )
    return did, pos, r


def _shift_rank(did: np.ndarray, r: np.ndarray, h: int) -> np.ndarray:
    """r2[p] = r[p+h] within the same doc, else -1 — arrays must be in
    (did, pos) order with per-doc contiguous positions."""
    n = r.size
    r2 = np.full(n, -1, dtype=np.int64)
    if n > h:
        r2[:-h] = np.where(did[h:] == did[:-h], r[h:], -1)
    return r2


def _pack_initial(did: np.ndarray, r_bytes: np.ndarray, h0: int) -> np.ndarray:
    """Exact packed key of the first ``h0`` bytes of each suffix (NOT a
    hash — the literal bytes, base-257 with 0 for past-doc-end), so the
    doubling loop can START at h = h0 instead of 1, saving log2(h0)
    full sort rounds on both paths. h0 ≤ 4 keeps the key < 257⁴ ≈
    4.4·10⁹, well inside int64."""
    key = r_bytes + np.int64(1)  # bytes → 1..256; 0 reserved for past-end
    out = key.copy()
    for j in range(1, h0):
        out = out * np.int64(257) + (_shift_rank(did, key, j) + np.int64(1))
    return out


def _dense_rank_single(key: np.ndarray) -> tuple[np.ndarray, int]:
    """Dense rank of one int64 key array; returns (ranks, distinct)."""
    n = key.size
    order = np.argsort(key, kind="stable")
    ks = key[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    newr = np.empty(n, dtype=np.int64)
    newr[order] = np.cumsum(change) - 1
    return newr, int(change.sum())


def _dense_rank_local(r: np.ndarray, r2: np.ndarray) -> tuple[np.ndarray, int]:
    """Dense rank of (r, r2) pairs; returns (new ranks, distinct count).
    The pair is packed into one int64 key (both components are < n, so
    r*(n+2)+(r2+1) < n² — exact for n < ~3·10⁹, far above the driver
    fast path's reach) so the sort and the change detection each make
    a single pass instead of lexsort's two."""
    n = r.size
    base = np.int64(n + 2)  # r/r2 are dense ranks < n in every round
    key = r * base + (r2 + np.int64(1))
    order = np.argsort(key, kind="stable")
    ks = key[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    newr = np.empty(n, dtype=np.int64)
    newr[order] = np.cumsum(change) - 1
    return newr, int(change.sum())


def _doubling_local(
    did: np.ndarray, pos: np.ndarray, r_bytes: np.ndarray, h_stop: int | None
) -> tuple[np.ndarray, int]:
    """Run prefix-doubling rounds locally over raw byte values.
    Seeds with packed first-min(4, h_stop)-byte keys (exact, not
    hashed) so the loop starts at h0 instead of 1. Stops when r groups
    by ≥ h_stop chars (if given), all ranks are distinct, or h reaches
    the max doc length. Returns (final ranks, h such that r groups
    first-h chars)."""
    n = r_bytes.size
    if n == 0:
        return r_bytes, 1
    maxlen = int(pos.max()) + 1  # positions are 0..len-1 per doc
    h = min(4, h_stop) if h_stop is not None else 4
    r, nd = _dense_rank_single(_pack_initial(did, r_bytes, h))
    while nd < n and (h_stop is None or h < h_stop) and h < maxlen:
        r2 = _shift_rank(did, r, h)
        r, nd = _dense_rank_local(r, r2)
        h *= 2
    return r, h


def _full_window_mask(did: np.ndarray, min_len: int) -> np.ndarray:
    """valid[i] ⟺ position i has ≥ min_len chars left in its doc —
    positions are contiguous per doc, so row i+min_len-1 being the same
    doc is exactly that condition."""
    n = did.size
    valid = np.zeros(n, dtype=bool)
    m = min_len - 1
    if n > m:
        valid[: n - m] = did[m:] == did[:-m]
    return valid


def _window_hits_local(
    did: np.ndarray,
    pos: np.ndarray,
    r: np.ndarray,
    min_len: int,
    w: int,
    min_occ: int,
) -> pd.DataFrame:
    """Positions (1-based) whose min_len-char window occurs ≥ min_occ
    times, from a rank table grouping first-w chars (w ≤ min_len ≤ 2w).
    Arrays must be in (did, pos) order."""
    delta = min_len - w
    valid = _full_window_mask(did, min_len)
    k1 = r[valid]
    # r at pos+delta: same contiguous-layout shift as _shift_rank
    k2 = _shift_rank(did, r, delta)[valid] if delta else k1
    vd, vp = did[valid], pos[valid]
    n = k1.size
    if n == 0:
        return pd.DataFrame({"did": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")})
    base = np.int64(max(r.size, 256) + 2)  # ranks are < total positions
    key = k1 * base + (k2 + np.int64(1))
    order = np.argsort(key, kind="stable")
    ks = key[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    gid = np.cumsum(change) - 1
    sizes = np.bincount(gid)
    keep = sizes[gid] >= min_occ
    sel = order[keep]
    return pd.DataFrame({"did": vd[sel], "pos": vp[sel] + 1})


# --------------------------------------------------------------------------
# distributed rounds


@ray.remote
def _rank_probe(blk):
    from hydra_ray.sources.store import block_to_table

    t = block_to_table(blk)
    if t.num_rows == 0:
        return (0, None, None, 0)
    r = t["r"].to_numpy(zero_copy_only=False)
    r2 = t["r2"].to_numpy(zero_copy_only=False)
    change = np.empty(r.size, dtype=bool)
    change[0] = True
    change[1:] = (r[1:] != r[:-1]) | (r2[1:] != r2[:-1])
    return (
        t.num_rows,
        (int(r[0]), int(r2[0])),
        (int(r[-1]), int(r2[-1])),
        int(change.sum()),
    )


@ray.remote
def _rank_assign(blk, base: int):
    from hydra_ray.sources.store import block_to_table

    t = block_to_table(blk)
    if t.num_rows == 0:
        return pa.table(
            {
                "did": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "r": pa.array([], type=pa.int64()),
            }
        )
    r = t["r"].to_numpy(zero_copy_only=False)
    r2 = t["r2"].to_numpy(zero_copy_only=False)
    change = np.empty(r.size, dtype=bool)
    change[0] = False  # the block's first key is ranked by `base`
    change[1:] = (r[1:] != r[:-1]) | (r2[1:] != r2[:-1])
    newr = base + np.cumsum(change)
    return pa.table({"did": t["did"], "pos": t["pos"], "r": pa.array(newr, type=pa.int64())})


def _dist_round(state: "rd.Dataset", h: int, num_parts: int) -> tuple["rd.Dataset", int, int]:
    """One doubling round on the (did, pos, r) rank table. Returns
    (next state, total rows, total distinct ranks)."""
    from hydra_ray.stages.keyed import keyed_map_partitions

    def with_r2(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("did", "pos", "r", "r2")}
            )
        df = df.sort_values(["did", "pos"], kind="mergesort")
        did = df["did"].to_numpy()
        r = df["r"].to_numpy()
        return pd.DataFrame(
            {"did": did, "pos": df["pos"].to_numpy(), "r": r, "r2": _shift_rank(did, r, h)}
        )

    paired = keyed_map_partitions(state, ["did"], with_r2, num_parts)
    return _dist_dense_rank(paired)


def _dist_dense_rank(paired: "rd.Dataset") -> tuple["rd.Dataset", int, int]:
    """(did, pos, r, r2) → globally dense-ranked (did, pos, r): one
    Dataset.sort, an O(blocks) driver probe, block-parallel re-rank."""
    from hydra_ray.sources.store import ds_to_table_refs

    srt = paired.sort(["r", "r2"])
    refs = ds_to_table_refs(srt)
    if not refs:
        return srt, 0, 0
    probes = ray.get([_rank_probe.remote(b) for b in refs])
    # stitch block-local dense ranks into global ones: base_b = global
    # rank of block b's first key. A key spanning a block boundary
    # (first == previous non-empty block's last) keeps its rank open.
    bases: list[int] = []
    total_rows = 0
    base = 0
    prev_last = None
    prev_d = 0
    for n, first, last, nd in probes:
        if n == 0:
            bases.append(0)
            continue
        if prev_last is not None:
            base += prev_d - (1 if first == prev_last else 0)
        bases.append(base)
        total_rows += n
        prev_last, prev_d = last, nd
    total_distinct = (base + prev_d) if total_rows else 0
    nxt = rd.from_arrow_refs(
        [_rank_assign.remote(b, bs) for b, bs in zip(refs, bases)]
    )
    return nxt.materialize(), total_rows, total_distinct


def suffix_array(
    ds: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_docs: int = 20_000,
    num_parts: int = 64,
) -> "rd.Dataset":
    """Suffix array of the corpus: one row per (doc_id, pos) with
    ``sa_rank`` = dense rank of the suffix string over ALL suffixes
    (0-based; genuinely equal suffixes — possible across documents —
    share a rank, deterministically). See the module docstring for the
    distributed construction; below ``driver_docs`` documents the
    doubling runs on pulled arrays with bit-identical arithmetic
    (parity-pinned by test, same auto-route pattern as bpe_train)."""
    if driver_docs and ds.count() <= driver_docs:
        did, pos, r = _load_local(ds, id_col, text_col)
        r, _ = _doubling_local(did, pos, r, h_stop=None)
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array(did, type=pa.int64()),
                    "pos": pa.array(pos, type=pa.int64()),
                    "sa_rank": pa.array(r, type=pa.int64()),
                }
            )
        )

    state, maxlen, n_total, nd = _init_state(ds, id_col, text_col, h0=4)
    h = 4
    while nd < n_total and h < maxlen:
        state, n_total, nd = _dist_round(state, h, num_parts)
        h *= 2

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["did"], "pos": t["pos"], "sa_rank": t["r"]})

    return state.map_batches(rename, batch_format="pyarrow")


def _load_local(ds: "rd.Dataset", id_col: str, text_col: str):
    from hydra_ray.sources.store import ds_to_tables

    parts = [t for t in ds_to_tables(ds) if t.num_rows]
    tbl = pa.concat_tables(parts) if parts else None
    if tbl is None or tbl.num_rows == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    ids = pc.cast(tbl[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = tbl[text_col].take(pa.array(order)).to_pylist()
    return _explode_bytes(ids, texts)


def _init_state(ds: "rd.Dataset", id_col: str, text_col: str, h0: int = 4):
    """documents → distributed (did, pos, r) rank table GROUPING THE
    FIRST h0 CHARS (packed exact byte keys, dense-ranked in one sort —
    the seed that saves log2(h0) doubling rounds) + (max doc len,
    total rows, distinct ranks)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        did, pos, r = _explode_bytes(ids, t[text_col].to_pylist())
        # packing looks only WITHIN docs, and explode sees whole docs
        packed = _pack_initial(did, r, h0) if r.size else r
        return pa.table(
            {
                "did": pa.array(did, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
                "r": pa.array(packed, type=pa.int64()),
                "r2": pa.array(np.zeros(len(did), dtype=np.int64)),
            }
        )

    state = ds.map_batches(explode, batch_format="pyarrow").materialize()
    maxlen = int(state.max("pos") or 0) + 1
    ranked, n_total, n_distinct = _dist_dense_rank(state)
    return ranked, maxlen, n_total, n_distinct


def sa_dup_spans(
    ds: "rd.Dataset",
    min_len: int = 30,
    min_occ: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_docs: int = 20_000,
    num_parts: int = 64,
) -> "rd.Dataset":
    """ExactSubstr duplicated spans via the suffix-array rank tables:
    maximal per-document char spans covered by a ``min_len``-char window
    occurring ≥ ``min_occ`` times anywhere in the corpus. Identical
    output contract to `char_dup_spans` (doc_id, start_chr 1-based,
    end_chr, n_windows) — pinned equal by test — but derived from
    integer ranks: only ⌈log2(min_len)⌉ doubling rounds run, and window
    equality is (r_w[p], r_w[p+δ]) equality, so no window text or hash
    ever enters a shuffle and there is no collision-candidate pass."""
    if min_len < 2:
        raise ValueError("min_len must be ≥ 2")
    w = 1 << (min_len.bit_length() - 1)  # largest power of two ≤ min_len
    from hydra_ray.stages.dedup import _char_span_merge_fn
    from hydra_ray.stages.keyed import keyed_map_partitions

    if driver_docs and ds.count() <= driver_docs:
        did, pos, r = _load_local(ds, id_col, text_col)
        if did.size == 0:
            hits = pd.DataFrame({"did": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")})
        else:
            r, h = _doubling_local(did, pos, r, h_stop=w)
            if h < w:
                # every rank distinct before reaching w chars → no two
                # suffixes share even h < min_len chars → no dup windows
                hits = pd.DataFrame({"did": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")})
            else:
                hits = _window_hits_local(did, pos, r, min_len, w, min_occ)
        merged = _char_span_merge_fn(min_len, id_col)(
            hits.rename(columns={"did": id_col})
        )
        return rd.from_arrow(pa.Table.from_pandas(merged, preserve_index=False))

    h0 = min(4, w)
    state, maxlen, n, nd = _init_state(ds, id_col, text_col, h0=h0)
    h = h0
    all_distinct = nd == n and h < w
    while not all_distinct and h < w:
        state, n, nd = _dist_round(state, h, num_parts)
        h *= 2
        if nd == n:
            # no two suffixes share even their first h ≤ w chars, so no
            # min_len-window can repeat
            all_distinct = h < w
            break

    if all_distinct or maxlen < min_len:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "start_chr": pd.Series(dtype="int64"),
                "end_chr": pd.Series(dtype="int64"),
                "n_windows": pd.Series(dtype="int64"),
            }
        )
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))

    delta = min_len - w

    def window_keys(df: pd.DataFrame) -> pd.DataFrame:
        """Per doc-co-partition: (did, pos, k1, k2) for every position
        with a full min_len window remaining."""
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("did", "pos", "k1", "k2")}
            )
        df = df.sort_values(["did", "pos"], kind="mergesort")
        did = df["did"].to_numpy()
        pos = df["pos"].to_numpy()
        r = df["r"].to_numpy()
        valid = _full_window_mask(did, min_len)
        k2 = _shift_rank(did, r, delta) if delta else r
        return pd.DataFrame(
            {"did": did[valid], "pos": pos[valid], "k1": r[valid], "k2": k2[valid]}
        )

    keys = keyed_map_partitions(state, ["did"], window_keys, num_parts)

    def dup_hits(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"did": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")}
            )
        keep = df.groupby(["k1", "k2"], sort=False)["k1"].transform("size") >= min_occ
        out = df.loc[keep, ["did", "pos"]].copy()
        out["pos"] = out["pos"] + 1  # 1-based, matching char_dup_spans
        return out

    hits = keyed_map_partitions(keys, ["k1", "k2"], dup_hits, num_parts)

    def renamed(t: pa.Table) -> pa.Table:
        return t.rename_columns([id_col, "pos"])

    return keyed_map_partitions(
        hits.map_batches(renamed, batch_format="pyarrow"),
        [id_col],
        _char_span_merge_fn(min_len, id_col),
        num_parts=32,
    )
