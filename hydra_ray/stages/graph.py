"""Iterative graph algorithms over edge-list Datasets.

PageRank here is the engine's showcase for ITERATIVE algorithms on Ray
Data (the reference has none; connected components live in
stages/dedup.py `duplicate_clusters_distributed`). The contract is
integer fixed-point — every rank is an int64 scaled by `scale`, every
division is floor division — so results are bit-exact under any block
split / execution order AND expressible in SQL (the oracle unrolls the
same iterations; same trick as the splitmix64 oracles).

Update rule (simplified PageRank, no dangling-mass redistribution —
documented contract, matches the oracle):

    r0[v]   = scale // N
    r'[v]   = (15 * scale) // (100 * N)  +  (85 * in_sum[v]) // 100
    in_sum[v] = sum over edges (u, v) of  r[u] // outdeg[u]

Distribution shape: the edge list stays a (materialized) Dataset; each
iteration broadcasts the node→contribution array once via the object
store and runs one combiner map_batches over the edges (per-block
np.bincount partial sums by destination), merging the tiny per-block
partials on the driver. Driver state is O(N nodes) — the documented
assumption of this variant. At web scale (N beyond driver memory),
co-partition edges by src and ranks by node with the keyed-shuffle
helpers in stages/keyed.py; the per-iteration math is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def pagerank(
    edges: "rd.Dataset",
    iters: int = 10,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Integer fixed-point PageRank over an edge-list Dataset.

    Multi-edges count multiply (dedup upstream if unwanted). Returns a
    pa.Table (node:int64, r:int64) sorted by node.
    """
    from hydra_ray.sources.store import ds_to_tables

    edges = edges.materialize()

    # one pass: per-block (src, outdeg partial) + block-unique dst set
    def degree_partial(t: pa.Table) -> pa.Table:
        g = t.group_by([src_col]).aggregate([(src_col, "count")])
        src = g[src_col].combine_chunks()
        cnt = pc.cast(g[f"{src_col}_count"], pa.int64()).combine_chunks()
        dst_u = pc.unique(t[dst_col].combine_chunks())
        n_s, n_d = len(src), len(dst_u)
        return pa.table(
            {
                "node": pa.concat_arrays([pc.cast(src, pa.int64()), pc.cast(dst_u, pa.int64())]),
                "outdeg": pa.concat_arrays([cnt, pa.nulls(n_d, pa.int64())]),
            }
        )

    parts = [
        t
        for t in ds_to_tables(edges.map_batches(degree_partial, batch_format="pyarrow"))
        if t.num_rows
    ]
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts)
    g = merged.group_by(["node"]).aggregate([("outdeg", "sum")])
    nodes = np.sort(g["node"].to_numpy(zero_copy_only=False).astype(np.int64))
    deg_map = dict(
        zip(
            g["node"].to_numpy(zero_copy_only=False).astype(np.int64),
            pc.fill_null(g["outdeg_sum"], 0).to_numpy(zero_copy_only=False).astype(np.int64),
        )
    )
    outdeg = np.array([deg_map[n] for n in nodes], dtype=np.int64)
    n = len(nodes)
    base = (15 * scale) // (100 * n)
    r = np.full(n, scale // n, dtype=np.int64)

    nodes_ref = ray.put(nodes)

    def contrib_partial(t: pa.Table, *, contrib_ref) -> pa.Table:
        node_arr = ray.get(nodes_ref)
        contrib = ray.get(contrib_ref)
        src = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        di = np.searchsorted(node_arr, dst)
        # exact int64 accumulation (bincount weights go through float64)
        sums = np.zeros(len(node_arr), dtype=np.int64)
        np.add.at(sums, di, contrib[np.searchsorted(node_arr, src)])
        nz = np.nonzero(sums)[0]
        return pa.table(
            {
                "node": pa.array(node_arr[nz], type=pa.int64()),
                "s": pa.array(sums[nz], type=pa.int64()),
            }
        )

    for _ in range(iters):
        # safe floor division: outdeg>0 for every src by construction
        contrib = np.where(outdeg > 0, r // np.maximum(outdeg, 1), 0).astype(np.int64)
        contrib_ref = ray.put(contrib)
        it_parts = [
            t
            for t in ds_to_tables(
                edges.map_batches(
                    contrib_partial,
                    batch_format="pyarrow",
                    fn_kwargs={"contrib_ref": contrib_ref},
                )
            )
            if t.num_rows
        ]
        in_sum = np.zeros(n, dtype=np.int64)
        for t in it_parts:
            idx = np.searchsorted(nodes, t["node"].to_numpy(zero_copy_only=False))
            np.add.at(in_sum, idx, t["s"].to_numpy(zero_copy_only=False).astype(np.int64))
        r = base + (85 * in_sum) // 100

    return pa.table({"node": pa.array(nodes), "r": pa.array(r)})


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def triangle_count(edges: "rd.Dataset", src_col: str = "src", dst_col: str = "dst") -> pa.Table:
    """Global triangle count over an undirected graph given as a
    directed edge-list Dataset (self-loops dropped, direction and
    multi-edges collapsed to one canonical (min, max) edge).

    Algorithm: the compact-forward / wedge-intersection count —
    triangles = Σ over canonical edges (u, v), u<v of
    |N(u) ∩ N(v) ∩ {w : w > v}| — computed fully vectorized with
    adjacency BITSETS: the N×⌈N/8⌉ adjacency bit-matrix broadcasts once
    via the object store, and each edge block does one numpy AND +
    popcount over (block_edges × N/8) bytes; per-block partial sums
    merge on the driver. Driver/broadcast state is O(N²/8) bits — right
    for graphs whose node set fits memory (the documented assumption);
    beyond that, partition edges by min-node and intersect per-partition
    adjacency shards (same math, keyed shuffle).

    Returns a one-row table (n_nodes, n_edges, n_triangles).
    """
    import ray

    from hydra_ray.sources.store import ds_to_tables

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    from hydra_ray.stages.agg import grouped_agg

    dedup = grouped_agg(
        edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"], [("u", "count", "_n")]
    ).drop_columns(["_n"]).materialize()

    parts = [t for t in ds_to_tables(dedup) if t.num_rows]
    if not parts:
        return pa.table(
            {"n_nodes": pa.array([0], pa.int64()), "n_edges": pa.array([0], pa.int64()),
             "n_triangles": pa.array([0], pa.int64())}
        )
    all_e = pa.concat_tables(parts).combine_chunks()
    u = all_e["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = all_e["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    n = len(nodes)
    width = (n + 7) // 8
    bits = np.zeros((n, width), dtype=np.uint8)
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    for a, b in ((ui, vi), (vi, ui)):  # undirected adjacency
        np.bitwise_or.at(bits, (a, b // 8), (1 << (b % 8)).astype(np.uint8))
    # gt_mask[j] = bitset of node indices strictly greater than j
    gt = np.zeros((n, width), dtype=np.uint8)
    idx = np.arange(n)
    for j in range(n):
        m = idx > j
        gt[j] = np.packbits(m, bitorder="little")[:width]
    bits_ref = ray.put(bits)
    gt_ref = ray.put(gt)
    nodes_ref = ray.put(nodes)

    def count_partial(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        g = ray.get(gt_ref)
        nd = ray.get(nodes_ref)
        eu = np.searchsorted(nd, t["u"].to_numpy(zero_copy_only=False))
        ev = np.searchsorted(nd, t["v"].to_numpy(zero_copy_only=False))
        rows = b[eu] & b[ev] & g[ev]
        total = int(_POP8[rows].sum())
        return pa.table({"c": pa.array([total], pa.int64())})

    c_parts = [t for t in ds_to_tables(dedup.map_batches(count_partial, batch_format="pyarrow")) if t.num_rows]
    tri = sum(int(pc.sum(t["c"]).as_py() or 0) for t in c_parts)
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "n_edges": pa.array([len(u)], pa.int64()),
            "n_triangles": pa.array([tri], pa.int64()),
        }
    )
