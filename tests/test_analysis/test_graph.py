"""stages/graph.py — integer fixed-point PageRank."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from hydra_ray.stages.graph import pagerank

SCALE = 10**12


def _reference_pagerank(edges, iters=10, scale=SCALE):
    """Plain-Python mirror of the documented integer update rule."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    outdeg = [0] * len(nodes)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    n = len(nodes)
    r = [scale // n] * n
    base = (15 * scale) // (100 * n)
    for _ in range(iters):
        in_sum = [0] * n
        for u, v in edges:
            in_sum[idx[v]] += r[idx[u]] // outdeg[idx[u]]
        r = [base + (85 * s) // 100 for s in in_sum]
    return dict(zip(nodes, r))


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4)]


def test_pagerank_matches_reference(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in EDGES], pa.int64()),
                "dst": pa.array([v for _, v in EDGES], pa.int64()),
            }
        )
    )
    out = pagerank(ds, iters=10)
    got = dict(zip(out["node"].to_pylist(), out["r"].to_pylist()))
    assert got == _reference_pagerank(EDGES)
    # the hub (3) outranks everything; total mass is conserved-ish
    assert got[3] == max(got.values())


def test_pagerank_block_split_invariant(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 50, size=4000).astype(np.int64)
    dst = rng.integers(0, 50, size=4000).astype(np.int64)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    a = pagerank(rd.from_arrow(t).repartition(1), iters=5)
    b = pagerank(rd.from_arrow(t).repartition(13), iters=5)
    assert a.equals(b)


def test_triangle_count_known_graph(ray_session):
    from hydra_ray.stages.graph import triangle_count

    # K4 (4 triangles... actually C(4,3)=4) plus a pendant edge, given
    # as noisy directed multi-edges with self-loops
    edges = []
    for u in range(4):
        for v in range(4):
            if u != v:
                edges.append((u, v))  # both directions + dups collapse
    edges += [(0, 0), (3, 9), (9, 3)]
    t = pa.table(
        {
            "src": pa.array([u for u, _ in edges], pa.int64()),
            "dst": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = triangle_count(rd.from_arrow(t).repartition(5)).to_pylist()[0]
    assert out == {"n_nodes": 5, "n_edges": 7, "n_triangles": 4}


def test_pagerank_sharded_equals_broadcast(ray_session):
    """The keyed-shuffle pagerank (no O(N) driver arrays) is bit-exact
    vs the broadcast path — integer sums are associative, so the only
    way they can diverge is a partitioning bug."""
    rng = np.random.default_rng(11)
    src = rng.integers(0, 300, size=6000).astype(np.int64)
    dst = rng.integers(0, 300, size=6000).astype(np.int64)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    a = pagerank(rd.from_arrow(t).repartition(7), iters=6, mode="broadcast")
    b = pagerank(rd.from_arrow(t).repartition(7), iters=6, mode="sharded", num_parts=5)
    assert a.equals(b)
    # auto-route: a tiny threshold forces the sharded path
    c = pagerank(rd.from_arrow(t), iters=6, mode="auto", broadcast_edges_max=10, num_parts=3)
    assert a.equals(c)


def test_triangle_sharded_equals_broadcast(ray_session):
    """Degree-ordered wedge semi-join (no N²/8 bitset broadcast) equals
    the bitset path, including on a skewed star-heavy graph."""
    from hydra_ray.stages.graph import triangle_count

    rng = np.random.default_rng(3)
    src = rng.integers(0, 120, size=5000).astype(np.int64)
    dst = rng.integers(0, 120, size=5000).astype(np.int64)
    # add a hot star center (node 0 touches everyone) — the degree
    # orientation must keep its wedge load at the leaves
    src = np.concatenate([src, np.zeros(119, np.int64)])
    dst = np.concatenate([dst, np.arange(1, 120, dtype=np.int64)])
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    a = triangle_count(rd.from_arrow(t).repartition(6), mode="broadcast").to_pylist()[0]
    b = triangle_count(
        rd.from_arrow(t).repartition(6), mode="sharded", num_parts=5
    ).to_pylist()[0]
    assert a == b
    c = triangle_count(rd.from_arrow(t), mode="auto", broadcast_nodes_max=10).to_pylist()[0]
    assert a == c


def test_triangle_sharded_known_graph(ray_session):
    from hydra_ray.stages.graph import triangle_count

    edges = []
    for u in range(4):
        for v in range(4):
            if u != v:
                edges.append((u, v))
    edges += [(0, 0), (3, 9), (9, 3)]
    t = pa.table(
        {
            "src": pa.array([u for u, _ in edges], pa.int64()),
            "dst": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = triangle_count(rd.from_arrow(t).repartition(5), mode="sharded", num_parts=3)
    assert out.to_pylist()[0] == {"n_nodes": 5, "n_edges": 7, "n_triangles": 4}


def test_triangle_count_empty(ray_session):
    from hydra_ray.stages.graph import triangle_count

    t = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    out = triangle_count(rd.from_arrow(t)).to_pylist()[0]
    assert out["n_triangles"] == 0
