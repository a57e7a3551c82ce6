"""Partial (combiner-style) grouped aggregation.

``grouped_agg`` computes per-block partial aggregates with Arrow's
in-memory ``Table.group_by`` kernel, then runs the final Ray Data
``groupby`` only over the partials — so the all-to-all shuffle moves
one row per (key, block) instead of every input row. This is the
pre-aggregation pattern every grouped count/sum in the engine uses
(the reference's A2-A7 aggregates).

Supported aggs: sum, count, min, max (mergeable partials). Output
column names are caller-specified.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_agg(
    ds: "rd.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> "rd.Dataset":
    """aggs: (input_col, fn, out_name); fn in sum|count|min|max.
    For count, input_col is any always-present column."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_out()
        spec = [(col, "count" if fn == "count" else fn) for col, fn, _ in aggs]
        g = t.group_by(keys).aggregate(spec)
        # arrow names results "{col}_{fn}"
        rename = {}
        for col, fn, out in aggs:
            arrow_fn = "count" if fn == "count" else fn
            rename[f"{col}_{arrow_fn}"] = out
        cols = {}
        for name in g.column_names:
            cols[rename.get(name, name)] = g[name]
        return pa.table(cols)

    def _empty_out() -> pa.Table:
        fields = {k: pa.array([], type=pa.string()) for k in keys}
        for _, _, out in aggs:
            fields[out] = pa.array([], type=pa.int64())
        return pa.table(fields)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # Final merge. Partials are one row per (key, block) — orders of
    # magnitude smaller than the input — so up to DRIVER_MERGE_ROWS they
    # merge on the driver with Arrow's C++ group_by (Ray Data's groupby
    # pays a full sort-shuffle fixed cost that dwarfs small finals).
    # Larger partial sets (huge key cardinality) fall back to the
    # distributed groupby.
    from hydra_ray.sources.store import ds_to_tables

    tables = [t for t in ds_to_tables(partials) if t.num_rows]
    if not tables:
        return rd.from_arrow(_empty_final(keys, aggs))
    merged = pa.concat_tables(tables, promote_options="default")
    if merged.num_rows <= DRIVER_MERGE_ROWS:
        spec = [(out, _MERGE_FN[fn]) for _, fn, out in aggs]
        g = merged.group_by(keys).aggregate(spec)
        rename = {f"{out}_{_MERGE_FN[fn]}": out for _, fn, out in aggs}
        g = g.rename_columns([rename.get(c, c) for c in g.column_names])
        return rd.from_arrow(g)

    from ray.data.aggregate import Max, Min, Sum

    final_aggs = []
    for _, fn, out in aggs:
        cls = {"sum": Sum, "min": Min, "max": Max}[_MERGE_FN[fn]]
        final_aggs.append(cls(out, alias_name=out))
    pds = rd.from_arrow(merged)
    if len(keys) == 1:
        return pds.groupby(keys[0]).aggregate(*final_aggs)
    return pds.groupby(keys).aggregate(*final_aggs)


DRIVER_MERGE_ROWS = 5_000_000


def _empty_final(keys: list[str], aggs: list[tuple[str, str, str]]) -> pa.Table:
    fields = {k: pa.array([], type=pa.string()) for k in keys}
    for _, _, out in aggs:
        fields[out] = pa.array([], type=pa.int64())
    return pa.table(fields)


def windowed_agg(
    ds: "rd.Dataset",
    t_col: str,
    window_us: int,
    aggs: list[tuple[str, str, str]],
    keys: tuple[str, ...] = (),
    slide_us: int | None = None,
) -> "rd.Dataset":
    """Tumbling / sliding time-window aggregation.

    Tumbling (slide_us=None): each row is assigned floor(t/window) —
    one vectorized map_batches, then the partial-agg grouped_agg path
    (one partial row per (window, key, block) crosses the shuffle).

    Sliding (window = m × slide): each row is replicated onto the m
    windows containing it (starts floor(t/slide)-j for j<m) — the
    standard m× expansion, still fully vectorized and still
    pre-aggregated per block before the shuffle. window_us must be a
    multiple of slide_us."""
    import numpy as np
    import pyarrow.compute as pc

    if slide_us is not None and window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    m = 1 if slide_us is None else window_us // slide_us
    step = window_us if slide_us is None else slide_us

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t[t_col], pa.int64()).to_numpy(zero_copy_only=False)
        if m == 1:
            starts = (us // step) * step
            out = t
        else:
            idx = np.repeat(np.arange(len(us), dtype=np.int64), m)
            j = np.tile(np.arange(m, dtype=np.int64), len(us))
            starts = (us[idx] // step - j) * step
            out = t.take(pa.array(idx))
        return out.append_column(
            "window_start", pa.array(starts).cast(pa.timestamp("us"))
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(assigned, keys=["window_start", *keys], aggs=aggs)


def grouped_stats(
    ds: "rd.Dataset",
    key: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9),
    distinct_col: str | None = None,
    num_parts: int = 32,
) -> "rd.Dataset":
    """Per-key order statistics + exact distinct counts — the aggregate
    shapes grouped_agg's mergeable partials can't express. One keyed
    shuffle co-locates each key; quantiles/nunique run vectorized per
    partition (pandas groupby). Quantile semantics = linear
    interpolation (pandas default == DuckDB quantile_cont).

    At 100 TB exact per-key quantiles require the key's rows in one
    partition (num_parts sizes that); a t-digest partial would relax
    this at the cost of exactness — out of scope while the oracle
    demands bit-parity."""
    import pandas as pd

    from hydra_ray.stages.keyed import keyed_map_partitions

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby(key, sort=False):
            row = {key: k, "n": len(g)}
            for q in quantiles:
                row[f"q{int(q * 100)}"] = round(float(g[value_col].quantile(q)), 6)
            if distinct_col is not None:
                row["n_distinct"] = int(g[distinct_col].nunique())
            rows.append(row)
        if not rows:
            cols = {key: pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            for q in quantiles:
                cols[f"q{int(q * 100)}"] = pd.Series(dtype="float64")
            if distinct_col is not None:
                cols["n_distinct"] = pd.Series(dtype="int64")
            return pd.DataFrame(cols)
        return pd.DataFrame(rows)

    return keyed_map_partitions(ds, [key], stats, num_parts=num_parts)


def _floor_log2_u64(x):
    """Exact vectorized floor(log2(x)) for uint64 (0 stays 0)."""
    import numpy as np

    y = x.astype(np.uint64, copy=True)
    bl = np.zeros(len(y), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = y >= (np.uint64(1) << np.uint64(s))
        y = np.where(mask, y >> np.uint64(s), y)
        bl += s * mask.astype(np.int64)
    return bl


def hll_registers(
    ds: "rd.Dataset",
    key: str,
    col: str,
    p: int = 6,
) -> "rd.Dataset":
    """HyperLogLog register table per key: (key, register, max_rank).

    The mergeable-sketch shape for approximate distinct counting at
    100 TB: each block contributes at most ``2^p`` rows per key to the
    shuffle (register maxima merge with max), so the exchange volume is
    O(keys × m), independent of row count. Hash = splitmix64 (the
    engine's shared SQL-reproducible mixer), register = top p bits,
    rank = leading-zero count of the remaining 64-p bits + 1 — integer
    outputs, so the DuckDB oracle is bit-exact. ``hll_estimate`` turns
    the registers into the cardinality estimate."""
    import numpy as np

    from hydra_ray.state.cuckoo import _mix64

    mask64 = np.uint64(0xFFFFFFFFFFFFFFFF)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], type=t.schema.field(key).type),
                    "register": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix64(vals)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) & mask64
        rank = np.where(rest == 0, 64 - p + 1, 64 - _floor_log2_u64(rest)).astype(np.int64)
        g = (
            pa.table({key: t[key], "register": pa.array(reg), "rank": pa.array(rank)})
            .group_by([key, "register"])
            .aggregate([("rank", "max")])
        )
        return g.rename_columns([key, "register", "rank"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, keys=[key, "register"], aggs=[("rank", "max", "max_rank")])


def hll_estimate(registers, p: int = 6) -> dict:
    """Register table (key, register, max_rank) → {key: estimated
    cardinality} with the standard HyperLogLog bias corrections."""
    import math

    import pandas as pd

    if not isinstance(registers, pd.DataFrame):
        registers = registers.to_pandas()
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    out = {}
    key_col = [c for c in registers.columns if c not in ("register", "max_rank")][0]
    for k, g in registers.groupby(key_col, sort=False):
        ranks = dict(zip(g["register"], g["max_rank"]))
        s = sum(2.0 ** -ranks.get(j, 0) for j in range(m))
        est = alpha * m * m / s
        zeros = m - len(ranks)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        out[k] = est
    return out


CMS_SEEDS = (1000003, 10007, 2003, 31)


def cms_counts(
    ds: "rd.Dataset",
    col: str,
    width: int = 256,
    seeds: tuple[int, ...] = CMS_SEEDS,
) -> "rd.Dataset":
    """Count-min sketch counters: (d, w, count) with
    w = splitmix64(value + seed_d) % width.

    The other mergeable sketch (heavy hitters at 100 TB): counters
    merge by SUM, so each block contributes ≤ depth × width rows to the
    shuffle regardless of row count — the grouped_agg partial/combiner
    path does the merge. Counters are integers, so the DuckDB oracle is
    bit-exact; ``cms_estimate`` answers point queries (min over rows,
    the standard overestimate-only guarantee)."""
    import numpy as np

    from hydra_ray.state.cuckoo import _mix64

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ds_out, ws, cs = [], [], []
        for d, seed in enumerate(seeds):
            w = (_mix64(vals + np.uint64(seed)) % np.uint64(width)).astype(np.int64)
            counts = np.bincount(w, minlength=width)
            nz = np.nonzero(counts)[0]
            ds_out.append(np.full(len(nz), d, dtype=np.int64))
            ws.append(nz.astype(np.int64))
            cs.append(counts[nz].astype(np.int64))
        return pa.table(
            {
                "d": pa.array(np.concatenate(ds_out) if ds_out else []),
                "w": pa.array(np.concatenate(ws) if ws else []),
                "c": pa.array(np.concatenate(cs) if cs else []),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, keys=["d", "w"], aggs=[("c", "sum", "count")])


def cms_estimate(counters, items, width: int = 256, seeds: tuple[int, ...] = CMS_SEEDS) -> dict:
    """Point-query the sketch: {item: estimated count} (min over the
    depth rows; never underestimates)."""
    import numpy as np
    import pandas as pd

    from hydra_ray.state.cuckoo import _mix64

    if not isinstance(counters, pd.DataFrame):
        counters = counters.to_pandas()
    table = {(int(r.d), int(r.w)): int(r.count) for r in counters.itertuples(index=False)}
    out = {}
    arr = np.asarray(items, dtype=np.uint64)
    w64 = np.uint64(width)  # NB: uint64 % python-int promotes to float64
    for i, item in enumerate(items):
        est = min(
            table.get((d, int(_mix64(arr[i : i + 1] + np.uint64(seed))[0] % w64)), 0)
            for d, seed in enumerate(seeds)
        )
        out[item] = est
    return out
