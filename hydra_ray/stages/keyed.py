"""Hash-partition-by-key + per-partition vectorized map.

``groupby(key).map_groups(fn)`` dispatches one Python call per group —
for high-cardinality keys (content hashes, user ids, band hashes) that
is millions of tiny pandas frames and dominates wall time. The scale
shape used here instead:

  1. add ``_part = H(key) % num_parts`` in ``map_batches`` (vectorized,
     deterministic SipHash via ``pd.util.hash_pandas_object``);
  2. ``groupby("_part").map_groups`` — the shuffle co-locates all rows
     of a key in one partition, and the UDF runs ONCE per partition
     over the whole co-partitioned frame, vectorized.

All rows of any key land in exactly one partition, so any per-key
reduction (top-k, dedup, pair emission) computed per partition is
globally correct. ``num_parts`` bounds task granularity: at 100 TB it
is sized so a partition fits a worker's heap, not by key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

DEFAULT_PARTS = 32


def part_of(t: pa.Table, keys: list[str], num_parts: int) -> np.ndarray:
    """Deterministic partition id per row from the key columns."""
    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        col = t[k].to_pandas()
        kh = pd.util.hash_pandas_object(col, index=False).to_numpy().astype(np.uint64)
        h = h * np.uint64(1099511628211) + kh
    return (h % np.uint64(num_parts)).astype(np.int64)


def keyed_map_partitions(
    ds: "rd.Dataset",
    keys: list[str],
    fn,
    num_parts: int = DEFAULT_PARTS,
) -> "rd.Dataset":
    """Apply ``fn(pandas.DataFrame) -> pandas.DataFrame`` once per
    key-co-located partition (all rows sharing ``keys`` values are in
    the same frame). ``fn`` must be per-key-correct but is free to
    vectorize across keys."""

    def addpart(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(part_of(t, keys, num_parts)))

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["_part"]))

    return (
        ds.map_batches(addpart, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(run, batch_format="pandas")
    )


def keyed_map_partitions_arrow(
    ds: "rd.Dataset",
    keys: list[str],
    fn,
    num_parts: int = DEFAULT_PARTS,
) -> "rd.Dataset":
    """Arrow-native sibling of keyed_map_partitions: ``fn(pa.Table) ->
    pa.Table`` once per key-co-located partition. Use when the rows
    carry nested Arrow types (list<struct> spans, fixed-size lists)
    that do not survive the pandas round-trip."""

    def addpart(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(part_of(t, keys, num_parts)))

    def run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns(["_part"]))

    return (
        ds.map_batches(addpart, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(run, batch_format="pyarrow")
    )
