"""Sequence packing: distributed prefix sum correctness and invariance
to block layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from hydra_ray.stages.pack import pack_sequences


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_matches_serial_cumsum():
    rng = np.random.default_rng(3)
    n = 300
    counts = rng.integers(1, 40, size=n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)  # unsorted input
    t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(counts[ids])})
    for parts in (1, 7):
        out = (
            pack_sequences(rd.from_arrow(t).repartition(parts), capacity=64)
            .to_pandas()
            .sort_values("doc_id")
        )
        start = np.cumsum(counts) - counts  # exclusive prefix in id order
        assert out["seq_id"].to_numpy().tolist() == (start // 64).tolist()
        assert out["seq_offset"].to_numpy().tolist() == (start % 64).tolist()
        # a doc starting exactly on a boundary has offset 0
        assert ((out["seq_offset"] >= 0) & (out["seq_offset"] < 64)).all()
