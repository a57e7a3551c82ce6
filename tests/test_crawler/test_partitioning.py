"""Hash partitioning + hot-domain salting (north-rule skew handling)."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.functions.urls import canonicalize_batch
from hydra_ray.stages.partitioning import (
    assign_partitions,
    detect_hot_domains,
    partition_slices,
)
from hydra_ray.synth import catalog_from_documents


def skewed_batch(n=4000):
    docs = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64())})
    return canonicalize_batch(catalog_from_documents(docs))  # ~55% static.data.example


def test_detect_hot_domains():
    b = skewed_batch()
    hot = detect_hot_domains(b, n_partitions=16)
    assert "static.data.example" in hot
    assert all(d == "static.data.example" for d in hot)


def test_unsalted_domain_colocates():
    b = skewed_batch()
    withp = assign_partitions(b, n_partitions=16, hot_domains=set())
    df = withp.to_pandas()
    per_domain = df.groupby("domain")["partition"].nunique()
    assert (per_domain == 1).all()  # each domain in exactly one partition


def test_salting_spreads_hot_domain_and_bounds_skew():
    b = skewed_batch()
    hot = {"static.data.example"}
    withp = assign_partitions(b, n_partitions=16, hot_domains=hot, salt_k=16)
    df = withp.to_pandas()
    hot_parts = df[df["domain"] == "static.data.example"]["partition"].nunique()
    assert hot_parts >= 8  # spread over many partitions
    # no partition holds more than 3× the mean
    sizes = df.groupby("partition").size()
    assert sizes.max() <= 3 * len(df) / 16
    # cold domains still co-located
    cold = df[df["domain"] != "static.data.example"]
    assert (cold.groupby("domain")["partition"].nunique() == 1).all()


def test_assignment_deterministic():
    b = skewed_batch(500)
    a1 = assign_partitions(b, 8, {"static.data.example"})["partition"].to_pylist()
    a2 = assign_partitions(b, 8, {"static.data.example"})["partition"].to_pylist()
    assert a1 == a2


def test_partition_slices_cover_everything():
    b = skewed_batch(1000)
    slices = partition_slices(b, 8, {"static.data.example"})
    assert sum(s.num_rows for s in slices) == 1000
    got = sorted(
        rid for s in slices for rid in s["resource_id"].to_pylist()
    )
    assert got == sorted(b["resource_id"].to_pylist())
