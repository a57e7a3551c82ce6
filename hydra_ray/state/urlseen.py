"""Sharded URL-seen set: cuckoo-filter actors + exact fallback.

The reference enforces URL/resource uniqueness with a Postgres UNIQUE
constraint + ``ON CONFLICT`` upserts (udata_hydra/db/resource.py:64-79,
cli/catalog.py:62-76). At 10^10-frontier scale a central unique index
is the bottleneck, so membership is sharded: url_key64 → shard
``key % n_shards`` → one ``UrlSeenShard`` actor holding a cuckoo
filter plus an exact set of the keys *it inserted this run* (the
authoritative set lives in the catalog checkpoint table; the exact
in-actor set resolves cuckoo false positives for keys inserted since
the last checkpoint).

Usage from a pipeline: ``UrlSeenPool.create(...)`` on the driver, then
``pool.add_if_new(keys)`` — the pool groups keys by shard, issues one
batched actor call per shard, and reassembles the boolean mask in
input order. Calls are batched per Dataset block, never per row.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import ray

from hydra_ray.state.cuckoo import CuckooFilter
from hydra_ray.state.politeness import _atomic_pickle


# num_cpus=0: shards are lightweight lookup servers that must never
# starve the fetch/analyse pools of CPU slots; on a real cluster give
# them fractional CPUs via .options(num_cpus=...) at creation.
@ray.remote(num_cpus=0)
class UrlSeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, capacity: int = 1 << 20, seed: int = 7, exact: bool = True):
        self.filter = CuckooFilter(capacity=capacity, seed=seed)
        # exact resolver for false positives among keys added this run
        self.exact: set[int] | None = set() if exact else None

    def add_if_new(self, keys: np.ndarray) -> np.ndarray:
        """Returns mask: True where the key was NOT seen before (and is
        now marked seen). Duplicates inside the same call are deduped
        first-wins, matching ON CONFLICT upsert semantics."""
        keys = keys.astype(np.int64, copy=False)
        maybe_seen = self.filter.contains_batch(keys.view(np.uint64))
        is_new = np.ones(len(keys), dtype=bool)
        added: set[int] = set()
        for j in range(len(keys)):
            k = int(keys[j])
            if k in added:
                is_new[j] = False
                continue
            if maybe_seen[j]:
                if self.exact is not None:
                    is_new[j] = k not in self.exact
                else:
                    is_new[j] = False  # trust the filter (approximate mode)
            elif self.exact is not None and k in self.exact:
                # filter miss but the exact set knows the key: a refused
                # insert (filter + stash full) must not re-admit the URL
                is_new[j] = False
            if is_new[j]:
                added.add(k)
        new_keys = keys[is_new]
        if len(new_keys):
            self.filter.insert_batch(new_keys.view(np.uint64))
            if self.exact is not None:
                self.exact.update(int(k) for k in new_keys)
        return is_new

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.int64, copy=False)
        if self.exact is not None:
            # the exact set is authoritative (superset of the filter's
            # content — updated on every add, checkpointed wholly); the
            # filter only short-circuits approximate mode
            return np.fromiter((int(k) in self.exact for k in keys), dtype=bool, count=len(keys))
        return self.filter.contains_batch(keys.view(np.uint64))

    def stats(self) -> dict:
        return {
            "count": self.filter.count,
            "load_factor": self.filter.load_factor,
            "exact_size": len(self.exact) if self.exact is not None else None,
        }

    # -- checkpointing ----------------------------------------------------
    def serialize(self) -> dict:
        return {
            "filter": self.filter.to_bytes(),
            "exact": np.array(sorted(self.exact), dtype=np.int64).tobytes()
            if self.exact is not None
            else None,
        }

    def restore(self, blob: dict) -> None:
        self.filter = CuckooFilter.from_bytes(blob["filter"])
        if blob.get("exact") is not None:
            self.exact = set(np.frombuffer(blob["exact"], dtype=np.int64).tolist())

    def save(self, path: str) -> str:
        """Atomic actor-side state write (bytes never touch the driver)."""
        return _atomic_pickle(path, self.serialize())

    def load(self, path: str) -> None:
        with open(path, "rb") as f:
            self.restore(pickle.load(f))


class UrlSeenPool:
    """Driver-side facade over the shard actors."""

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    @classmethod
    def create(cls, n_shards: int = 8, capacity_per_shard: int = 1 << 20, seed: int = 7) -> "UrlSeenPool":
        return cls(
            [UrlSeenShard.remote(capacity=capacity_per_shard, seed=seed) for _ in range(n_shards)]
        )

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (keys.view(np.uint64) % np.uint64(self.n)).astype(np.int64)

    def _scatter_gather(self, keys: np.ndarray, method: str) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        shard_of = self._route(keys)
        refs, idxs = [], []
        for s in range(self.n):
            sel = np.nonzero(shard_of == s)[0]
            if len(sel):
                refs.append(getattr(self.shards[s], method).remote(keys[sel]))
                idxs.append(sel)
        out = np.zeros(len(keys), dtype=bool)
        for sel, res in zip(idxs, ray.get(refs)):
            out[sel] = res
        return out

    def add_if_new(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather(keys, "add_if_new")

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather(keys, "contains")

    def serialize(self) -> list[dict]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def restore(self, blobs: list[dict]) -> None:
        if len(blobs) != self.n:
            self._restore_rerouted(blobs)
            return
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def _restore_rerouted(self, blobs: list[dict]) -> None:
        """Shard count changed between checkpoint and restore: cuckoo
        tables can't be split, but in exact mode the key sets can be
        merged and re-inserted through the normal routing."""
        if any(b.get("exact") is None for b in blobs):
            raise RuntimeError(
                f"URL-seen checkpoint has {len(blobs)} shards but the pool has "
                f"{self.n}; approximate-mode cuckoo state cannot be re-sharded — "
                "restore with the same URLSEEN_SHARDS or use exact mode"
            )
        arrs = [np.frombuffer(b["exact"], dtype=np.int64) for b in blobs]
        keys = np.unique(np.concatenate(arrs)) if arrs else np.array([], dtype=np.int64)
        if len(keys):
            self.add_if_new(keys)

    # -- sharded checkpointing (per-partition state files) -----------------
    def save_shards(self, dirpath: str, prefix: str = "urlseen") -> list:
        """One file per shard, written actor-side in parallel. Returns refs."""
        return [
            s.save.remote(os.path.join(dirpath, f"{prefix}-{i:03d}.pkl"))
            for i, s in enumerate(self.shards)
        ]

    def load_shards(self, paths: list[str]) -> None:
        if len(paths) == self.n:
            ray.get([s.load.remote(p) for s, p in zip(self.shards, paths)])
            return
        blobs = []
        for p in paths:
            with open(p, "rb") as f:
                blobs.append(pickle.load(f))
        self._restore_rerouted(blobs)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])
