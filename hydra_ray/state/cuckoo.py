"""Bucketized cuckoo filter over int64 keys (numpy-backed).

Approximate-membership structure for the URL-seen set (north rule:
"sharded cuckoo/bloom URL-seen set"). Public-knowledge design (Fan et
al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014):
b=4 slots per bucket, 16-bit fingerprints, partial-key cuckoo hashing
with i2 = i1 XOR hash(fingerprint). ~0.0001 false-positive rate at
95% load; supports delete and serialization for checkpoints.

False positives are resolved by the exact url_key column in the
catalog checkpoint table (see urlseen.py), so the *effective* URL-seen
set is exact — the filter only short-circuits the common miss path.

All batch operations are numpy-vectorized for the fast paths; only
slot placement with eviction falls back to a per-key loop.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mixing."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_STASH_MAX = 64


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 20, seed: int = 7):
        # buckets = next pow2 of capacity/SLOTS (target load ≤ ~0.95)
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.seed = np.uint64(seed)
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)  # 0 == empty
        self.count = 0
        # victim stash (Fan et al. §4): a failed kick chain would drop the
        # in-hand fingerprint — a FALSE NEGATIVE for a previously inserted
        # key. Stash (bucket_idx, fp) pairs instead; checked by contains/
        # delete. When the stash is full, inserts refuse up front (no
        # eviction attempted), so an inserted key is always findable.
        self.stash: list[tuple[int, int]] = []

    # -- hashing ----------------------------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix64(keys ^ self.seed) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix64(keys + np.uint64(0x9E3779B97F4A7C15)) & self.mask).astype(np.uint64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (idx ^ (_mix64(fp.astype(np.uint64)) & self.mask)) & self.mask

    # -- batch API --------------------------------------------------------
    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        out = hit1 | hit2
        # a stashed victim lives in one of ITS two valid buckets, so a
        # query matches when the fp agrees and the stash bucket is one of
        # the query key's buckets (stash is ≤ _STASH_MAX entries)
        for sidx, sfp in self.stash:
            out |= (fp == np.uint16(sfp)) & ((i1 == np.uint64(sidx)) | (i2 == np.uint64(sidx)))
        return out

    def insert_batch(self, keys: np.ndarray) -> np.ndarray:
        """Insert keys; returns bool array (False where the filter is full)."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        ok = np.ones(len(keys), dtype=bool)
        for j in range(len(keys)):
            ok[j] = self._insert_one(int(i1[j]), int(i2[j]), fp[j])
        return ok

    def _insert_one(self, i1: int, i2: int, fp: np.uint16) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        if len(self.stash) >= _STASH_MAX:
            # no room to absorb a failed kick chain's victim — refuse the
            # NEW key before evicting anything (no silent loss)
            return False
        # evict loop
        rng_state = np.uint64(i1) ^ np.uint64(fp)
        idx = i1
        cur = fp
        for _ in range(_MAX_KICKS):
            rng_state = _mix64(np.array([rng_state], dtype=np.uint64))[0]
            slot = int(rng_state & np.uint64(_SLOTS - 1))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(self._alt(np.array([idx], dtype=np.uint64), np.array([cur]))[0])
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        # kick chain exhausted: ``cur`` is some previously inserted key's
        # fingerprint (or the new one) — stash it so it stays findable
        self.stash.append((idx, int(cur)))
        self.count += 1
        return True

    def delete_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        out = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[idx]
                hits = np.nonzero(row == fp[j])[0]
                if len(hits):
                    row[hits[0]] = 0
                    self.count -= 1
                    out[j] = True
                    break
            if not out[j] and self.stash:
                for s, (sidx, sfp) in enumerate(self.stash):
                    if sfp == int(fp[j]) and sidx in (int(i1[j]), int(i2[j])):
                        del self.stash[s]
                        self.count -= 1
                        out[j] = True
                        break
        return out

    @property
    def load_factor(self) -> float:
        return self.count / (self.nbuckets * _SLOTS)

    # -- checkpoint serialization ----------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.nbuckets, int(self.seed), self.count], dtype=np.int64)
        stash = np.array(self.stash or [], dtype=np.int64).reshape(-1, 2)
        return header.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        header = np.frombuffer(blob[:24], dtype=np.int64)
        f = cls.__new__(cls)
        f.nbuckets = int(header[0])
        f.mask = np.uint64(f.nbuckets - 1)
        f.seed = np.uint64(header[1])
        f.count = int(header[2])
        table_end = 24 + f.nbuckets * _SLOTS * 2
        f.table = np.frombuffer(blob[24:table_end], dtype=np.uint16).reshape(f.nbuckets, _SLOTS).copy()
        # trailing stash pairs (absent in pre-stash checkpoints)
        tail = np.frombuffer(blob[table_end:], dtype=np.int64).reshape(-1, 2)
        f.stash = [(int(a), int(b)) for a, b in tail]
        return f
