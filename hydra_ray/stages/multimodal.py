"""Multimodal (binary) column plumbing: fetch → decode → features.

Media payloads are opaque ``binary`` columns with typed metadata
(media_ref, media_type, n_bytes). The Ray-side plumbing — schema,
actor-pool signature, batch sizing for large payloads — is real and
tested; the actual codec work is stubbed because no image/audio
libraries exist in this container:

  - ``MediaFetcher``   : media_ref → deterministic synthetic bytes
                         (stands in for the S3/HTTP blob fetch)
  - ``decode_image``   : raises NotImplementedError unless a decoder
                         callback is injected (the real deployment
                         plugs Pillow/ffmpeg here)
  - ``MediaFeatures``  : byte-histogram + size features (vectorized,
                         deterministic — the stand-in for a real
                         feature extractor / embedding model)

Batches are kept small (MEDIA_BATCH_SIZE) so payload_bytes × batch ×
concurrency stays inside a worker heap — the knob that matters for
real image/video payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_BATCH_SIZE = 64  # small on purpose: payloads are wide rows


def synthetic_media_bytes(media_ref: str, max_bytes: int = 4096) -> bytes:
    digest = hashlib.md5(media_ref.encode("utf-8", "surrogateescape")).digest()
    size = 256 + digest[0] * 13
    reps = -(-min(size, max_bytes) // 16)
    return (digest * reps)[: min(size, max_bytes)]


class MediaFetcher:
    """Actor-pool stage: media_ref → (media_ref, media_type, payload)."""

    def __init__(self, max_bytes: int = 4096):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = [synthetic_media_bytes(r or "", self.max_bytes) for r in refs]
        types = ["image/synthetic"] * len(refs)
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "media_type": pa.array(types, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def decode_image(payload: bytes, decoder=None):
    """STUB: decode an image payload to HxWxC. The container has no
    imaging library; inject ``decoder`` (e.g. PIL.Image.open) in a real
    deployment."""
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an injected decoder (no imaging libs in sandbox)"
        )
    return decoder(payload)


class MediaFeatures:
    """Actor-pool stage: payload → deterministic feature vector
    (n_bytes + 8-bucket byte histogram). Stand-in for model inference;
    the batch/actor shape is identical to a real embedding stage."""

    N_BUCKETS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        n_bytes = np.zeros(n, dtype=np.int64)
        hist = np.zeros((n, self.N_BUCKETS), dtype=np.float32)
        for i, p in enumerate(payloads):
            buf = np.frombuffer(p or b"", dtype=np.uint8)
            n_bytes[i] = len(buf)
            if len(buf):
                counts, _ = np.histogram(buf, bins=self.N_BUCKETS, range=(0, 256))
                hist[i] = counts / len(buf)
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(hist.reshape(-1), type=pa.float32()), self.N_BUCKETS
        )
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "n_bytes": pa.array(n_bytes),
                "features": feat,
            }
        )
