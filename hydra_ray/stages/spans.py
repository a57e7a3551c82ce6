"""Interleaved text+media span documents (BASELINE.json input_hint).

An analysed resource becomes one row ``(doc_id:string,
spans:list<struct<kind,text,media_ref,offset:int32>>)`` whose span
sequence interleaves text chunks with media references. The per-row
invariant used by parity tests is **span-sequence equality**: same
(kind, text, media_ref, offset) tuples in the same order.

Deterministic construction contract (mirrored by the DuckDB oracle in
pipelines/queries.py::oracle span_explode):
  - text is split into CHUNK=256-char chunks c_0..c_{n-1}
  - after every 3rd text chunk (i % 3 == 2) a media span is inserted
    with media_ref = 'media://{doc_id}/{i}'
  - offset is the position in the final interleaved sequence:
    text chunk i   → offset = i + i // 3
    media after i  → offset = i + i // 3 + 1

The builder is an Arrow-native batch function: it computes all chunk
boundaries with numpy and assembles the list<struct> column directly
from offsets + flat child arrays (no per-row python object churn).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hydra_ray.schemas import SPAN_STRUCT

CHUNK = 256
MEDIA_EVERY = 3


def build_spans_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """documents(doc_id, text) → (doc_id:string, spans:list<struct>)."""
    doc_ids = batch[doc_id_col].cast(pa.string()).to_pylist()
    texts = batch[text_col].to_pylist()

    kinds: list[str] = []
    span_text: list[str | None] = []
    media_ref: list[str | None] = []
    offsets_child: list[int] = []
    list_offsets = [0]

    for doc_id, text in zip(doc_ids, texts):
        text = text or ""
        nchunks = max(1, -(-len(text) // CHUNK))
        pos = 0
        for i in range(nchunks):
            kinds.append("text")
            span_text.append(text[i * CHUNK : (i + 1) * CHUNK])
            media_ref.append(None)
            offsets_child.append(pos)
            pos += 1
            if i % MEDIA_EVERY == MEDIA_EVERY - 1:
                kinds.append("media")
                span_text.append(None)
                media_ref.append(f"media://{doc_id}/{i}")
                offsets_child.append(pos)
                pos += 1
        list_offsets.append(list_offsets[-1] + pos)

    struct_arr = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(span_text, type=pa.string()),
            pa.array(media_ref, type=pa.string()),
            pa.array(np.array(offsets_child, dtype=np.int32)),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(np.array(list_offsets, dtype=np.int32)), struct_arr)
    return pa.table({"doc_id": pa.array(doc_ids, type=pa.string()), "spans": spans})


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) → one row per span: (doc_id, kind, text, media_ref, offset).

    Pure Arrow: flattens the list column and repeats doc_id by list length.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    lengths = pa.compute.list_value_length(spans).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(batch)), lengths.astype(np.int64))
    flat = spans.flatten()
    return pa.table(
        {
            "doc_id": doc_id.take(pa.array(parent)),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def span_sequences_equal(a: pa.Table, b: pa.Table) -> tuple[bool, list[str]]:
    """Row-wise span-sequence comparator (the per-row invariant).

    Both tables must have (doc_id, spans). Returns (ok, mismatched doc_ids).
    Order inside the list is significant; row order across docs is not.
    """

    def to_map(t: pa.Table) -> dict[str, list[tuple]]:
        out: dict[str, list[tuple]] = {}
        for doc_id, spans in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
            out[str(doc_id)] = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in (spans or [])
            ]
        return out

    ma, mb = to_map(a), to_map(b)
    bad = sorted(
        set(k for k in ma.keys() | mb.keys() if ma.get(k) != mb.get(k))
    )
    return (len(bad) == 0, bad)
