"""Sliding-window document chunking (training context windows).

Splitting long documents into fixed-size overlapping character windows
is the standard pre-tokenization step for pretraining pipelines (every
doc contributes ceil((n-W)/S)+1 chunks of W chars at stride S). The
operator is pure map-side — zero shuffle at any corpus size — and the
chunk geometry is closed-form in the character length, so the whole
transform is SQL-expressible for the DuckDB oracle (queries.py
``chunk_docs``).

Vectorization shape: one ``pc.utf8_length`` per batch, then ONE Arrow
``utf8_slice_codeunits`` kernel call per chunk ORDINAL (bounded by the
longest doc in the batch, not the row count) over the rows still long
enough — no per-row Python. Offsets are Unicode code points on both
sides (Arrow slice_codeunits == DuckDB substring semantics, verified
on non-ASCII).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_count(n_chars: np.ndarray, window: int,
                stride: int) -> np.ndarray:
    """Chunks per doc: 1 for n <= window, else ceil((n-W)/S) + 1.
    (Every doc yields at least one chunk, including empty text.)"""
    extra = np.maximum(n_chars - window, 0)
    return 1 + (extra + stride - 1) // stride


def chunk_docs(ds, window: int = 200, stride: int = 150,
               text_col: str = "text", id_col: str = "doc_id"):
    """documents → (doc_id, chunk_idx, chunk_start, chunk_text):
    chunk i covers code points [i*stride, i*stride + window). The last
    chunk may be short; overlap requires stride < window."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def emit(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = pc.utf8_length(texts).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts = chunk_count(n, window, stride)
        max_chunks = int(counts.max()) if counts.size else 0
        out_id, out_idx, out_start, out_text = [], [], [], []
        for j in range(max_chunks):
            alive = np.flatnonzero(counts > j)
            start = j * stride
            sliced = pc.utf8_slice_codeunits(
                texts.take(pa.array(alive)), start, start + window)
            out_id.append(ids[alive])
            out_idx.append(np.full(alive.size, j, dtype=np.int64))
            out_start.append(
                np.full(alive.size, start, dtype=np.int64))
            out_text.append(sliced)
        if not out_id:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_start": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "chunk_idx": pa.array(np.concatenate(out_idx), pa.int64()),
            "chunk_start": pa.array(np.concatenate(out_start),
                                    pa.int64()),
            "chunk_text": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_text]),
        })
    emit.__name__ = f"chunk_w{window}_s{stride}"

    return ds.map_batches(emit, batch_format="pyarrow")
