"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL / torchaudio / pyav) are NOT in this
container, so the actual codec step is stubbed: ``decode=` "real"``
raises NotImplementedError with the integration point documented, and
``decode="fake"`` (default here, used by tests/bench) derives
deterministic features from the raw bytes so the full Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and exercised end-to-end.

Scale notes: binary payloads dominate block size; use small
``batch_size`` (e.g. 16-32) so batch × concurrency fits worker heaps,
and let the object store spill. Feature outputs are fixed-width
list<float> columns, friendly to downstream ANN stages.

CPU-sizing rule: never CHAIN fixed-size actor pools whose combined
concurrency equals the cluster CPUs — the pools pin every CPU and the
upstream read/task stage starves (observed deadlock). Leave headroom,
use autoscaling ``(1, n)`` pools, or materialize between pool stages.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),            # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("content_type", pa.string()),
])

FEATURE_DIM = 16


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


class MediaDecodeActor:
    """Actor-pool decode / feature-extract stage.

    __init__ loads the (stubbed) codec once per worker; __call__
    processes one Arrow batch of binary payloads into fixed-width
    feature vectors + metadata.
    """

    def __init__(self, mode: str = "fake",
                 feature_dim: int = FEATURE_DIM,
                 target_size: Optional[tuple[int, int]] = None) -> None:
        self.mode = mode
        self.feature_dim = feature_dim
        self.target_size = target_size
        if mode == "real":
            self.pil = _try_import_pil()
            if self.pil is None:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/pyav, which "
                    "are not in this container; integration point: "
                    "MediaDecodeActor._decode_real")
        else:
            self.pil = None

    def _features_fake(self, payload: bytes) -> list[float]:
        """Deterministic fake features: byte histogram moments."""
        if not payload:
            return [0.0] * self.feature_dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % self.feature_dim,
                           minlength=self.feature_dim).astype(np.float64)
        return (hist / max(1, arr.size)).tolist()

    def _decode_real(self, payload: bytes,
                     kind: str) -> list[float]:  # pragma: no cover
        raise NotImplementedError("codec libs absent in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats, sizes = [], []
        for payload, kind in zip(payloads, kinds):
            data = payload or b""
            sizes.append(len(data))
            if self.mode == "real":
                feats.append(self._decode_real(data, kind))
            else:
                feats.append(self._features_fake(data))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "features": pa.array(feats, pa.list_(pa.float32(),
                                                 FEATURE_DIM))
            if all(len(f) == FEATURE_DIM for f in feats)
            else pa.array(feats, pa.list_(pa.float32())),
        })


def media_table_from_documents(batch: pa.Table) -> pa.Table:
    """Derive a deterministic media table from the documents table:
    payload = utf-8 text bytes (stand-in binary), one row per doc."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    return pa.table({
        "media_ref": pa.array([f"media://doc/{d}" for d in doc_ids],
                              pa.string()),
        "kind": pa.array(["image"] * len(doc_ids), pa.string()),
        "payload": pa.array([(t or "").encode() for t in texts],
                            pa.binary()),
        "content_type": pa.array(["image/fake"] * len(doc_ids),
                                 pa.string()),
        "doc_id": batch.column("doc_id"),
    })


class MediaResizeActor:
    """Actor-pool resize stage (images): emits a resized payload plus
    the recorded output dimensions.

    ``mode="real"`` is the PIL integration point (absent here →
    NotImplementedError); ``mode="fake"`` deterministically resamples
    the byte stream to ``target_w*target_h`` bytes by striding, so
    batch sizing / schema / memory behavior are exercised for real.
    """

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 mode: str = "fake") -> None:
        self.target_w = target_w
        self.target_h = target_h
        self.mode = mode
        if mode == "real" and _try_import_pil() is None:
            raise NotImplementedError(
                "real resize needs PIL; integration point: "
                "MediaResizeActor.__call__")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_out = self.target_w * self.target_h
        resized = []
        for payload in payloads:
            data = payload or b"\x00"
            arr = np.frombuffer(data, dtype=np.uint8)
            idx = np.linspace(0, arr.size - 1, n_out).astype(np.int64)
            resized.append(arr[idx].tobytes())
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload",
                                pa.array(resized, pa.binary()))
        out = out.append_column(
            "width", pa.array([self.target_w] * len(resized), pa.int32()))
        return out.append_column(
            "height", pa.array([self.target_h] * len(resized),
                               pa.int32()))


class FrameSampleActor:
    """Actor-pool frame-sampling stage (videos): 1→N row expansion —
    each payload is split into ``n_frames`` equal chunks, one output
    row per frame with (media_ref, frame_index, payload). The real
    codec (pyav) plugs into _sample_real."""

    def __init__(self, n_frames: int = 4, mode: str = "fake") -> None:
        self.n_frames = n_frames
        self.mode = mode
        if mode == "real":
            raise NotImplementedError(
                "real frame sampling needs pyav; integration point: "
                "FrameSampleActor._sample_real")

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_refs, out_idx, out_frames = [], [], []
        for ref, payload in zip(refs, payloads):
            data = payload or b"\x00"
            step = max(1, len(data) // self.n_frames)
            for i in range(self.n_frames):
                out_refs.append(ref)
                out_idx.append(i)
                out_frames.append(data[i * step:(i + 1) * step] or b"\x00")
        return pa.table({
            "media_ref": pa.array(out_refs, pa.string()),
            "frame_index": pa.array(out_idx, pa.int32()),
            "payload": pa.array(out_frames, pa.binary()),
        })
