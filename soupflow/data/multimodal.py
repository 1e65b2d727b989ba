"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches stages.

``mode="real"`` decodes PNG images, RIFF/PCM WAV audio, AND AVI video
(uncompressed BI_RGB DIB frames) with the from-scratch stdlib-only
codecs in :mod:`soupflow.data.codecs` (zlib inflate + scanline
unfilter; RIFF chunk walks) — no third-party codec library anywhere.
``mode="fake"`` (bench default) derives deterministic features from
the raw bytes so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is exercised without decode cost.

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


def image_payload_for_doc(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic closed-form RGB test image for doc ``doc_id``:
    pixel (x, y) = ((3x+5y+d) % 256, (x+2y+7d) % 256, (xy+11d) % 256),
    PNG-encoded with mixed per-scanline filters so decode exercises
    every unfilter branch. The pixel sums are exact SQL expressions —
    the multimodal_real oracle pins the decoder bit-for-bit."""
    from .codecs import png_encode
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(3 * x + 5 * y + doc_id) % 256,
                    (x + 2 * y + 7 * doc_id) % 256,
                    (x * y + 11 * doc_id) % 256],
                   axis=-1).astype(np.uint8)
    return png_encode(img, filter_mode="mixed")


def audio_payload_for_doc(doc_id: int, n: int,
                          rate: int = 16000) -> bytes:
    """Deterministic closed-form PCM: sample i =
    ((31d + 17i) % 65536) - 32768, WAV-encoded."""
    from .codecs import wav_encode
    i = np.arange(n, dtype=np.int64)
    samples = ((31 * doc_id + 17 * i) % 65536 - 32768).astype(np.int16)
    return wav_encode(samples, sample_rate=rate, channels=1)


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

    def _features_fake(self, payload: bytes) -> list[float]:
        """Deterministic fake features: byte histogram moments."""
        if not payload:
            return [0.0] * self.feature_dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % self.feature_dim,
                           minlength=self.feature_dim).astype(np.float64)
        return (hist / max(1, arr.size)).tolist()

    def _decode_real(self, payload: bytes, kind: str) -> list[float]:
        """Real decode via the from-scratch codecs: the feature vector
        is the normalized ``feature_dim``-bin histogram over DECODED
        sample bytes (pixels for PNG, |PCM|>>8 for WAV) — same shape
        as fake mode but sensitive to actual codec correctness."""
        from .codecs import png_decode, wav_decode
        if not payload:
            return [0.0] * self.feature_dim
        if kind == "image":
            vals = png_decode(payload).reshape(-1)
        elif kind == "audio":
            samples, _rate, _ch = wav_decode(payload)
            vals = (np.abs(samples.astype(np.int32)) >> 8) \
                .astype(np.uint8)
        elif kind == "video":
            from .codecs import avi_decode
            frames, _fps = avi_decode(payload)
            vals = frames.reshape(-1)
        else:
            raise NotImplementedError(
                f"real decode for kind={kind!r}: no codec")
        hist = np.bincount(vals % self.feature_dim,
                           minlength=self.feature_dim) \
            .astype(np.float64)
        return (hist / max(1, vals.size)).tolist()

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

    ``mode="real"`` decodes the PNG payload with the from-scratch
    codec, nearest-neighbor-resamples the pixel grid, and re-encodes;
    ``mode="fake"`` deterministically resamples the raw byte stream to
    ``target_w*target_h`` bytes by striding (no decode cost).
    """

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 mode: str = "fake") -> None:
        self.target_w = target_w
        self.target_h = target_h
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_out = self.target_w * self.target_h
        resized = []
        if self.mode == "real":
            from .codecs import (png_decode, png_encode,
                                 png_resize_nearest)
            for payload in payloads:
                img = png_decode(payload)
                small = png_resize_nearest(img, self.target_w,
                                           self.target_h)
                resized.append(png_encode(small, filter_mode="none"))
        else:
            for payload in payloads:
                data = payload or b"\x00"
                arr = np.frombuffer(data, dtype=np.uint8)
                idx = np.linspace(0, arr.size - 1,
                                  n_out).astype(np.int64)
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
    one output row per sampled frame (media_ref, frame_index,
    payload).

    ``mode="real"``: the payload is a real AVI container
    (uncompressed BI_RGB DIB frames) decoded by the from-scratch RIFF
    walker in data/codecs.py; ``n_frames`` frames are sampled evenly
    (source frame ``(i * total) // n_frames``) and each is re-encoded
    as a PNG payload — AVI decode → sample → PNG encode, all
    first-party. ``mode="fake"`` splits the raw byte stream into
    equal chunks (plumbing-only, no decode cost)."""

    def __init__(self, n_frames: int = 4, mode: str = "fake") -> None:
        self.n_frames = n_frames
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_refs, out_idx, out_frames = [], [], []
        if self.mode == "real":
            from .codecs import avi_decode, png_encode
            for ref, payload in zip(refs, payloads):
                frames, _fps = avi_decode(payload)
                total = frames.shape[0]
                for i in range(self.n_frames):
                    src = (i * total) // self.n_frames
                    out_refs.append(ref)
                    out_idx.append(i)
                    out_frames.append(
                        png_encode(frames[src], filter_mode="mixed"))
        else:
            for ref, payload in zip(refs, payloads):
                data = payload or b"\x00"
                step = max(1, len(data) // self.n_frames)
                for i in range(self.n_frames):
                    out_refs.append(ref)
                    out_idx.append(i)
                    out_frames.append(
                        data[i * step:(i + 1) * step] or b"\x00")
        return pa.table({
            "media_ref": pa.array(out_refs, pa.string()),
            "frame_index": pa.array(out_idx, pa.int32()),
            "payload": pa.array(out_frames, pa.binary()),
        })


def real_media_from_documents(batch: pa.Table) -> pa.Table:
    """Two REAL media rows per document — a PNG (closed-form pixels,
    mixed scanline filters) and a WAV (closed-form PCM) — so binary
    payloads flow through the object store and the decode stage runs
    the actual codecs. Dimensions derive from doc_id:
    w = 8 + d%8, h = 4 + d%5, n_samples = 64 + d%64."""
    doc_ids = batch.column("doc_id").to_pylist()
    refs, kinds, payloads, ctypes, ids = [], [], [], [], []
    for d in doc_ids:
        w, h, n = 8 + d % 8, 4 + d % 5, 64 + d % 64
        refs.append(f"media://img/{d}")
        kinds.append("image")
        payloads.append(image_payload_for_doc(d, w, h))
        ctypes.append("image/png")
        ids.append(d)
        refs.append(f"media://wav/{d}")
        kinds.append("audio")
        payloads.append(audio_payload_for_doc(d, n))
        ctypes.append("audio/wav")
        ids.append(d)
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "content_type": pa.array(ctypes, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
    })


class MediaStatsActor:
    """Real-decode stats stage: PNG → (width, height, per-channel
    pixel sums), WAV → (n_samples, sample_rate, sample sum / max).
    Every output is an exact integer, so a SQL oracle reproduces the
    whole decode bit-for-bit from the closed-form payload generators.
    Codecs load once per worker (__init__), batches decode in
    __call__."""

    def __init__(self) -> None:
        from .codecs import png_decode, wav_decode
        self._png_decode = png_decode
        self._wav_decode = wav_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        width, height = [], []
        sum_r, sum_g, sum_b = [], [], []
        n_samp, rate, amp_sum, amp_max = [], [], [], []
        for kind, payload in zip(kinds, payloads):
            if kind == "image":
                img = self._png_decode(payload).astype(np.int64)
                width.append(img.shape[1])
                height.append(img.shape[0])
                sums = img.sum(axis=(0, 1))
                sum_r.append(int(sums[0]))
                sum_g.append(int(sums[1]))
                sum_b.append(int(sums[2]))
                n_samp.append(0)
                rate.append(0)
                amp_sum.append(0)
                amp_max.append(0)
            else:
                samples, r, _ch = self._wav_decode(payload)
                s = samples.astype(np.int64)
                width.append(0)
                height.append(0)
                sum_r.append(0)
                sum_g.append(0)
                sum_b.append(0)
                n_samp.append(int(s.size))
                rate.append(int(r))
                amp_sum.append(int(s.sum()))
                amp_max.append(int(s.max()) if s.size else 0)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "sum_r": pa.array(sum_r, pa.int64()),
            "sum_g": pa.array(sum_g, pa.int64()),
            "sum_b": pa.array(sum_b, pa.int64()),
            "n_samples": pa.array(n_samp, pa.int64()),
            "sample_rate": pa.array(rate, pa.int64()),
            "amp_sum": pa.array(amp_sum, pa.int64()),
            "amp_max": pa.array(amp_max, pa.int64()),
        })


def video_payload_for_doc(doc_id: int) -> bytes:
    """Deterministic closed-form RGB video: nf = 4 + d%4 frames of
    (h = 4 + d%3, w = 5 + d%5); pixel (t, y, x) =
    ((x + 2y + 3t + d) % 256, (2x + y + 5t + 2d) % 256,
    (x*y + t + 7d) % 256), AVI-encoded (uncompressed DIB — bottom-up
    BGR padded rows, so decode must undo the layout exactly)."""
    from .codecs import avi_encode
    nf, h, w = 4 + doc_id % 4, 4 + doc_id % 3, 5 + doc_id % 5
    t, y, x = np.mgrid[0:nf, 0:h, 0:w]
    frames = np.stack([(x + 2 * y + 3 * t + doc_id) % 256,
                       (2 * x + y + 5 * t + 2 * doc_id) % 256,
                       (x * y + t + 7 * doc_id) % 256],
                      axis=-1).astype(np.uint8)
    return avi_encode(frames, fps=10)


def video_media_from_documents(batch: pa.Table) -> pa.Table:
    """One real AVI payload per document."""
    doc_ids = batch.column("doc_id").to_pylist()
    return pa.table({
        "media_ref": pa.array([f"media://vid/{d}" for d in doc_ids],
                              pa.string()),
        "kind": pa.array(["video"] * len(doc_ids), pa.string()),
        "payload": pa.array([video_payload_for_doc(d)
                             for d in doc_ids], pa.binary()),
        "content_type": pa.array(["video/x-msvideo"] * len(doc_ids),
                                 pa.string()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


class FrameStatsActor:
    """Decode sampled-frame PNG payloads → exact integer stats
    (height, width, per-channel pixel sums). Chained after
    FrameSampleActor(mode="real"), this oracle-pins the whole
    AVI decode → frame sample → PNG encode → PNG decode chain."""

    def __init__(self) -> None:
        from .codecs import png_decode
        self._decode = png_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        idx = batch.column("frame_index").to_pylist()
        payloads = batch.column("payload").to_pylist()
        h_, w_, sr, sg, sb = [], [], [], [], []
        for p in payloads:
            img = self._decode(p).astype(np.int64)
            h_.append(img.shape[0])
            w_.append(img.shape[1])
            s = img.sum(axis=(0, 1))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_index": pa.array(
                [int(i) for i in idx], pa.int64()),
            "height": pa.array(h_, pa.int64()),
            "width": pa.array(w_, pa.int64()),
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64()),
        })
