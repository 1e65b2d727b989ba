"""From-scratch, stdlib-only media codecs: PNG and WAV (RIFF/PCM).

No PIL / libpng / libsndfile in this container, so the real decode
path is implemented directly from the public specs:

 * PNG — W3C PNG spec (RFC 2083): signature, chunked layout
   (IHDR/IDAT/IEND, CRC-32 verified), zlib-inflated IDAT stream, and
   the five scanline filters (None/Sub/Up/Average/Paeth) undone per
   the spec's byte-predictor definitions. 8-bit greyscale (1ch),
   RGB (3ch) and RGBA (4ch) — the shapes the pipeline produces.
 * WAV — RIFF container with a PCM ``fmt `` chunk and a ``data``
   chunk; 16-bit little-endian samples, any channel count.

Both directions (encode for fixture/payload generation, decode for
the actor-pool real mode) so the pipeline round-trips without any
third-party dependency, and the encoder can vary the PNG filter type
per scanline to force every unfilter branch through the decoder.

The reference engine treats media refs as opaque attributes
(reference: Sources/Element.swift absUrl handling); the decode stage
itself is this repo's training-pipeline extension per SURVEY.md §2.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → channels (8-bit depth only)
_CTYPE_TO_CH = {0: 1, 2: 3, 6: 4}
_CH_TO_CTYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6) vectorized over int16+ inputs."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_encode(img: np.ndarray, filter_mode: str = "mixed") -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array as a PNG.

    ``filter_mode``: "none" (filter 0 everywhere) or "mixed"
    (scanline y uses filter y % 5 — exercises every decoder branch)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _CH_TO_CTYPE:
        raise ValueError(f"unsupported channel count {ch}")
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        line = arr[y]                       # (w, ch)
        ft = 0 if filter_mode == "none" else y % 5
        flat = line.reshape(-1)
        if ft == 0:
            enc = flat
        else:
            left = np.zeros_like(line)
            left[1:] = line[:-1]
            up = prev
            upleft = np.zeros_like(prev)
            upleft[1:] = prev[:-1]
            if ft == 1:                     # Sub
                enc = (line.astype(np.int16) - left).astype(
                    np.uint8).reshape(-1)
            elif ft == 2:                   # Up
                enc = (line.astype(np.int16) - up).astype(
                    np.uint8).reshape(-1)
            elif ft == 3:                   # Average
                avg = ((left.astype(np.int16) + up.astype(np.int16))
                       // 2)
                enc = (line.astype(np.int16) - avg).astype(
                    np.uint8).reshape(-1)
            else:                           # Paeth
                pred = _paeth(left.reshape(-1), up.reshape(-1),
                              upleft.reshape(-1))
                enc = (line.reshape(-1).astype(np.int16)
                       - pred).astype(np.uint8)
        raw.append(ft)
        raw.extend(enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_TO_CTYPE[ch], 0, 0, 0)
    return (_PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, ch) uint8 array.

    Supports 8-bit greyscale / RGB / RGBA, non-interlaced, with all
    five scanline filters. CRC-verified chunk walk; multiple IDAT
    chunks are concatenated per the spec."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = ch = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CTYPE_TO_CH:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            ch = _CTYPE_TO_CH[ctype]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=base + 1).copy()
        if ft == 0:
            pass
        elif ft == 2:                       # Up — vectorized
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth have a serial dependency on the
            # reconstructed left pixel — walk pixel groups (ch bytes
            # at a time, vectorized across channels)
            rec = line.astype(np.int16)
            for x in range(0, stride, ch):
                left = rec[x - ch:x] if x else np.zeros(ch, np.int16)
                up = prev[x:x + ch].astype(np.int16)
                if ft == 1:
                    rec[x:x + ch] = (rec[x:x + ch] + left) & 0xFF
                elif ft == 3:
                    rec[x:x + ch] = (rec[x:x + ch]
                                     + (left + up) // 2) & 0xFF
                else:
                    upleft = prev[x - ch:x].astype(np.int16) if x \
                        else np.zeros(ch, np.int16)
                    pred = _paeth(left.astype(np.uint8),
                                  up.astype(np.uint8),
                                  upleft.astype(np.uint8))
                    rec[x:x + ch] = (rec[x:x + ch] + pred) & 0xFF
            line = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = line.reshape(w, ch)
        prev = line
    return out


def png_resize_nearest(img: np.ndarray, out_w: int,
                       out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (h, w, ch) → (out_h, out_w, ch):
    deterministic integer source-index mapping (floor(i * in / out))."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


# -- WAV (RIFF / PCM) --------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """Encode int16 PCM samples (interleaved if multichannel) as a
    RIFF/WAVE file."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a RIFF/WAVE file → (int16 sample array, sample_rate,
    channels). Walks chunks per the RIFF spec (word-aligned); only
    PCM (format tag 1), 16-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = -1
    pcm = b""
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = \
                struct.unpack("<HHIIHH", payload[:16])
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format {fmt_tag}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)    # chunks are word-aligned
    if rate < 0:
        raise ValueError("missing fmt chunk")
    return np.frombuffer(pcm, dtype="<i2").copy(), rate, channels


# -- AVI (RIFF container, uncompressed BI_RGB video) --------------------------

def _bmp_rows(frame: np.ndarray) -> bytes:
    """One uncompressed DIB frame per the BMP/AVI spec: rows stored
    BOTTOM-UP, pixels BGR, each row zero-padded to a 4-byte boundary."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    row_bytes = frame[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    if stride == w * 3:
        return row_bytes.tobytes()
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, :w * 3] = row_bytes
    return padded.tobytes()


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a minimal spec-valid
    AVI: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    LIST('movi' '00db'*n)). Uncompressed BI_RGB 24bpp DIB frames."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, ch = frames.shape
    if ch != 3:
        raise ValueError("avi_encode expects RGB frames")
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack("<IIIIIIIIIIIIII",
                       usec_per_frame, frame_size * fps, 0, 0x10,
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0)
            + struct.pack("<HHHH", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_size, 0, 0, 0, 0)
    strl = b"strl" + _chunk_le(b"strh", strh) + _chunk_le(b"strf", strf)
    hdrl = (b"hdrl" + _chunk_le(b"avih", avih)
            + _chunk_le(b"LIST", strl))
    movi = b"movi" + b"".join(
        _chunk_le(b"00db", _bmp_rows(f)) for f in frames)
    body = (b"AVI " + _chunk_le(b"LIST", hdrl)
            + _chunk_le(b"LIST", movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk_le(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF word alignment
    return tag + struct.pack("<I", len(payload)) + payload + pad


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a minimal AVI → ((n, h, w, 3) uint8 RGB frames, fps).
    RIFF chunk walk; reads dimensions from the avih header and
    un-flips the bottom-up BGR padded DIB rows."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = fps = -1
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, fps
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            payload = buf[pos + 8:pos + 8 + length]
            if tag == b"LIST":
                walk(payload[4:])           # skip the list type tag
            elif tag == b"avih":
                vals = struct.unpack("<IIIIIIIIIIIIII", payload[:56])
                fps = 1_000_000 // vals[0] if vals[0] else 0
                w, h = vals[8], vals[9]
            elif tag == b"00db":
                if w < 0:
                    raise ValueError("frame before avih header")
                stride = (w * 3 + 3) & ~3
                rows = np.frombuffer(payload, dtype=np.uint8,
                                     count=stride * h) \
                    .reshape(h, stride)[:, :w * 3]
                frames.append(
                    rows.reshape(h, w, 3)[::-1, :, ::-1].copy())
            pos += 8 + length + (length & 1)

    walk(data[12:])
    if w < 0:
        raise ValueError("missing avih header")
    return (np.stack(frames) if frames
            else np.zeros((0, h, w, 3), np.uint8)), fps
