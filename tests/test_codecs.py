"""From-scratch PNG/WAV codec tests: round-trip properties, spec
known-answer vectors, malformed-input failures. The end-to-end decode
correctness is additionally oracle-pinned by the multimodal_real query
(closed-form pixel/sample sums reproduced in SQL)."""

import struct
import zlib

import numpy as np
import pytest

from soupflow.data.codecs import (_paeth, png_decode, png_encode,
                                  png_resize_nearest, wav_decode,
                                  wav_encode)


def test_png_roundtrip_all_shapes_and_filters():
    rng = np.random.RandomState(0)
    for _ in range(60):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        ch = int(rng.choice([1, 3, 4]))
        img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        for fm in ("none", "mixed"):
            assert np.array_equal(png_decode(png_encode(img, fm)), img)


def test_png_grayscale_2d_input():
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    out = png_decode(png_encode(img, "mixed"))
    assert out.shape == (5, 6, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_paeth_matches_spec_pseudocode():
    def ref(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc:
            return a
        return b if pb <= pc else c
    for a in range(0, 256, 15):
        for b in range(0, 256, 15):
            for c in range(0, 256, 15):
                got = _paeth(np.array([a], np.uint8),
                             np.array([b], np.uint8),
                             np.array([c], np.uint8))[0]
                assert got == ref(a, b, c)


def test_png_known_answer_filter_bytes():
    """Hand-computed spec vectors: row0 filter 0 passes raw bytes, row1
    filter 1 (Sub) stores deltas to the left pixel."""
    img = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    data = png_encode(img, filter_mode="mixed")
    pos, idat = 8, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        if data[pos + 4:pos + 8] == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        pos += 12 + length
    assert zlib.decompress(idat) == bytes([0, 10, 20, 1, 30, 10])


def test_png_rejects_malformed():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = png_encode(img)
    with pytest.raises(ValueError):
        png_decode(b"notapng" + good)
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF          # flip a byte inside IHDR -> bad CRC
    with pytest.raises(ValueError):
        png_decode(bytes(corrupted))


def test_png_resize_nearest_mapping():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = png_resize_nearest(img, 3, 2)
    assert np.array_equal(out, img[[0, 2]][:, [0, 2, 4]])


def test_wav_roundtrip_and_chunk_walk():
    rng = np.random.RandomState(1)
    for _ in range(20):
        n, ch = rng.randint(1, 400), int(rng.choice([1, 2]))
        s = rng.randint(-32768, 32768, size=n * ch).astype(np.int16)
        back, rate, ch2 = wav_decode(wav_encode(s, 22050, ch))
        assert (rate, ch2) == (22050, ch)
        assert np.array_equal(back, s)


def test_wav_odd_length_extra_chunk_word_alignment():
    """RIFF chunks are word-aligned: an odd-length chunk before data
    must not desync the walk."""
    s = np.array([1, -2, 3], dtype=np.int16)
    data = wav_encode(s, 8000, 1)
    # splice an odd-length LIST chunk after fmt
    fmt_end = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    back, rate, ch = wav_decode(spliced)
    assert np.array_equal(back, s) and rate == 8000 and ch == 1


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        wav_decode(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_avi_roundtrip_and_row_padding():
    rng = np.random.RandomState(3)
    from soupflow.data.codecs import avi_decode, avi_encode
    for _ in range(30):
        n, h, w = rng.randint(1, 8), rng.randint(1, 14), rng.randint(1, 14)
        frames = rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        back, fps = avi_decode(avi_encode(frames, fps=12))
        assert fps == 12
        assert np.array_equal(back, frames)  # odd w exercises padding


def test_avi_dib_layout_spec():
    """The DIB frame bytes must be BOTTOM-UP, BGR, 4-byte padded —
    verify against a hand-computed 1-frame 2x2 vector."""
    from soupflow.data.codecs import avi_encode
    frame = np.array([[[[1, 2, 3], [4, 5, 6]],
                       [[7, 8, 9], [10, 11, 12]]]], dtype=np.uint8)
    data = avi_encode(frame, fps=10)
    i = data.index(b"00db")
    (length,) = struct.unpack("<I", data[i + 4:i + 8])
    dib = data[i + 8:i + 8 + length]
    # bottom row first, BGR per pixel, 2*3=6 bytes padded to 8
    assert dib == bytes([9, 8, 7, 12, 11, 10, 0, 0,
                         3, 2, 1, 6, 5, 4, 0, 0])


def test_avi_rejects_malformed():
    from soupflow.data.codecs import avi_decode, avi_encode
    with pytest.raises(ValueError):
        avi_decode(b"RIFF\x00\x00\x00\x00WAVE")
    good = avi_encode(np.zeros((1, 2, 2, 3), np.uint8))
    # strip the avih header -> frame before header must fail
    with pytest.raises(ValueError):
        avi_decode(good.replace(b"avih", b"xxxx"))


def test_decoders_survive_garbage_and_truncation():
    """Random garbage and truncated real payloads must raise ValueError
    (or decode to something) quickly — never hang or segfault. zlib
    errors surface as ValueError-compatible exceptions."""
    import zlib

    from soupflow.data.codecs import (avi_decode, avi_encode,
                                      png_decode, png_encode,
                                      wav_decode, wav_encode)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    real = {
        "png": png_encode(img, "mixed"),
        "wav": wav_encode(np.arange(50, dtype=np.int16), 8000, 1),
        "avi": avi_encode(img[None, ...], fps=5),
    }
    decoders = {"png": png_decode, "wav": wav_decode,
                "avi": avi_decode}
    for name, dec in decoders.items():
        # pure garbage
        for _ in range(50):
            blob = rng.bytes(rng.randint(0, 200))
            try:
                dec(blob)
            except (ValueError, zlib.error, struct.error):
                pass
        # truncations of a real payload keep the magic but break the
        # body at every prefix length
        data = real[name]
        for cut in range(0, len(data), max(1, len(data) // 40)):
            try:
                dec(data[:cut])
            except (ValueError, zlib.error, struct.error):
                pass
        # random single-byte corruption
        for _ in range(60):
            b = bytearray(data)
            b[rng.randint(len(b))] ^= 1 + rng.randint(255)
            try:
                dec(bytes(b))
            except (ValueError, zlib.error, struct.error):
                pass
