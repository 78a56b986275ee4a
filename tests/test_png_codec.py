"""Dependency-free PNG codec: round trips, the full 5-filter unfilter
algebra (against a reference forward-filter implemented here), and the
fail-loud contract on unsupported features.  No Spark needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_estimator_spark.operators.multimodal import (
    _chunk,
    _PNG_SIG,
    decode_png,
    encode_png,
)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (4, 9, 4), (1, 1, 3), (3, 1)])
def test_round_trip(shape):
    img = _rng(hash(shape) % 2**32).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert (out == img).all()


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference forward filter (the spec's encoder side) so the decoder's
    unfilter can be tested on every filter type, not just the 0 our
    encoder emits."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(int(v) for v in out)
        prev = line
    return bytes(raw)


def _png_from_raw(w, h, color_type, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_unfilter_every_type(filters):
    img = _rng(sum(filters) + 11).integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    data = _png_from_raw(6, 9, 2, _forward_filter(img, filters))
    out = decode_png(data)
    assert (out == img).all()


def test_fail_loud_on_unsupported():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JFIF" + good)
    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)


def test_spec_validity_crc_and_sig():
    """Encoded files are spec-valid: signature, chunk CRCs, IEND last."""
    data = encode_png(_rng(3).integers(0, 256, size=(5, 4, 3), dtype=np.uint8))
    assert data[:8] == _PNG_SIG
    pos, tags = 8, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF)
        tags.append(tag)
        pos += 12 + length
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"


# ---------------------------------------------------------------------------
# WAV + Y4M codecs (same retire-the-stub pattern as PNG)
# ---------------------------------------------------------------------------

from flink_estimator_spark.operators.multimodal import (
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
)


@pytest.mark.parametrize("shape", [(100,), (64, 2), (1, 1), (7, 3)])
def test_wav_round_trip(shape):
    s = _rng(sum(shape)).integers(-(2**15), 2**15, size=shape, dtype=np.int16)
    rate, frames = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    expect = s[:, None] if s.ndim == 1 else s
    assert frames.shape == expect.shape
    assert (frames == expect).all()


def test_wav_fail_loud():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # format tag 3 (IEEE float) must be rejected, not misread
    import struct as _s

    fmt = _s.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt + b"data" + _s.pack("<I", 0)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)


def test_wav_odd_chunk_alignment():
    """RIFF chunks are word-aligned: an odd-length extra chunk before
    data must not desynchronize the parser."""
    import struct as _s

    s = np.arange(5, dtype=np.int16)
    good = encode_wav(s)
    # splice an odd-length LIST chunk between fmt and data
    fmt_end = good.index(b"data")
    odd = b"LIST" + _s.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    patched = good[:fmt_end] + odd + good[fmt_end:]
    patched = patched[:4] + _s.pack("<I", len(patched) - 8) + patched[8:]
    rate, frames = decode_wav(patched)
    assert (frames[:, 0] == s).all()


@pytest.mark.parametrize("n,h,w", [(1, 2, 3), (4, 6, 8), (0, 2, 2)])
def test_y4m_round_trip(n, h, w):
    frames = _rng(n * h * w + 1).integers(0, 256, size=(n, h, w), dtype=np.uint8)
    out = decode_y4m(encode_y4m(frames))
    assert out.shape == (n, h, w)
    assert (out == frames).all()


def test_y4m_fail_loud():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....\n")
    with pytest.raises(ValueError, match="unsupported y4m chroma"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\n")
    # default chroma (no C tag) is C420 — unimplemented, must refuse
    with pytest.raises(ValueError, match="unsupported y4m chroma"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1\n")


# ---------------------------------------------------------------------------
# aHash over decoded pixels
# ---------------------------------------------------------------------------

from flink_estimator_spark.operators.multimodal import ahash_from_image


def test_ahash_known_pattern():
    """Half-dark / half-bright image: exactly the bright half's 32 block
    bits set (threshold sits between the two levels)."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 200  # right half bright -> blocks 4..7 of each row
    h = ahash_from_image(img)
    expect = 0
    for row in range(8):
        for col in range(4, 8):
            expect |= 1 << (row * 8 + col)
    assert h == expect
    assert bin(h).count("1") == 32


def test_ahash_invariant_to_brightness_shift():
    """Adding a constant to every pixel must not change the sign pattern
    (the defining perceptual-hash property)."""
    rng = _rng(42)
    img = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    shifted = (img.astype(np.int16) + 55).clip(0, 255).astype(np.uint8)
    assert ahash_from_image(img) == ahash_from_image(shifted)


def test_ahash_rejects_wrong_shape():
    with pytest.raises(ValueError, match="expected"):
        ahash_from_image(np.zeros((12, 16, 3), dtype=np.uint8))


def test_truncated_payloads_raise_valueerror_everywhere():
    """Fail-loud contract for MALFORMED input across the three container
    decoders (the JPEG codec has its own every-prefix net): PNG and WAV
    must raise ValueError on EVERY proper prefix — a short prefix must
    never surface IndexError/struct.error/zlib.error, silently drop audio
    frames (a truncated RIFF data chunk once returned half the samples),
    or accept a stream missing its IEND/CRC tail.  y4m is a STREAM format
    with no declared frame count, so prefixes ending exactly at a frame
    boundary are complete streams by construction — every mid-frame or
    mid-header cut must still raise."""
    img = (np.arange(64, dtype=np.int64) * 3 % 256).reshape(8, 8).astype(np.uint8)
    png = encode_png(img)
    for cut in range(1, len(png) - 1):
        with pytest.raises(ValueError):
            decode_png(png[:cut])

    wav = encode_wav((np.arange(32) % 100).astype(np.int16).reshape(-1, 1), 8000)
    for cut in range(1, len(wav) - 1):
        with pytest.raises(ValueError):
            decode_wav(wav[:cut])

    frames = np.stack([img, img.T])
    y4m = encode_y4m(frames)
    header_len = y4m.index(b"\n") + 1
    frame_len = len(b"FRAME\n") + img.size
    boundaries = {header_len + i * frame_len for i in range(len(frames))}
    for cut in range(1, len(y4m) - 1):
        if cut in boundaries:
            got = decode_y4m(y4m[:cut])  # complete shorter stream
            assert got.shape[0] == (cut - header_len) // frame_len
        else:
            with pytest.raises(ValueError):
                decode_y4m(y4m[:cut])
