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
