"""Baseline JPEG codec (operators/jpeg.py) — the layers the gate can't see.

q_multimodal_jpeg value-gates the DC/DPCM/Huffman/marker pipeline through
its exactly-lossless constant-block regime; these tests pin the rest:
the AC run-length path on full-range random images (bounded error), the
zigzag order against the published T.81 table, byte stuffing, canonical
Huffman table validity, RGB color-transform round trips, and the
fail-loud contract for every unimplemented JPEG variant.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_estimator_spark.operators.jpeg import (
    Q_UNIFORM8,
    _AC_BITS,
    _AC_VALUES,
    _BitReader,
    _BitWriter,
    _C,
    _DC_BITS,
    _DC_VALUES,
    _ZZ,
    _canonical_codes,
    _synthetic_blocky,
    decode_jpeg,
    encode_jpeg,
)

# first 16 + last 4 entries of the published T.81 zigzag sequence, as
# flat row-major indices — enough to falsify any traversal-rule slip
_ZZ_PUBLISHED_HEAD = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
_ZZ_PUBLISHED_TAIL = [61, 54, 47, 55, 62, 63]


def test_zigzag_matches_published_table():
    flat = [i * 8 + j for i, j in _ZZ]
    assert flat[:16] == _ZZ_PUBLISHED_HEAD
    assert flat[-6:] == _ZZ_PUBLISHED_TAIL
    assert sorted(flat) == list(range(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    # DC basis: constant block of v has DCT[0,0] == 8v and zero AC
    d = _C @ np.full((8, 8), 5.0) @ _C.T
    assert abs(d[0, 0] - 40.0) < 1e-9
    assert np.abs(d).sum() - abs(d[0, 0]) < 1e-9


def test_huffman_tables_are_canonical_and_exclude_all_ones():
    dc = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac = _canonical_codes(_AC_BITS, _AC_VALUES)
    assert len(dc) == 12 and len(ac) == 162
    assert all(length == 4 for _, length in dc.values())
    assert all(length == 8 for _, length in ac.values())
    # prefix-free by construction at a single length; all-ones reserved
    assert (0b1111, 4) not in dc.values()
    assert (0xFF, 8) not in ac.values()
    assert len({c for c, _ in dc.values()}) == 12
    assert len({c for c, _ in ac.values()}) == 162


def test_bit_writer_stuffs_ff_and_reader_unstuffs():
    wtr = _BitWriter()
    wtr.write(0xFF, 8)
    wtr.write(0xAB, 8)
    raw = wtr.flush()
    assert raw == b"\xff\x00\xab"
    rdr = _BitReader(raw + b"\xff\xd9", 0)
    assert rdr.bits(8) == 0xFF
    assert rdr.bits(8) == 0xAB


def test_constant_block_round_trip_is_lossless():
    for mid in (0, 1, 17, 42, 59, 255):
        img = _synthetic_blocky(mid)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img), mid


def test_random_gray_round_trip_bounded_and_stuffed():
    rng = np.random.default_rng(7)
    stuffed = 0
    for _ in range(20):
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        payload = encode_jpeg(img)
        stuffed += b"\xff\x00" in payload
        out = decode_jpeg(payload)
        err = np.abs(out.astype(int) - img.astype(int)).max()
        # uniform q=8 bounds per-coefficient error at q/2; worst-case
        # pixel error stays well under 2q even for full-range noise
        assert err <= 12, err
    assert stuffed >= 1, "no payload exercised 0xFF byte stuffing"


def test_smooth_gradient_near_exact():
    x = np.linspace(0, 255, 32)[None, :] * np.ones((24, 1))
    img = x.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_round_trip_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    # quantization error + two rounded color transforms
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_rgb_constant_image_channelwise_close():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_fail_loud_on_unsupported_variants():
    img = _synthetic_blocky(3)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")

    prog = bytearray(payload)
    prog[i + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))

    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x00" + bytes(payload))

    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((10, 10), dtype=np.uint8))  # not /8


def test_dc_dpcm_chain_spans_blocks():
    # strictly increasing block values force nonzero DC diffs everywhere;
    # a broken predictor chain would shift every block after the first
    v = (np.arange(12, dtype=np.int64) * 20 % 256).reshape(3, 4)
    img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(out, img)


def test_truncated_streams_raise_valueerror_everywhere():
    # the fail-loud contract covers malformed input: EVERY prefix of a
    # valid stream must raise ValueError (never IndexError/struct.error),
    # whether the cut lands mid-marker, mid-segment, or mid-entropy-data
    img = (np.arange(64, dtype=np.int64) * 3 % 256).reshape(8, 8).astype(np.uint8)
    payload = encode_jpeg(img)
    for cut in range(2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])
    # and a mid-stream corruption that points a segment length past EOF
    corrupt = bytearray(payload)
    dqt = corrupt.find(b"\xff\xdb")
    corrupt[dqt + 2 : dqt + 4] = (60000).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(corrupt))
