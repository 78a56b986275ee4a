"""Baseline JPEG codec from first principles + the value-gated decode query.

Retires the compressed-image stub (the r7 verdict's stretch item): a
dependency-free ITU-T T.81 BASELINE sequential codec — forward/inverse
8x8 DCT as numpy matrix products, uniform quantization, zigzag, DC DPCM,
run-length AC coding, canonical Huffman entropy coding with 0xFF byte
stuffing — for 8-bit grayscale and 4:4:4 RGB (JFIF YCbCr).  Everything
outside that envelope (progressive SOF2, arithmetic coding, 12-bit,
chroma subsampling, restart intervals) raises ValueError: fail loud,
never a wrong pixel — the same contract as the PNG/WAV/Y4M codecs in
operators/multimodal.py.

The encoder writes CUSTOM canonical Huffman tables (flat 4-bit DC /
8-bit AC codes, embedded in DHT as the format requires) rather than the
Annex K defaults — spec-valid, decodable by any baseline reader, and the
decoder rebuilds tables canonically from ANY DHT, so it is not paired to
this encoder's choice.

Oracle strategy (q_multimodal_jpeg): JPEG is lossy in general, but a
block that is CONSTANT has a DC-only DCT (all AC exactly zero), and with
a DC quantizer of 8 the quantized DC is exactly v-128 — the round trip
is LOSSLESS and the decoded pixel sum is closed-form, so DuckDB replays
the real Huffman/DPCM/zigzag/dequant/IDCT pipeline's output exactly.
The AC path (runs, ZRL, EOB, magnitude categories) is pinned by
tests/test_jpeg_codec.py round-trips on full-range random images.

Reference scope note: the reference models multimodal work as workload
taxonomy only (`/root/reference/src/templates/estimation.html:199-246`);
codec-level decode is the LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..plans._helpers import spread, t
from ..plans.registry import query

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    """The T.81 zigzag scan, generated (anti-diagonals, alternating)."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()  # even anti-diagonals walk up (row descending)
        order.extend(diag)
    return order


_ZZ = _zigzag_order()
_ZZ_ROWS = np.array([i for i, _ in _ZZ])
_ZZ_COLS = np.array([j for _, j in _ZZ])


def _dct_matrix() -> "np.ndarray":
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full((8, 1), np.sqrt(2.0 / 8.0))
    scale[0, 0] = np.sqrt(1.0 / 8.0)
    return c * scale


_C = _dct_matrix()  # D = C @ X @ C.T ; X = C.T @ D @ C

# near-lossless uniform table: q=8 everywhere makes a CONSTANT block's
# quantized DC exactly (v - 128) — the closed form the oracle replays
Q_UNIFORM8 = np.full((8, 8), 8, dtype=np.int32)

# canonical Huffman: flat 4-bit codes for the 12 DC size categories and
# flat 8-bit codes for the 162 AC symbols (EOB, ZRL, 16 runs x 10 sizes);
# both leave the all-ones code unused as T.81 requires
_DC_VALUES = list(range(12))
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 codes of length 4 (index 3 = length 4)
_AC_VALUES = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # 162 codes of length 8


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALUES)


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)  # stuff
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s
        return bytes(self._out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self._d[self._pos]
        if b == 0xFF:
            nxt = self._d[self._pos + 1]
            if nxt == 0x00:
                self._pos += 2
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self._pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def end(self) -> int:
        """Byte position after discarding the partial padding byte."""
        self._n = 0
        return self._pos


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (>16 bits)")


def _magnitude(value: int) -> tuple[int, int]:
    """(size category, extra bits) for a DC diff / AC coefficient."""
    size = int(value).bit_length() if value > 0 else int(-value).bit_length()
    if value >= 0:
        return size, value
    return size, value + (1 << size) - 1


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    if raw < (1 << (size - 1)):
        return raw - (1 << size) + 1
    return raw


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: "np.ndarray") -> "np.ndarray":
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _ycbcr_to_rgb(img: "np.ndarray") -> "np.ndarray":
    y, cb, cr = (img[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _encode_block(
    block: "np.ndarray", quant: "np.ndarray", pred: int, writer: _BitWriter
) -> int:
    d = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.rint(d / quant).astype(np.int64)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    size, extra = _magnitude(dc - pred)
    if size > 11:
        raise ValueError("DC difference out of 8-bit baseline range")
    code, length = _DC_ENC[size]
    writer.write(code, length)
    if size:
        writer.write(extra, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = _AC_ENC[0xF0]
            writer.write(zc, zl)
            run -= 16
        size, extra = _magnitude(v)
        if size > 10:
            raise ValueError("AC coefficient out of baseline size range")
        code, length = _AC_ENC[(run << 4) | size]
        writer.write(code, length)
        writer.write(extra, size)
        run = 0
    if last_nz < 63:
        ec, el = _AC_ENC[0x00]
        writer.write(ec, el)
    return dc


def _dht_segment() -> bytes:
    body = bytearray()
    for cls, bits, values in (
        (0x00, _DC_BITS, _DC_VALUES),
        (0x10, _AC_BITS, _AC_VALUES),
    ):
        body.append(cls)
        body.extend(bits)
        body.extend(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


def encode_jpeg(img: "np.ndarray", quant: "np.ndarray" = Q_UNIFORM8) -> bytes:
    """Baseline JPEG bytes for an 8-bit grayscale (h, w) or RGB (h, w, 3)
    image whose sides are multiples of 8 (no partial-block padding —
    callers of the gate control their geometry; raise otherwise)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg requires multiple-of-8 dimensions")
    if gray:
        planes = [img]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., i] for i in range(3)]
    quant = np.asarray(quant, dtype=np.int32)
    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = quant[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q.tobytes()
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 4:4:4, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment()
    sos = struct.pack(">B", ncomp)
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    writer = _BitWriter()
    preds = [0] * ncomp
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, plane in enumerate(planes):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(block, quant, preds[ci], writer)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> "np.ndarray":
    """Decode baseline sequential JPEG: 8-bit, 1 component (grayscale) or
    3 components 4:4:4 (JFIF YCbCr -> RGB), canonical Huffman from ANY
    DHT.  Returns (h, w) or (h, w, 3) uint8.  Raises ValueError on
    progressive/arithmetic/12-bit/subsampled/restart-interval streams —
    and on TRUNCATED/corrupt input (the fail-loud contract covers every
    malformed stream, not just recognized-but-unsupported ones)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        # out-of-range reads anywhere in the marker walk, segment
        # parsing, or entropy decode mean the stream ended mid-structure
        raise ValueError("truncated JPEG stream") from exc


def _decode_jpeg(data: bytes) -> "np.ndarray":
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (component id, quant table)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG (non-baseline SOF 0xFF{marker:02X})"
            )
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq_, tq = body[off] >> 4, body[off] & 0x0F
                if pq_:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = np.frombuffer(body, np.uint8, 64, off + 1)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                quants[tq] = tbl
                off += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (both sequential DCT)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            for i in range(ncomp):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, dest = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nval = sum(bits)
                values = list(body[off + 17 : off + 17 + nval])
                enc = _canonical_codes(bits, values)
                huff[(cls, dest)] = {
                    (length, code): sym for sym, (code, length) in enc.items()
                }
                off += 17 + nval
        elif marker == 0xDD:  # DRI
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(
                    k for k, (c, _q) in enumerate(comps) if c == cid
                )
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            reader = _BitReader(data, pos)
            out = _decode_scan(reader, h, w, comps, scan, quants, huff)
            pos = reader.end()
            # skip to EOI (tolerate pad bytes); a stream that ends without
            # one was cut mid-file even if every block decoded
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] == 0xD9
            ):
                pos += 1
            if pos + 1 >= len(data):
                raise ValueError("truncated JPEG stream (missing EOI)")
            if len(out) == 1:
                return out[0]
            ycc = np.stack(out, axis=-1)
            return _ycbcr_to_rgb(ycc)
        # APPn / COM / others: skipped
    raise ValueError("no SOS scan found")


def _decode_scan(reader, h, w, comps, scan, quants, huff):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.uint8) for _ in scan]
    preds = [0] * len(scan)
    for by in range(bh):
        for bx in range(bw):
            for si, (ci, dct, act) in enumerate(scan):
                zz = np.zeros(64, dtype=np.int64)
                size = _decode_symbol(reader, huff[(0, dct)])
                diff = _extend(reader.bits(size), size)
                preds[si] += diff
                zz[0] = preds[si]
                k = 1
                while k < 64:
                    sym = _decode_symbol(reader, huff[(1, act)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
                blk = np.zeros((8, 8), dtype=np.float64)
                blk[_ZZ_ROWS, _ZZ_COLS] = zz * quants[comps[ci][1]][
                    _ZZ_ROWS, _ZZ_COLS
                ]
                px = _C.T @ blk @ _C + 128.0
                planes[si][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    np.clip(np.rint(px), 0, 255).astype(np.uint8)
                )
    return [p[:h, :w] for p in planes]


# ---------------------------------------------------------------------------
# The value-gated decode query
# ---------------------------------------------------------------------------

_JW, _JH = 32, 24  # 4x3 blocks of 8x8
_JBW, _JBH = _JW // 8, _JH // 8
_JN_BLOCKS = _JBW * _JBH
_JDOCS = 60


def _block_values(media_id: int) -> "np.ndarray":
    b = np.arange(_JN_BLOCKS, dtype=np.int64)
    return (media_id * 37 + b * 11) % 256


def _synthetic_blocky(media_id: int) -> "np.ndarray":
    """(h, w) grayscale image CONSTANT per 8x8 block — the DC-only regime
    where baseline JPEG with q_dc=8 is exactly lossless (see module doc),
    so the decoded pixel sums are closed-form for the oracle."""
    v = _block_values(media_id).reshape(_JBH, _JBW)
    return np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sum_px", T.LongType(), True),
        T.StructField("min_px", T.LongType(), True),
        T.StructField("max_px", T.LongType(), True),
    ]
)


@query(
    "q_multimodal_jpeg",
    oracle=f"""
        WITH blk AS (
            SELECT d.doc_id AS media_id, b.b,
                   (d.doc_id * 37 + b.b * 11) % 256 AS v
            FROM (SELECT doc_id FROM documents WHERE doc_id < {_JDOCS}) d,
                 (SELECT unnest(range(0, {_JN_BLOCKS})) AS b) b
        )
        SELECT media_id,
               CAST({_JW} AS INT) AS width,
               CAST({_JH} AS INT) AS height,
               CAST(sum(64 * v) AS BIGINT) AS sum_px,
               CAST(min(v) AS BIGINT) AS min_px,
               CAST(max(v) AS BIGINT) AS max_px
        FROM blk
        GROUP BY media_id
        ORDER BY media_id
    """,
    tags=("llm", "multimodal", "decode", "jpeg", "mapInPandas"),
)
def q_multimodal_jpeg(spark, sf_dir):
    """REAL baseline-JPEG decode, value-gated — the compressed-image stub
    retired: each document (doc_id < {_JDOCS}) gets a 32x24 grayscale
    image constant per 8x8 block (block b carries (doc_id*37 + b*11) %
    256), ENCODED to a spec-valid baseline JPEG (DCT, uniform q=8
    quantization, zigzag, DC DPCM, canonical Huffman, byte stuffing) and
    DECODED back (marker parse, Huffman decode, dequant, IDCT) inside
    mapInPandas.  Constant blocks make the lossy format exactly lossless
    (DC-only spectrum, integer quantized DC), so the oracle replays the
    decoded pixel sums in closed form — any defect in the DPCM chain,
    zigzag order, Huffman tables, stuffing, or IDCT shifts a sum and
    goes red.  The AC/run-length half of the codec is pinned by
    tests/test_jpeg_codec.py round-trips on full-range random images.

    Scale: encode+decode are partition-local Arrow-batched map work over
    spread() partitions; blobs never leave the executors — one narrow
    6-column projection feeds the gate (no shuffle before the final
    ORDER BY)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < _JDOCS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                payload = encode_jpeg(_synthetic_blocky(int(did)))
                img = decode_jpeg(payload)
                rows.append(
                    (
                        int(did),
                        img.shape[1],
                        img.shape[0],
                        int(img.sum(dtype=np.int64)),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_SCHEMA.fields]
            )

    return (
        spread(docs, "doc_id")
        .select("doc_id")
        .mapInPandas(run, JPEG_SCHEMA)
        .orderBy("media_id")
    )
