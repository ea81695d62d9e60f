"""Baseline JPEG (SOF0) codec in pure numpy + stdlib — no codec
libraries (SURVEY.md §2.5 N5: the compressed-image tier).

Scope: 8-bit baseline sequential JFIF — DQT/DHT/SOF0/SOS marker
parsing, canonical-Huffman entropy coding with byte stuffing, DC
prediction, zigzag, dequantize, 8×8 IDCT (exact orthonormal matrix
product), chroma upsampling for subsampled scans (4:2:0 / 4:2:2), and
JFIF YCbCr↔RGB. The encoder emits 4:4:4 or 4:2:0 with the ITU T.81
Annex K quantization and Huffman tables. Progressive (SOF2) streams
dispatch to the jpegprog module; arithmetic coding and 12-bit
precision raise ``ValueError``.

Numerics worth knowing (exploited by the `jpeg_decode` oracle query):
a flat 8×8 block has exactly one nonzero DCT coefficient, DC = 8·d
(orthonormal convention, d = level-shifted value). With Annex K's
Q[0,0] = 16, quantization computes round(d/2) — EXACT whenever d is
even, so flat gray rasters with even pixel values round-trip
bit-exactly through the full entropy-coded path. That turns a lossy
codec into an oracle-checkable operator without leaving the spec.

Speed: the entropy loop is per-symbol Python (inherent to Huffman),
so decode cost is O(coded symbols); block math is vectorized numpy.
Payloads decode inside Arrow-batched ``mapInPandas`` workers — one
Python worker per core, no per-row Spark overhead (multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import check_raster
from .multimodal import quarantine_decoder

# --------------------------------------------------------------------------
# Tables (ITU T.81 Annex K). Encoder and decoder share these; canonical
# Huffman construction keeps the two consistent even standalone.
# --------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (BITS[1..16], HUFFVAL) per Annex K
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: block DCT = D @ B @ D.T
_D = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by canonical Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict[bytes, list[int]] = {}


def _decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Decoder-side Huffman view as a flat 2^16-entry lookup table:
    ``lut[next16bits] = (symbol << 8) | code_length`` (0 = invalid code).

    One table lookup replaces the old bit-at-a-time tree walk (the
    single hottest path in decode — every symbol cost up to 16 Python
    calls). Peeking 16 bits always suffices: baseline Huffman codes are
    ≤ 16 bits and every shorter code owns the whole 2^(16-len) slice of
    peek values that share its prefix. Tables are cached by their DHT
    bytes — real corpora reuse the Annex K tables across millions of
    payloads, and the rebuild was ~15% of small-payload decode time."""
    key = bytes(bits) + b"\x00" + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            if start + (1 << (16 - length)) > (1 << 16) or k >= len(vals):
                raise ValueError("corrupt JPEG Huffman table (code space overflow)")
            sym[start : start + (1 << (16 - length))] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    lut = sym.tolist()  # plain-list indexing is ~3× faster than numpy scalars
    if len(_LUT_CACHE) > 64:  # hostile corpora with many distinct DHTs
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _entropy_segment(
    payload: bytes, data_start: int
) -> tuple[np.ndarray, list[int], list[int]]:
    """One vectorized pre-scan of the entropy-coded segment: un-stuff
    0xFF00, strip RSTn markers (recording each following segment's bit
    position), and cut the stream at the first true marker (EOI or
    anything else non-stuffing). Returns ``(unstuffed_bytes,
    sliding_32bit_words, restart_segment_bit_starts)``.

    The sliding words let the decode loop peek the next 16 bits at ANY
    bit position with two integer ops — ``w32[p >> 3]`` holds bits
    ``8(p>>3) .. 8(p>>3)+31``, so ``(w32[p >> 3] >> (16 - (p & 7))) &
    0xFFFF`` is the 16-bit window at ``p`` — replacing the per-bit
    accumulator that dominated decode cost."""
    if len(payload) - data_start < 4096:
        # tiny segments (thumbnails, MJPEG frames): a bytes-level scan
        # beats ~15 numpy dispatches on a 30-byte array
        raw = payload[data_start:]
        out = bytearray()
        seg_starts: list[int] = []
        i = 0
        n = len(raw)
        while True:
            j = raw.find(b"\xff", i)
            if j < 0:
                out += raw[i:]
                break
            out += raw[i:j]
            if j + 1 >= n:
                break
            b2 = raw[j + 1]
            if b2 == 0x00:
                out.append(0xFF)
                i = j + 2
            elif 0xD0 <= b2 <= 0xD7:
                seg_starts.append(8 * len(out))
                i = j + 2
            else:
                break
        padded_b = bytes(out) + b"\x00\x00\x00\x00"
        w32s = [
            int.from_bytes(padded_b[i : i + 4], "big") for i in range(len(out) + 1)
        ]
        return np.frombuffer(bytes(out), np.uint8), w32s, seg_starts
    data = np.frombuffer(payload, np.uint8, len(payload) - data_start, data_start)
    ff = np.flatnonzero(data == 0xFF)
    end = len(data)
    if len(ff):
        # classify each 0xFF by its next byte; trailing 0xFF ends the stream
        nxt = np.where(ff + 1 < len(data), data[np.minimum(ff + 1, len(data) - 1)], 0xD9)
        is_stuff = nxt == 0x00
        is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
        term = ff[~is_stuff & ~is_rst]
        if len(term):
            end = int(term[0])
            m = ff < end
            ff, is_stuff, is_rst = ff[m], is_stuff[m], is_rst[m]
    else:
        is_stuff = is_rst = np.zeros(0, dtype=bool)
    keep = np.ones(end, dtype=bool)
    keep[ff[is_stuff] + 1] = False  # drop the stuffed 0x00, keep the 0xFF
    rst = ff[is_rst]
    keep[rst] = False  # drop both marker bytes
    keep[rst + 1] = False
    ub = data[:end][keep]
    pos_excl = np.concatenate([[0], np.cumsum(keep)])  # unstuffed offset of each raw pos
    seg_starts = (8 * pos_excl[np.minimum(rst + 2, end)]).tolist()
    padded = np.concatenate([ub, np.zeros(4, np.uint8)]).astype(np.uint32)
    w32 = (
        (padded[:-3] << 24) | (padded[1:-2] << 16) | (padded[2:-1] << 8) | padded[3:]
    ).tolist()
    return ub, w32, seg_starts


def _amplitude(v: int) -> tuple[int, int]:
    """Signed value → (size, bits) for encoding."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


_ENCODER_CODES: tuple[list, list] | None = None
_STATIC_HEADER: bytes | None = None
_STATIC_TAIL: bytes | None = None


def _encoder_codes() -> tuple[list, list]:
    """The encoder always emits the ITU T.81 Annex K tables — build the
    canonical code maps once per process, not once per frame (the
    rebuild was ~13% of flat-frame encode time)."""
    global _ENCODER_CODES
    if _ENCODER_CODES is None:
        _ENCODER_CODES = (
            [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
             _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)],
            [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
             _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)],
        )
    return _ENCODER_CODES


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _static_marker_bytes() -> tuple[bytes, bytes]:
    """Everything in the emitted JFIF stream that does not depend on the
    image: (SOI+APP0+DQT prefix, DHT+partial-SOS suffix). Only SOF0 and
    the entropy scan vary per frame."""
    global _STATIC_HEADER, _STATIC_TAIL
    if _STATIC_HEADER is None:
        head = bytearray(b"\xff\xd8")
        head += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tid, q in enumerate([QUANT_LUMA, QUANT_CHROMA]):
            head += _seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in q.ravel()[ZIGZAG]))
        tail = bytearray()
        for cls, tid, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ):
            tail += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
        sos = bytearray([3])
        for ci in range(3):
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([0, 63, 0])
        tail += _seg(0xFFDA, bytes(sos))
        _STATIC_HEADER, _STATIC_TAIL = bytes(head), bytes(tail)
    return _STATIC_HEADER, _STATIC_TAIL


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a plane to 8-multiples (edge replicate) and split into 8×8
    blocks, raster order. Returns (blocks, by, bx)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge") if ph or pw else plane
    hh, ww = padded.shape
    by, bx = hh // 8, ww // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _encode_block(
    writer: _BitWriter,
    qblock: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = qblock.ravel()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size, amp = _amplitude(diff) if diff else (0, 0)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(amp, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0].max()) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size, amp = _amplitude(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, subsample: str = "4:4:4") -> bytes:
    """Encode an RGB (h, w, 3) uint8 array as baseline JFIF. Chroma
    ``subsample``: "4:4:4" (none) or "4:2:0" (2×2 mean)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB")
    if subsample not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsample}")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img)
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    if subsample == "4:2:0":
        ph, pw = -h % 2, -w % 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, ph), (0, pw)), mode="edge")
            planes[i] = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]

    dc_codes, ac_codes = _encoder_codes()
    quants = [QUANT_LUMA, QUANT_CHROMA]

    # quantized blocks per component, raster order
    comp_blocks = []
    comp_dims = []
    for ci, plane in enumerate(planes):
        q = quants[0 if ci == 0 else 1]
        blocks, by, bx = _blocks(plane - 128.0)
        coefs = (_D @ blocks) @ _D.T  # broadcasting matmul: D B Dᵀ per block
        qb = np.round(coefs / q).astype(np.int32)
        comp_blocks.append(qb)
        comp_dims.append((by, bx))

    writer = _BitWriter()
    preds = [0, 0, 0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_y = -(-h // (8 * vmax))
    mcu_x = -(-w // (8 * hmax))
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for ci in range(3):
                hs, vs = samp[ci]
                by, bx = comp_dims[ci]
                for dy in range(vs):
                    for dx in range(hs):
                        yb = min(my * vs + dy, by - 1)
                        xb = min(mx * hs + dx, bx - 1)
                        block = comp_blocks[ci][yb * bx + xb]
                        preds[ci] = _encode_block(
                            writer,
                            block,
                            preds[ci],
                            dc_codes[0 if ci == 0 else 1],
                            ac_codes[0 if ci == 0 else 1],
                        )
    scan = writer.flush()

    head, tail = _static_marker_bytes()
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 3))
    for ci in range(3):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    return head + _seg(0xFFC0, bytes(sof)) + tail + scan + b"\xff\xd9"


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


@quarantine_decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF payload to (h, w, 3) RGB uint8
    (grayscale scans return (h, w, 1)). Raises ``ValueError`` on
    progressive/arithmetic/12-bit streams or corrupt data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    scan_comps = None
    restart_interval = 0
    i = 2
    data_start = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        (size,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + size]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec:
                    raise ValueError("16-bit quantization tables unsupported")
                # kept in wire (zigzag) order — exactly the form the
                # dequantize step multiplies against
                quants[tid] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = _decode_lut(bits, vals)
                j += 17 + n
        elif marker == 0xC0:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hv, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            # Huffman progressive: hand the whole payload to the
            # progressive decoder (lazy import breaks the module cycle)
            from .jpegprog import decode_jpeg_progressive

            return decode_jpeg_progressive(payload)
        elif marker in (0xC9, 0xCA, 0xCB):
            # classified distinctly so corpus triage can separate
            # "needs an arithmetic decoder" from "corrupt bytes"
            raise ValueError("unsupported_arithmetic: JPEG SOF9/10/11 scan")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "dc": tids >> 4, "ac": tids & 0xF})
            data_start = i + 2 + size
            break
        i += 2 + size
    if frame is None or scan_comps is None or data_start is None:
        raise ValueError("missing SOF0/SOS in JPEG stream")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        sc.update(by_id[sc["id"]])
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_y = -(-h // (8 * vmax))
    mcu_x = -(-w // (8 * hmax))

    # padded component planes are float64 — bound the total allocation
    # before touching entropy data (hostile SOF0 can declare 65535²)
    check_raster(mcu_x * hmax * 8, mcu_y * vmax * 8, 8 * len(scan_comps), what="JPEG raster")

    for sc in scan_comps:
        if sc["dc"] not in dc_tables or sc["ac"] not in ac_tables:
            raise ValueError("missing Huffman table for scan component")
        if sc["q"] not in quants:
            raise ValueError("missing quantization table for scan component")

    # ---- phase 1: one tight Python pass over the entropy stream -----------
    # Collects (block*64 + zigzag_pos, value) sparse coordinates; all pixel
    # math happens batched in phase 2. Per symbol: one list-index peek, one
    # LUT hit — versus up to 16 method calls in the old bit-at-a-time form.
    ub, w32, seg_starts = _entropy_segment(payload, data_start)
    total_bits = 8 * len(ub)
    ndc = [dc_tables[sc["dc"]] for sc in scan_comps]
    nac = [ac_tables[sc["ac"]] for sc in scan_comps]
    reps = [sc["h"] * sc["v"] for sc in scan_comps]
    bpm = sum(reps)
    nblocks = mcu_y * mcu_x * bpm
    ncomp = len(scan_comps)
    preds = [0] * ncomp
    p = 0
    bi = 0
    seg = 0
    mcu_count = 0
    tb: list[int] = []  # flattened (block << 6 | zigzag position)
    tv: list[int] = []  # coefficient values
    for _mcu in range(mcu_y * mcu_x):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            # byte-align and skip the RSTn marker: jump to the next
            # pre-scanned segment start; DC predictors reset
            if seg < len(seg_starts):
                p = seg_starts[seg]
            seg += 1
            preds = [0] * ncomp
        for ci in range(ncomp):
            dct = ndc[ci]
            act = nac[ci]
            for _rep in range(reps[ci]):
                e = dct[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                if not e:
                    raise ValueError("invalid Huffman code in JPEG stream")
                p += e & 0xFF
                size = e >> 8
                if size:
                    if size > 16:
                        raise ValueError("corrupt JPEG DC size category")
                    v = ((w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - size)
                    p += size
                    preds[ci] += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                base = bi << 6
                tb.append(base)
                tv.append(preds[ci])
                k = 1
                while k < 64:
                    e = act[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                    if not e:
                        raise ValueError("invalid Huffman code in JPEG stream")
                    p += e & 0xFF
                    rs = e >> 8
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    size = rs & 0xF
                    if k > 63 or not size:
                        raise ValueError("AC run past block end")
                    v = ((w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - size)
                    p += size
                    tb.append(base + k)
                    tv.append(v if v >= (1 << (size - 1)) else v - (1 << size) + 1)
                    k += 1
                bi += 1
        mcu_count += 1
        if p > total_bits:
            raise ValueError("truncated JPEG entropy stream")

    # ---- phase 2: batched dequantize + inverse zigzag + IDCT + scatter ----
    coeffs = np.zeros(nblocks * 64, dtype=np.int64)
    if tb:
        coeffs[np.array(tb, dtype=np.int64)] = np.array(tv, dtype=np.int64)
    coeffs = coeffs.reshape(nblocks, 64)
    offs = np.cumsum([0] + reps)
    full = []
    for ci, sc in enumerate(scan_comps):
        hc, vc = sc["h"], sc["v"]
        qzz = quants[sc["q"]]  # already zigzag-order int64
        mcub = np.arange(mcu_y * mcu_x, dtype=np.int64) * bpm
        idx = (mcub[:, None] + offs[ci] + np.arange(vc * hc)[None, :]).ravel()
        cz = coeffs[idx] * qzz  # dequantized, zigzag order
        nat = np.zeros(cz.shape, dtype=np.float64)
        nat[:, ZIGZAG] = cz
        # broadcasting matmul beats einsum's dispatch at small block counts
        pix = (_D.T @ nat.reshape(-1, 8, 8)) @ _D + 128.0
        plane = (
            pix.reshape(mcu_y, mcu_x, vc, hc, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcu_y * vc * 8, mcu_x * hc * 8)
        )
        ry, rx = vmax // vc, hmax // hc
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.empty((*y.shape, 3), dtype=np.float64)
    rgb[..., 0] = y + 1.402 * cr
    rgb[..., 1] = y - 0.344136286 * cb - 0.714136286 * cr
    rgb[..., 2] = y + 1.772 * cb
    return np.clip(np.round(rgb, out=rgb), 0, 255).astype(np.uint8)
