"""Progressive JPEG (SOF2) codec — the spectral-selection + successive-
approximation tier of ITU T.81 Annex G, pure numpy + stdlib like the
baseline codec it extends (jpegcodec.py).

Why it exists: real web corpora are full of progressive JPEGs (most
photo sites re-encode to SOF2), so a 100 TB multimodal ingest that only
reads SOF0 quarantines a large fraction of valid images. This module
decodes the full Huffman progressive feature set:

- DC scans, interleaved, with successive approximation (first pass
  sends ``value >> Al`` as a prediction diff; refinement passes send
  one bit per block);
- AC scans, single-component per T.81, spectral bands ``Ss..Se`` with
  EOB-run coding (EOBn symbols with extension bits) in first passes and
  the correction-bit protocol in refinement passes;
- DHT redefinition between scans, restart markers, 4:2:0/4:2:2
  sampling grids (non-interleaved AC scans walk each component's OWN
  ceil(w·h_i/hmax/8) × ceil(h·v_i/vmax/8) block grid, not the padded
  MCU grid).

The encoder exists to make the decoder testable without codec
libraries: it emits a scan script covering every decode path (DC
first+refine, AC first with EOB runs across blocks, AC refinement with
buffered correction bits). Entropy coding is lossless over the same
quantized coefficients the baseline encoder produces, which yields the
strongest possible test: ``decode(encode_progressive(img)) ==
decode(encode_baseline(img))`` bit-exactly, for any image.

Algorithms follow T.81 Annex G (G.1.2.2-G.1.2.3); the correction-bit
bookkeeping matches the conventional Huffman-progressive realization
(independently reimplemented; reference parity notes in
/root/reference — the reference has no image codecs at all, this is
north-star breadth per SURVEY.md §2.5 N5).
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import check_raster
from .jpegcodec import (
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _D,
    _amplitude,
    _BitWriter,
    _blocks,
    _decode_lut,
    _canonical_codes,
    _entropy_segment,
    _rgb_to_ycbcr,
    _seg,
)

# --------------------------------------------------------------------------
# Generic Huffman table for progressive scans. Annex K's baseline AC
# tables lack the EOBn symbols (r<<4 for r=1..14) progressive AC coding
# needs, so the encoder ships one flat near-uniform table covering every
# 8-bit symbol: 2 codes of length 8, 254 of length 9 (Kraft 2·2⁻⁸ +
# 254·2⁻⁹ < 1; max code 0x101 at 9 bits — the all-ones code stays
# unused as T.81 requires). Compression is mediocre; correctness of the
# scan structure is the point.
# --------------------------------------------------------------------------

FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 2, 254, 0, 0, 0, 0, 0, 0, 0]
FLAT_VALS = list(range(256))


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _ScanWriter:
    """Per-scan entropy writer with the progressive bookkeeping
    (T.81 G.1.2.3): an EOB-run accumulator, the correction bits
    attached to that pending run (``be_bits`` — emitted right after the
    EOBn symbol), and the current block's correction bits (``br_bits``
    — emitted after the next in-block symbol)."""

    def __init__(self, codes: dict[int, tuple[int, int]]) -> None:
        self.w = _BitWriter()
        self.codes = codes
        self.eobrun = 0
        self.be_bits: list[int] = []
        self.br_bits: list[int] = []

    def sym(self, s: int) -> None:
        code, ln = self.codes[s]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.be_bits:
            self.w.write(b, 1)
        self.be_bits = []

    def emit_br(self) -> None:
        for b in self.br_bits:
            self.w.write(b, 1)
        self.br_bits = []

    def end_block_eob(self) -> None:
        """Current block ends in an EOB: fold its correction bits into
        the pending run's buffer."""
        self.eobrun += 1
        self.be_bits += self.br_bits
        self.br_bits = []
        if self.eobrun == 0x7FFF or len(self.be_bits) > 900:
            self.flush_eobrun()


def _dc_block_order(comp_zz, dims, samp, mcu_y: int, mcu_x: int):
    """Interleaved-scan block sequence: for each MCU, each component
    contributes its v×h data units. MCU positions past a component's
    real grid clamp to the edge block (the padding blocks interleaved
    scans must still code — duplicating the edge block is the standard
    choice and costs ~nothing after DC prediction)."""
    order = []
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for ci, blocks in enumerate(comp_zz):
                hs, vs = samp[ci]
                by, bx = dims[ci]
                for dy in range(vs):
                    for dx in range(hs):
                        yb = min(my * vs + dy, by - 1)
                        xb = min(mx * hs + dx, bx - 1)
                        order.append((ci, blocks[yb * bx + xb]))
    return order


def _encode_dc_first(order, ncomp: int, Al: int, codes) -> bytes:
    """Interleaved DC first scan: diff-coded ``dc >> Al`` (arithmetic
    shift) over the MCU block sequence."""
    sw = _ScanWriter(codes)
    preds = [0] * ncomp
    for ci, zz in order:
        v = int(zz[0]) >> Al
        diff = v - preds[ci]
        preds[ci] = v
        size, amp = _amplitude(diff) if diff else (0, 0)
        sw.sym(size)
        if size:
            sw.w.write(amp, size)
    return sw.w.flush()


def _encode_dc_refine(order, Al: int) -> bytes:
    """DC refinement: one raw bit per block — ``(dc >> Al) & 1``."""
    w = _BitWriter()
    for _ci, zz in order:
        w.write((int(zz[0]) >> Al) & 1, 1)
    return w.flush()


def _encode_ac_first(blocks, Ss: int, Se: int, Al: int, codes) -> bytes:
    """AC first pass over one component's band: run-length + amplitude
    of ``|coef| >> Al``, EOB runs accumulated across blocks."""
    sw = _ScanWriter(codes)
    for zz in blocks:
        r = 0
        for k in range(Ss, Se + 1):
            v = int(zz[k])
            t = abs(v) >> Al
            if t == 0:
                r += 1
                continue
            sw.flush_eobrun()
            while r > 15:
                sw.sym(0xF0)  # ZRL
                r -= 16
            size, amp = _amplitude(t if v > 0 else -t)
            sw.sym((r << 4) | size)
            sw.w.write(amp, size)
            r = 0
        if r > 0:
            sw.eobrun += 1
            if sw.eobrun == 0x7FFF:
                sw.flush_eobrun()
    sw.flush_eobrun()
    return sw.w.flush()


def _encode_ac_refine(blocks, Ss: int, Se: int, Al: int, codes) -> bytes:
    """AC refinement pass (T.81 G.1.2.3): newly nonzero coefficients are
    sent as (run, 1) symbols + a sign bit; coefficients already nonzero
    at this precision contribute one buffered correction bit, emitted
    after the next symbol (or with the EOB run that covers them)."""
    sw = _ScanWriter(codes)
    for zz in blocks:
        absval = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
        # last position that first becomes nonzero in THIS pass bounds
        # the ZRL emission (zeros after it fold into the EOB run)
        eob = 0
        for i, t in enumerate(absval):
            if t == 1:
                eob = i + 1
        r = 0
        for i, t in enumerate(absval):
            if t == 0:
                r += 1
                continue
            # ZRLs due at THIS position go out before its bit is
            # buffered — correction bits are span-partitioned by the
            # symbol whose decoder walk passes their position, so a
            # history coefficient after a ZRL's 16 zeros must ride the
            # NEXT symbol, not this ZRL (folds into the EOB run instead
            # when no new nonzero follows: i < eob guards that)
            while r > 15 and i < eob:
                sw.flush_eobrun()
                sw.sym(0xF0)
                r -= 16
                sw.emit_br()
            if t > 1:
                # history coefficient: next lower-precision bit, emitted
                # after whichever symbol covers this position
                sw.br_bits.append(t & 1)
                continue
            # newly nonzero (t == 1)
            sw.flush_eobrun()
            sw.sym((r << 4) | 1)
            sw.w.write(1 if int(zz[Ss + i]) > 0 else 0, 1)
            sw.emit_br()
            r = 0
        if r > 0 or sw.br_bits:
            sw.end_block_eob()
    sw.flush_eobrun()
    return sw.w.flush()


def encode_jpeg_progressive(img: np.ndarray, subsample: str = "4:4:4") -> bytes:
    """Encode (h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 as a
    progressive (SOF2) JFIF stream, Annex K quantization. ``subsample``
    is "4:4:4" or "4:2:0" (2×2-mean chroma, luma 2×2 blocks per MCU —
    the shape that makes the decoder's padded-MCU vs per-component
    block-grid distinction observable).

    Scan script (exercises every decoder path):
      1. DC first, interleaved, Al=1
      2. DC refinement, Al=0
      3+4. per component: AC Ss=1..5 first, Al=2
      5+6. per component: AC Ss=6..63 first, Al=2
      7+8. per component: AC Ss=1..63 refine, Ah=2 Al=1
      9+10. per component: AC Ss=1..63 refine, Ah=1 Al=0
    """
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(img.shape[0], img.shape[1]).astype(np.float64)]
    else:
        if img.shape[2] != 3:
            raise ValueError("encode_jpeg_progressive expects RGB or grayscale")
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    if subsample not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsample}")
    h, w = img.shape[:2]
    quants = [QUANT_LUMA, QUANT_CHROMA]
    if not gray and subsample == "4:2:0":
        ph, pw = -h % 2, -w % 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, ph), (0, pw)), mode="edge")
            planes[i] = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(planes)

    # quantized blocks per component in ZIGZAG order (progressive bands
    # index zigzag positions)
    comp_zz = []
    dims = []
    for ci, plane in enumerate(planes):
        q = quants[0 if ci == 0 else 1]
        blocks, by, bx = _blocks(plane - 128.0)
        coefs = (_D @ blocks) @ _D.T
        qb = np.round(coefs / q).astype(np.int32).reshape(-1, 64)
        comp_zz.append([b[ZIGZAG] for b in qb])
        dims.append((by, bx))

    nc = len(planes)
    codes = _canonical_codes(FLAT_BITS, FLAT_VALS)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_y = -(-h // (8 * vmax))
    mcu_x = -(-w // (8 * hmax))
    dc_order = _dc_block_order(comp_zz, dims, samp, mcu_y, mcu_x)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(quants[: (1 if gray else 2)]):
        out += _seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in q.ravel()[ZIGZAG]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xFFC2, bytes(sof))
    # one flat table serves both classes, both destinations
    for cls in (0, 1):
        for tid in (0, 1) if not gray else (0,):
            out += _seg(
                0xFFC4, bytes([(cls << 4) | tid]) + bytes(FLAT_BITS) + bytes(FLAT_VALS)
            )

    def sos(comp_ids: list[int], Ss: int, Se: int, Ah: int, Al: int, data: bytes):
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            tid = 0 if cid == 1 else 1
            body += bytes([cid, (tid << 4) | tid])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return _seg(0xFFDA, bytes(body)) + data

    out += sos(
        list(range(1, nc + 1)), 0, 0, 0, 1, _encode_dc_first(dc_order, nc, 1, codes)
    )
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0, _encode_dc_refine(dc_order, 0))
    for Ss, Se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos(
                [ci + 1], Ss, Se, 0, 2, _encode_ac_first(comp_zz[ci], Ss, Se, 2, codes)
            )
    for Ah, Al in ((2, 1), (1, 0)):
        for ci in range(nc):
            out += sos(
                [ci + 1], 1, 63, Ah, Al,
                _encode_ac_refine(comp_zz[ci], 1, 63, Al, codes),
            )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Bit cursor over one scan's unstuffed entropy segment, with the
    restart-segment jump list from jpegcodec._entropy_segment."""

    __slots__ = ("w32", "p", "total_bits", "seg_starts", "seg")

    def __init__(self, payload: bytes, data_start: int) -> None:
        ub, w32, seg_starts = _entropy_segment(payload, data_start)
        self.w32 = w32
        self.p = 0
        self.total_bits = 8 * len(ub)
        self.seg_starts = seg_starts
        self.seg = 0

    def peek16(self) -> int:
        p = self.p
        return (self.w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF

    def huff(self, lut: list[int]) -> int:
        e = lut[self.peek16()]
        if not e:
            raise ValueError("invalid Huffman code in progressive scan")
        self.p += e & 0xFF
        if self.p > self.total_bits:
            raise ValueError("truncated progressive scan")
        return e >> 8

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:
            raise ValueError("corrupt receive length in progressive scan")
        v = self.peek16() >> (16 - n)
        self.p += n
        if self.p > self.total_bits:
            raise ValueError("truncated progressive scan")
        return v

    def bit(self) -> int:
        b = self.peek16() >> 15
        self.p += 1
        if self.p > self.total_bits:
            raise ValueError("truncated progressive scan")
        return b

    def restart(self) -> None:
        """Byte-align to the next RSTn segment start."""
        if self.seg < len(self.seg_starts):
            self.p = self.seg_starts[self.seg]
        self.seg += 1


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Decode a Huffman progressive (SOF2) JFIF payload to (h, w, 3)
    RGB uint8 ((h, w, 1) for grayscale). Raises ``ValueError`` on
    corrupt streams — never returns a partial raster (a truncated
    progressive file is still decodable in principle from fewer scans,
    but a *quarantine*-grade contract wants deterministic all-or-
    nothing, so any scan error rejects the payload)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, list[int]] = {}
    ac_tables: dict[int, list[int]] = {}
    frame = None
    restart_interval = 0
    coef: list[np.ndarray] = []  # per component: (nblocks, 64) zigzag
    comps: list[dict] = []
    geom: dict = {}

    i = 2
    n = len(payload)
    while i + 4 <= n:
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
                quants[tid] = np.frombuffer(body[j + 1 : j + 65], np.uint8).astype(
                    np.int64
                )
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                (dc_tables if cls == 0 else ac_tables)[tid] = _decode_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xC2:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hv, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "q": qid})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcu_y = -(-fh // (8 * vmax))
            mcu_x = -(-fw // (8 * hmax))
            check_raster(
                mcu_x * hmax * 8, mcu_y * vmax * 8, 8 * nc, what="JPEG raster"
            )
            geom = {"h": fh, "w": fw, "hmax": hmax, "vmax": vmax,
                    "mcu_y": mcu_y, "mcu_x": mcu_x}
            for c in comps:
                if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
                    raise ValueError("bad sampling factors")
                # full MCU-padded grid (interleaved DC addressing) and
                # the tighter non-interleaved grid both live here
                c["bx_full"] = mcu_x * c["h"]
                c["by_full"] = mcu_y * c["v"]
                cw = -(-fw * c["h"] // hmax)  # ceil component width
                ch = -(-fh * c["v"] // vmax)
                c["bx_ni"] = -(-cw // 8)
                c["by_ni"] = -(-ch // 8)
                coef.append(
                    np.zeros((c["by_full"] * c["bx_full"], 64), dtype=np.int32)
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif marker in (0xC9, 0xCA, 0xCB):
            raise ValueError("unsupported_arithmetic: JPEG arithmetic coding")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            sc = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    (k for k, cc in enumerate(comps) if cc["id"] == cid), None
                )
                if idx is None:
                    raise ValueError("scan references unknown component")
                sc.append((idx, tids >> 4, tids & 0xF))
            Ss, Se, AhAl = body[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0xF
            data_start = i + 2 + size
            consumed = _decode_scan(
                payload, data_start, coef, comps, geom, sc,
                dc_tables, ac_tables, Ss, Se, Ah, Al, restart_interval,
            )
            i = data_start + consumed
            continue
        i += 2 + size

    if not comps:
        raise ValueError("missing SOF2/SOS in JPEG stream")
    for c in comps:
        if c["q"] not in quants:
            raise ValueError("missing quantization table")

    # ---- shared reconstruction: dequantize + un-zigzag + IDCT -------------
    h, w = geom["h"], geom["w"]
    full = []
    for ci, c in enumerate(comps):
        qzz = quants[c["q"]]
        cz = coef[ci].astype(np.int64) * qzz
        nat = np.zeros(cz.shape, dtype=np.float64)
        nat[:, ZIGZAG] = cz
        pix = (_D.T @ nat.reshape(-1, 8, 8)) @ _D + 128.0
        by, bx = c["by_full"], c["bx_full"]
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        ry, rx = geom["vmax"] // c["v"], geom["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component JPEG unsupported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.empty((*y.shape, 3), dtype=np.float64)
    rgb[..., 0] = y + 1.402 * cr
    rgb[..., 1] = y - 0.344136286 * cb - 0.714136286 * cr
    rgb[..., 2] = y + 1.772 * cb
    return np.clip(np.round(rgb, out=rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    payload, data_start, coef, comps, geom, sc,
    dc_tables, ac_tables, Ss, Se, Ah, Al, restart_interval,
) -> int:
    """Apply one scan to the coefficient store. Returns the byte length
    of the entropy segment consumed (so the marker walk can resume at
    the next marker)."""
    br = _BitReader(payload, data_start)
    dc_scan = Ss == 0
    if dc_scan:
        if Se != 0:
            raise ValueError("DC scan with Se != 0")
    else:
        if len(sc) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (1 <= Ss <= Se <= 63):
            raise ValueError("bad spectral band")
    if Ah not in range(14) or Al not in range(14) or (Ah and Ah != Al + 1):
        raise ValueError("bad successive-approximation parameters")

    if dc_scan:
        _decode_dc_scan(
            br, coef, comps, geom, sc, dc_tables, Ah, Al, restart_interval
        )
    else:
        _decode_ac_scan(
            br, coef, comps, sc[0], ac_tables, Ss, Se, Ah, Al, restart_interval
        )

    # consumed bytes: everything up to the next true marker. The
    # entropy segment's unstuffed length is not the raw length; rescan
    # the raw bytes for the terminating marker (cheap: find is C-speed).
    i = data_start
    n = len(payload)
    while True:
        j = payload.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            return n - data_start
        b2 = payload[j + 1]
        if b2 == 0x00 or 0xD0 <= b2 <= 0xD7:
            i = j + 2
            continue
        return j - data_start


def _decode_dc_scan(br, coef, comps, geom, sc, dc_tables, Ah, Al, restart_interval):
    """Interleaved (or single-component) DC scan over the MCU grid."""
    preds = [0] * len(sc)
    luts = []
    if Ah == 0:
        for _, dct, _a in sc:
            if dct not in dc_tables:
                raise ValueError("missing DC Huffman table")
            luts.append(dc_tables[dct])
    if len(sc) == 1 and len(comps) > 1:
        # single-component DC scan: walks the component's own grid
        ci = sc[0][0]
        c = comps[ci]
        order = [
            (ci, by * c["bx_full"] + bx)
            for by in range(c["by_ni"])
            for bx in range(c["bx_ni"])
        ]
        per_mcu = 1
    else:
        order = []
        for my in range(geom["mcu_y"]):
            for mx in range(geom["mcu_x"]):
                for k, (ci, _d, _a) in enumerate(sc):
                    c = comps[ci]
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            order.append(
                                (
                                    ci,
                                    (my * c["v"] + dy) * c["bx_full"]
                                    + mx * c["h"]
                                    + dx,
                                )
                            )
        per_mcu = sum(comps[ci]["h"] * comps[ci]["v"] for ci, _d, _a in sc)
    ci_to_k = {ci: k for k, (ci, _d, _a) in enumerate(sc)}
    p1 = 1 << Al
    for pos, (ci, bidx) in enumerate(order):
        if (
            restart_interval
            and pos % (restart_interval * per_mcu) == 0
            and pos
        ):
            br.restart()
            preds = [0] * len(sc)
        k = ci_to_k[ci]
        if Ah == 0:
            s = br.huff(luts[k])
            if s > 16:
                raise ValueError("corrupt DC size category")
            diff = _extend(br.receive(s), s) if s else 0
            preds[k] += diff
            coef[ci][bidx, 0] = preds[k] << Al
        else:
            if br.bit():
                coef[ci][bidx, 0] |= p1


def _decode_ac_scan(br, coef, comps, scomp, ac_tables, Ss, Se, Ah, Al, restart_interval):
    ci, _dct, act = scomp
    if act not in ac_tables:
        raise ValueError("missing AC Huffman table")
    lut = ac_tables[act]
    c = comps[ci]
    blocks = [
        by * c["bx_full"] + bx
        for by in range(c["by_ni"])
        for bx in range(c["bx_ni"])
    ]
    cf = coef[ci]
    eobrun = 0
    p1 = 1 << Al
    m1 = -p1
    for pos, bidx in enumerate(blocks):
        if restart_interval and pos and pos % restart_interval == 0:
            br.restart()
            eobrun = 0
        zz = cf[bidx]
        if Ah == 0:
            # ---- first pass (G.1.2.2) --------------------------------
            if eobrun > 0:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = br.huff(lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > Se:
                    raise ValueError("AC run past band end")
                zz[k] = _extend(br.receive(s), s) << Al
                k += 1
        else:
            # ---- refinement pass (G.1.2.3) ---------------------------
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = br.huff(lut)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.receive(r)
                            break
                        # r == 15: pass over 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size != 1")
                        newval = p1 if br.bit() else m1
                    while k <= Se:
                        v = int(zz[k])
                        if v != 0:
                            if br.bit() and (v & p1) == 0:
                                zz[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                if newval:
                                    zz[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
                    else:
                        if newval:
                            raise ValueError("AC refinement ran past band")
            if eobrun > 0:
                while k <= Se:
                    v = int(zz[k])
                    if v != 0:
                        if br.bit() and (v & p1) == 0:
                            zz[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
