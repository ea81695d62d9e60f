"""GIF87a/89a codec in pure Python + numpy — no codec libraries
(SURVEY.md §2.5 N5: the palette-indexed compressed-image tier).

Decoder: header + logical screen descriptor, global/local color
tables, 0x21 extension blocks skipped (graphic control, comment,
application — animation control is metadata, the first image frame is
returned), Adam-style 4-pass GIF interlacing, and the GIF variant of
LZW (variable code width 3→12 bits, clear/EOI codes, deferred clear).
Encoder: single-frame GIF87a with a 256-entry global palette; for
grayscale input the palette is the identity gray ramp, which makes the
codec LOSSLESS end-to-end — the property the `gif_decode` oracle query
rides (LZW is lossless by construction; only palette quantization of
true-color input would lose data, and the encoder refuses that instead
of guessing).

The LZW symbol loop is per-code Python (inherent, like the JPEG
Huffman loop); payloads decode inside Arrow-batched ``mapInPandas``
workers, one Python worker per core.
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import check_raster
from .multimodal import quarantine_decoder


# --------------------------------------------------------------------------
# LZW (GIF variant)
# --------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # width parity with the decoder: the decoder's table stays one
        # entry behind the encoder's (it learns pair k while reading
        # k+1), so encoder widens at next_code > 2^w exactly when the
        # decoder's next read can reference a 2^w code
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before raster complete")
    return bytes(out[:n_pixels])


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@quarantine_decoder
def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image frame of a GIF87a/89a payload to an RGB
    (h, w, 3) uint8 array. Handles global and local color tables,
    4-pass interlacing, and skipped extension blocks; raises
    ``ValueError`` on corrupt or truncated streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i]:
                i += payload[i] + 1
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", payload, i + 1)
        i += 10
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        if not w or not h:
            raise ValueError("empty GIF raster")
        check_raster(w, h, 3, what="GIF raster")
        min_code = payload[i]
        i += 1
        lzw = bytearray()
        while i < len(payload) and payload[i]:
            size = payload[i]
            lzw += payload[i + 1 : i + 1 + size]
            i += size + 1
        i += 1
        indices = np.frombuffer(
            _lzw_decode(bytes(lzw), min_code, w * h), np.uint8
        ).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            deinterlaced = np.empty_like(indices)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    deinterlaced[y] = indices[src]
                    src += 1
            indices = deinterlaced
        if indices.max() >= len(pal):
            raise ValueError("GIF index exceeds palette size")
        return pal[indices]
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """Encode a grayscale (h, w, 1) uint8 array as single-frame GIF87a
    with the identity 256-gray global palette — LOSSLESS (palette index
    == pixel value). True-color input raises: palette quantization is a
    lossy design decision this codec refuses to take silently."""
    if img.ndim != 3 or img.shape[2] != 1:
        raise ValueError("encode_gif expects grayscale (h, w, 1); "
                         "quantize true-color input explicitly first")
    h, w = img.shape[:2]
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)  # 256-entry GCT
    ramp = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += ramp.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([8])  # LZW minimum code size
    lzw = _lzw_encode(img.astype(np.uint8).tobytes(), 8)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
