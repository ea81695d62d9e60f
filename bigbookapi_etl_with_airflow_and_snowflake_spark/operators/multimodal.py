"""Multimodal column plumbing (SURVEY.md §2.5 N5).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata carried alongside. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition discipline — is real and
tested. Decode has two tiers:

- **Real decode** for formats implementable without codec libraries:
  24-bit BI_RGB BMP (:func:`decode_bmp`), binary PPM/PGM
  (:func:`decode_ppm`), 8-bit non-interlaced PNG (:func:`decode_png` —
  stdlib zlib inflate + numpy un-filtering, filters 0-4), baseline
  sequential JPEG (``jpegcodec.decode_jpeg`` — canonical Huffman + 8×8
  IDCT + chroma upsampling, pure numpy), and GIF87a/89a
  (``gifcodec.decode_gif`` — variable-width LZW, palettes,
  interlacing), dispatched by magic bytes in :func:`decode_image`;
  RIFF/WAVE audio incl. float PCM and G.711 (:func:`decode_wav`);
  RIFF/AVI video demux (:func:`demux_avi_frames` — MJPEG frames then
  decode via the JPEG codec). Real nearest-neighbor resize + PPM/PNG
  re-encode rides on top. Every decoder is wrapped in
  :func:`quarantine_decoder`, so malformed payloads surface as
  ``ValueError`` only (fuzz-locked in tests/test_robustness.py).
- **Demux-without-decode** where the frame STRUCTURE is plain math even
  though the audio itself needs a codec: :func:`demux_mp3_frames` walks
  MPEG-1 Layer III frame headers (bitrate/rate/duration) without
  touching the entropy-coded payload — corpus triage at 100 TB never
  pays codec cost.
- **Stub decode** for media needing true codec libraries (full MP3/AAC
  synthesis, non-AVI containers, arithmetic-coded JPEG): not in this
  container, so :func:`decode_stub` either raises
  ``NotImplementedError`` (strict mode) or produces a deterministic
  fake so the distributed plumbing stays testable. (Progressive JPEG
  is NOT a stub — jpegprog.py decodes SOF2 for real.)

At 100 TB: payload columns dominate I/O, so every operator here projects
payload bytes only where needed (column pruning keeps metadata-only
queries from touching the blobs at all), and decode runs as Arrow-batched
``mapInPandas`` — one Python worker per core, zero per-row overhead.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .limits import check_raster


def quarantine_decoder(fn):
    """Enforce the quarantine contract at a decoder's API boundary:
    whatever a malformed payload trips internally (IndexError from a
    truncated table, struct.error from a short header, KeyError from a
    corrupt Huffman spec, zlib.error...), callers see ``ValueError`` and
    nothing else — ``image_stats``/``audio_stats`` catch exactly that,
    and any other type would escape the except and fail a 100 TB job.
    Found by the bit-flip fuzzer in tests/test_robustness.py, kept as a
    structural guarantee rather than per-site patches."""
    import functools
    import zlib

    @functools.wraps(fn)
    def run(payload, *args, **kwargs):
        try:
            return fn(payload, *args, **kwargs)
        except ValueError:
            raise
        except (IndexError, KeyError, OverflowError, struct.error, zlib.error) as exc:
            raise ValueError(f"malformed payload: {type(exc).__name__}: {exc}") from exc

    return run


def with_byte_metadata(
    df: DataFrame, payload_col: str, id_col: str
) -> DataFrame:
    """Attach byte-level metadata to an opaque payload.

    Strings are converted to their UTF-8 binary form first, so the same
    operator serves text payloads and true binary (image/audio) columns.
    The content hash is md5 — portable across engines, usable as an
    exact-dedup key for blobs.
    """
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
    )


@quarantine_decoder
def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB Windows BMP to an RGB
    (height, width, 3) uint8 array. Pure numpy — handles the 4-byte row
    padding, BGR channel order, and bottom-up vs top-down row order
    (negative height). Raises ``ValueError`` on anything else (other bit
    depths / BI_RLE compression need a real codec)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_offset + row_stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


@quarantine_decoder
def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6 → (h, w, 3)) or PGM (P5 → (h, w, 1)) with
    maxval ≤ 255 to a uint8 array. Pure numpy; handles comment lines and
    arbitrary whitespace in the header per the netpbm spec."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end-of-line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = width * height * channels
    if len(payload) < i + n:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(payload, dtype=np.uint8, count=n, offset=i).reshape(
        height, width, channels
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode a (h, w, 3) or (h, w, 1) uint8 array as binary P6/P5."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only; palette/16-bit/
# interlace raise — they need tables or bit-unpacking beyond this tier)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): nearest of left/up/up-left
    to the linear estimate a + b − c, ties resolved a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 → (height, stride) uint8.
    Filters None/Up vectorize (uint8 addition wraps mod 256 natively);
    Sub/Average/Paeth have intra-row byte dependencies and walk the
    row — per-row Python, but each payload decodes inside an
    Arrow-batched worker so the loop never crosses the row boundary."""
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:
            out[y] = line + prev
        elif f in (1, 3, 4):
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + ((a + int(prev[x])) >> 1)
                else:
                    v = line[x] + _png_paeth(
                        a, int(prev[x]), int(prev[x - bpp]) if x >= bpp else 0
                    )
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    return out


@quarantine_decoder
def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced truecolor/grayscale(+alpha) PNG to
    a (h, w, channels) uint8 array — stdlib ``zlib`` inflate + numpy
    un-filtering, no codec libraries. Palette (needs PLTE indirection),
    16-bit (bit unpacking), and Adam7 interlace raise ``ValueError``;
    corrupt streams surface as ``ValueError`` too (quarantine contract)."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if len(body) < size:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + size  # length + type + body + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"{depth}-bit PNG unsupported (8-bit only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color} unsupported (palette needs PLTE)")
    if interlace:
        raise ValueError("Adam7-interlaced PNG unsupported")
    if not width or not height:
        raise ValueError("empty PNG raster")
    channels = _PNG_CHANNELS[color]
    check_raster(width, height, channels, what="PNG raster")
    stride = width * channels
    expected = height * (stride + 1)  # each scanline: 1 filter byte + pixels
    try:
        # bounded inflate: a zlib bomb can't allocate past the declared
        # raster size no matter what the compressed stream claims
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
            raise ValueError("PNG zlib stream inflates past declared raster size")
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG zlib stream: {exc}") from exc
    return _png_unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w, c) uint8 array (c ∈ {1, 2, 3, 4}) as an 8-bit
    non-interlaced PNG — filter 0 scanlines, one zlib-deflated IDAT."""
    import zlib

    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = img.astype(np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@quarantine_decoder
def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch to the real decoders (BMP, PPM/PGM, PNG,
    baseline JPEG — all pure numpy + stdlib). Raises ``ValueError`` for
    formats that genuinely need codec libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gifcodec import decode_gif

        return decode_gif(payload)
    raise ValueError("unsupported image format (needs a codec library)")


def nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w, c) array — the standard
    index-grid gather, fully vectorized."""
    h, w, _ = img.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return img[rows[:, None], cols[None, :]]


def image_stats(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    reason_col: str | None = None,
) -> DataFrame:
    """REAL image decode over binary payloads: (id, width, height,
    channels, mean_pixel) via Arrow-batched ``mapInPandas`` and the pure
    numpy decoders. Unsupported/corrupt payloads yield nulls (the
    100 TB posture: a bad blob must not fail the job — filter on
    ``width IS NULL`` to quarantine). Pass ``reason_col`` to append a
    string column carrying each quarantined row's classified failure
    (e.g. ``unsupported_arithmetic`` vs ``malformed``), so triage can
    separate "needs a codec we don't ship" from "junk bytes" without
    re-decoding."""
    out_schema = (
        f"{id_col} long, width int, height int, channels int, mean_pixel double"
    )
    if reason_col:
        out_schema += f", {reason_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], "width": [], "height": [], "channels": [], "mean_pixel": []}
            if reason_col:
                out[reason_col] = []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    img = decode_image(bytes(p) if p is not None else b"")
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["channels"].append(img.shape[2])
                    out["mean_pixel"].append(round(float(img.mean()), 6))
                    if reason_col:
                        out[reason_col].append(None)
                except ValueError as exc:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["mean_pixel"].append(None)
                    if reason_col:
                        out[reason_col].append(str(exc)[:120])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def _g711_ulaw_table() -> np.ndarray:
    """µ-law byte → normalized float64, by the G.711 expansion formula
    (ITU-T): magnitude = (((mantissa << 3) + 0x84) << exponent) − 0x84."""
    u = ~np.arange(256, dtype=np.int64) & 0xFF
    sign = np.where(u & 0x80, -1.0, 1.0)
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return sign * mag / 32768.0


def _g711_alaw_table() -> np.ndarray:
    """A-law byte → normalized float64 (G.711: XOR 0x55, chord/step).

    Sign convention per ITU G.711 / Sun g711.c ``alaw2linear``: after the
    XOR with 0x55, a SET sign bit (0x80) means POSITIVE (``return
    (a_val & SIGN_BIT) ? t : -t``) — the opposite of µ-law, where the
    complemented byte's sign bit means negative."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = np.where(a & 0x80, 1.0, -1.0)
    exp = (a >> 4) & 0x7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return sign * mag / 32768.0


@quarantine_decoder
def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE payload to ``(sample_rate, n_channels,
    samples)`` where ``samples`` is an (n_frames, n_channels) float64
    array normalized to [-1, 1]. Pure numpy — walks the RIFF chunk list
    (fmt/data chunks in any order, unknown chunks skipped). Handles
    every WAV encoding that is math rather than a codec: integer PCM
    (8-bit unsigned, 16/24/32-bit signed), IEEE float (32/64-bit), and
    G.711 µ-law/A-law companding (table expansion). Raises
    ``ValueError`` on true codecs (MP3/AAC/ADPCM)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    # corrupt-but-RIFF payloads must raise ValueError (the quarantine
    # contract), never struct.error / ZeroDivisionError downstream
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk truncated ({len(fmt)} < 16 bytes)")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the GUID's first u16
        audio_format = struct.unpack_from("<H", fmt, 24)[0]
    if n_channels == 0 or sample_rate == 0:
        raise ValueError(f"invalid fmt: {n_channels} channels @ {sample_rate} Hz")
    if audio_format == 1:  # integer PCM
        if bits == 16:
            raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
            samples = raw.astype(np.float64) / 32768.0
        elif bits == 8:
            raw = np.frombuffer(data, dtype=np.uint8)
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        elif bits == 24:
            # no 3-byte dtype: widen to int32 via byte assembly
            b = np.frombuffer(data, dtype=np.uint8, count=(len(data) // 3) * 3)
            b = b.reshape(-1, 3).astype(np.int64)
            raw = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            raw = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
            samples = raw.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(data, dtype="<i4", count=len(data) // 4)
            samples = raw.astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"{bits}-bit PCM unsupported")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4", count=len(data) // 4).astype(
                np.float64
            )
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8", count=len(data) // 8).copy()
        else:
            raise ValueError(f"{bits}-bit IEEE-float WAV unsupported")
    elif audio_format == 6:  # G.711 A-law
        samples = _g711_alaw_table()[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 7:  # G.711 µ-law
        samples = _g711_ulaw_table()[np.frombuffer(data, dtype=np.uint8)]
    else:
        raise ValueError(f"WAV format {audio_format} needs a real codec (MP3/AAC/ADPCM)")
    n_frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames, n_channels) float64 [-1, 1] array as 16-bit
    PCM RIFF/WAVE."""
    n_frames, n_channels = samples.shape
    raw = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_stats(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL audio decode over binary payloads: (id, sample_rate,
    n_channels, n_frames, duration_s, rms, peak) via Arrow-batched
    ``mapInPandas`` and the pure-numpy WAV decoder. Undecodable payloads
    yield nulls (quarantine, don't fail the job). ``duration_s``/``rms``
    are single IEEE operations over exact integer accumulations —
    engine-portable for oracle checks."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_channels int, n_frames long, "
        "duration_s double, rms double, peak double"
    )
    cols = ["sample_rate", "n_channels", "n_frames", "duration_s", "rms", "peak"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], **{c: [] for c in cols}}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    rate, nch, samples = decode_wav(bytes(p) if p is not None else b"")
                    flat = samples.ravel()
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(nch)
                    out["n_frames"].append(len(samples))
                    out["duration_s"].append(float(len(samples)) / rate)
                    # NOT rounded: sample values are exact dyadics
                    # (k/2^7 or k/2^15), so sums are exact and the one
                    # divide + sqrt are correctly rounded — identical
                    # doubles in any engine; decimal rounding would
                    # re-introduce tie-break ambiguity
                    out["rms"].append(
                        float(np.sqrt((flat * flat).sum() / len(flat)))
                        if len(flat)
                        else None
                    )
                    out["peak"].append(
                        float(np.abs(flat).max()) if len(flat) else None
                    )
                except ValueError:
                    for c in cols:
                        out[c].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


# --- MP3: frame-header demux tier (not a decoder) --------------------------
# Full MP3 decode is a true codec (MDCT synthesis filterbank) and stays a
# strict stub; but the FRAME STRUCTURE is plain header math — the same
# demux-without-decode tier as RIFF/AVI chunk-walking. Header layout and
# tables per ISO/IEC 11172-3.

_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_MP3_RATES_V1 = (44100, 48000, 32000, 0)


@quarantine_decoder
def demux_mp3_frames(payload: bytes) -> tuple[int, list[int]]:
    """Walk an MPEG-1 Layer III stream's frame headers WITHOUT decoding
    audio: returns ``(sample_rate, [bitrate_kbps per frame])``. Each
    frame is 1152 samples; frame length is ``144 * bitrate / rate +
    padding`` bytes. Skips a leading ID3v2 tag (syncsafe size) and a
    trailing 128-byte ID3v1 tag; anything that breaks sync or declares a
    reserved bitrate/rate index raises ``ValueError`` (quarantine
    contract). MPEG-2/2.5 and other layers raise too — honest scope,
    matching the decoder tiers that only take formats that are math."""
    i = 0
    n = len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("corrupt ID3v2 syncsafe size")
            size = (size << 7) | b
        i = 10 + size
    rate = None
    bitrates: list[int] = []
    while i < n:
        if n - i == 128 and payload[i : i + 3] == b"TAG":
            break  # ID3v1 trailer
        if n - i < 4:
            raise ValueError("truncated MP3 frame header")
        h = int.from_bytes(payload[i : i + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("lost MP3 frame sync")
        if (h >> 19) & 3 != 3 or (h >> 17) & 3 != 1:
            raise ValueError("only MPEG-1 Layer III framing supported")
        br = _MP3_BITRATES_V1L3[(h >> 12) & 0xF]
        sr = _MP3_RATES_V1[(h >> 10) & 3]
        if not br or not sr:
            raise ValueError("reserved MP3 bitrate/sample-rate index")
        if rate is None:
            rate = sr
        elif sr != rate:
            raise ValueError("sample rate changes mid-stream")
        bitrates.append(br)
        i += 144 * br * 1000 // sr + ((h >> 9) & 1)
        if i > n:
            raise ValueError("truncated MP3 frame body")
    if rate is None:
        raise ValueError("no MP3 frames in payload")
    return rate, bitrates


def audio_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """MP3 stream metadata over binary payloads via Arrow-batched
    ``mapInPandas``: (id, n_frames, sample_rate, bitrate_kbps,
    duration_s) from frame headers alone — no audio decode, so a 100 TB
    corpus triage (duration histograms, VBR detection, junk filtering)
    never pays codec cost. Unparseable payloads yield nulls.
    ``bitrate_kbps`` is the mean over frames (equals the constant for
    CBR); ``duration_s`` is one IEEE divide of exact integers —
    engine-portable for the oracle."""
    out_schema = (
        f"{id_col} long, n_frames int, sample_rate int, "
        "bitrate_kbps double, duration_s double"
    )
    cols = ["n_frames", "sample_rate", "bitrate_kbps", "duration_s"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], **{c: [] for c in cols}}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    rate, brs = demux_mp3_frames(bytes(p) if p is not None else b"")
                    out["n_frames"].append(len(brs))
                    out["sample_rate"].append(rate)
                    out["bitrate_kbps"].append(float(sum(brs)) / len(brs))
                    out["duration_s"].append(float(len(brs) * 1152) / rate)
                except ValueError:
                    for c in cols:
                        out[c].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def decode_stub(payload: bytes, strict: bool = False) -> list[float]:
    """STUB media decode. Real implementation needs image/audio codecs
    (PIL / torchaudio / ffmpeg) that are not in this container.

    Non-strict mode returns a deterministic 8-dim fake feature vector
    derived from payload bytes, so the distributed plumbing (batching,
    schema, shuffle) is testable without codecs.
    """
    if strict:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this environment"
        )
    # deterministic fake: byte-histogram moments over 8 buckets
    if not payload:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b % 8] += 1
    n = len(payload)
    return [round(c / n, 6) for c in buckets]


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched ``mapInPandas``.

    The UDF signature and output schema are the real production shape
    (id + array<double> features); only the inner decode is the stub.
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
    when payloads are large.
    """
    out_schema = f"{id_col} long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [
                decode_stub(
                    p.encode("utf-8") if isinstance(p, str) else (bytes(p) if p is not None else b"")
                )
                for p in payloads
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_stub(payload: bytes, width: int, height: int, strict: bool = False) -> bytes:
    """STUB image resize. The real path decodes with PIL/opencv, resizes,
    re-encodes — none of which is in this container. The deterministic
    fake re-samples the payload bytes to width×height by integer striding,
    preserving the property tests rely on: output length == width*height
    and identical inputs → identical outputs."""
    if strict:
        raise NotImplementedError("image resize requires codec libraries")
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    n = len(payload)
    return bytes(payload[(i * n) // target] for i in range(target))


@quarantine_decoder
def demux_avi_frames(payload: bytes) -> list[bytes]:
    """REAL video demux for RIFF/AVI containers — pure chunk-list
    parsing, no codec library: walks the top-level RIFF, descends LIST
    chunks to find ``movi``, and returns the video stream's frame
    payloads (``00dc``/``00db`` chunks) in order. MJPEG-in-AVI frames
    then decode with :func:`decode_image` (the pure-numpy baseline JPEG
    codec); other codecs' frame bytes still demux — decode is where a
    codec would be needed, not here. Raises ``ValueError`` on non-AVI
    or truncated containers."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            body_start = i + 8
            if body_start + size > len(payload):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(body_start + 4, body_start + size)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(payload[body_start : body_start + size])
            i = body_start + size + (size & 1)  # chunks pad to even

    walk(12, len(payload))
    return frames


def mux_avi(frames: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """Minimal single-video-stream AVI container around pre-encoded
    frame payloads (MJPEG when frames come from ``encode_jpeg``) — the
    inverse of :func:`demux_avi_frames` for tests and fixtures."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@quarantine_decoder
def demux_flac_meta(payload: bytes) -> dict:
    """FLAC container metadata WITHOUT decoding audio — 'fLaC' magic,
    then the metadata-block chain; STREAMINFO (block type 0, mandatory
    first) carries everything triage needs. Same demux-not-decode tier
    as the MP3/AVI/MP4 walks. Returns ``{"sample_rate", "channels",
    "bits_per_sample", "total_samples", "duration_s", "min_block",
    "max_block"}``; raises ``ValueError`` on malformed structure."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    if len(payload) < 8 + 34:
        raise ValueError("truncated FLAC header")
    hdr = payload[4]
    if hdr & 0x7F != 0:
        raise ValueError("first FLAC metadata block must be STREAMINFO")
    (blen,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if blen != 34:
        raise ValueError("STREAMINFO must be 34 bytes")
    b = payload[8 : 8 + 34]
    min_block, max_block = struct.unpack_from(">HH", b, 0)
    # 64-bit field packing: rate:20 | channels-1:3 | bps-1:5 | total:36
    packed = int.from_bytes(b[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC sample rate of zero")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bps,
        "total_samples": total,
        "duration_s": total / rate,
        "min_block": min_block,
        "max_block": max_block,
    }


def mux_flac_header(
    sample_rate: int = 44100,
    channels: int = 2,
    bits_per_sample: int = 16,
    total_samples: int = 44100,
    block_size: int = 4096,
) -> bytes:
    """Fixture-side inverse of :func:`demux_flac_meta`: a valid FLAC
    stream head ('fLaC' + last-block STREAMINFO); no frames — the
    demuxer never reads them by contract."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", block_size, block_size)
        + struct.pack(">I", 0)[1:] * 2  # min/max frame size: unknown
        + packed.to_bytes(8, "big")
        + bytes(16)  # md5 of unencoded audio: unset
    )
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def flac_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Distributed FLAC STREAMINFO demux — Arrow-batched, null-row
    quarantine, payload projected only here."""
    cols = [
        "sample_rate", "channels", "bits_per_sample", "total_samples",
        "duration_s", "min_block", "max_block",
    ]
    out_schema = (
        f"{id_col} long, sample_rate long, channels int, bits_per_sample int, "
        "total_samples long, duration_s double, min_block int, max_block int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], **{c: [] for c in cols}}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    meta = demux_flac_meta(bytes(p) if p is not None else b"")
                    for c in cols:
                        out[c].append(meta[c])
                except ValueError:
                    for c in cols:
                        out[c].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Iterate ``(type, body_start, box_end)`` over the ISO-BMFF boxes
    in ``payload[start:end]`` — ``[size:4][type:4]`` with 64-bit
    largesize honored; raises on overruns. NOT quarantine-decorated:
    decorating a GENERATOR is a no-op (exceptions raise during
    iteration in the caller's frame, after the decorator's try has
    returned) — the public demuxers carry the decorator instead."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, i)
        btype = payload[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, i + 8)
            body = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError(f"mp4 box {btype!r} overruns container")
        yield btype, body, i + size
        i += size


def _mp4_find(payload: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _mp4_boxes(payload, start, end):
        if t == btype:
            return b, e
    return None


@quarantine_decoder
def demux_mp4_meta(payload: bytes) -> dict:
    """Walk an ISO BMFF (MP4/MOV/M4A) box tree WITHOUT decoding media —
    the same demux-not-decode tier as :func:`demux_mp3_frames` and
    :func:`demux_avi_frames`, extended to the container that dominates
    real video corpora. Pure structure math: ``[size:4][type:4]`` boxes
    (64-bit largesize honored), ``moov/trak/mdia/minf/stbl`` descent.

    Returns: ``{"major_brand", "duration_s" (from mvhd), "n_tracks",
    "video_codec", "width", "height", "n_video_samples",
    "audio_codec", "audio_rate"}`` — absent tracks leave None fields.
    Raises ``ValueError`` on malformed structure (quarantine contract);
    never touches sample data, so cost is O(box count), not O(bytes).
    """
    n = len(payload)

    def boxes(start: int, end: int):
        return _mp4_boxes(payload, start, end)

    def find(start: int, end: int, btype: bytes):
        return _mp4_find(payload, start, end, btype)

    out = {
        "major_brand": None, "duration_s": None, "n_tracks": 0,
        "video_codec": None, "width": None, "height": None,
        "n_video_samples": None, "audio_codec": None, "audio_rate": None,
    }
    moov = None
    for t, b, e in boxes(0, n):
        if t == b"ftyp":
            out["major_brand"] = payload[b : b + 4].decode("latin-1")
        elif t == b"moov":
            moov = (b, e)
    if moov is None:
        raise ValueError("no moov box in mp4 payload")
    mb, me = moov
    mvhd = find(mb, me, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    ver = payload[mvhd[0]]
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, mvhd[0] + 20)
    else:
        timescale, duration = struct.unpack_from(">II", payload, mvhd[0] + 12)
    if not timescale:
        raise ValueError("mvhd timescale of zero")
    out["duration_s"] = duration / timescale
    for t, tb, te in boxes(mb, me):
        if t != b"trak":
            continue
        out["n_tracks"] += 1
        mdia = find(tb, te, b"mdia")
        if mdia is None:
            raise ValueError("trak without mdia")
        hdlr = find(mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise ValueError("mdia without hdlr")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12]
        minf = find(mdia[0], mdia[1], b"minf")
        if minf is None:
            raise ValueError("mdia without minf")
        stbl = find(minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("minf without stbl")
        stsd = find(stbl[0], stbl[1], b"stsd")
        if stsd is None:
            raise ValueError("stbl without stsd")
        # stsd: ver/flags + entry_count, then sample entries
        codec = payload[stsd[0] + 12 : stsd[0] + 16].decode("latin-1")
        if handler == b"vide":
            out["video_codec"] = codec
            tkhd = find(tb, te, b"tkhd")
            if tkhd is not None:
                # width/height live after ver/flags + times + track_id +
                # reserved + duration + reserved(8) + layer/alt/volume/
                # reserved(8) + matrix(36): 76 bytes for v0, 88 for v1
                tver = payload[tkhd[0]]
                off = tkhd[0] + (88 if tver == 1 else 76)
                wfix, hfix = struct.unpack_from(">II", payload, off)
                out["width"] = wfix >> 16  # 16.16 fixed point
                out["height"] = hfix >> 16
            stsz = find(stbl[0], stbl[1], b"stsz")
            if stsz is not None:
                _fixed, count = struct.unpack_from(">II", payload, stsz[0] + 4)
                out["n_video_samples"] = count
        elif handler == b"soun":
            out["audio_codec"] = codec
            mdhd = find(mdia[0], mdia[1], b"mdhd")
            if mdhd is not None:
                mver = payload[mdhd[0]]
                (ts,) = struct.unpack_from(
                    ">I", payload, mdhd[0] + (20 if mver == 1 else 12)
                )
                out["audio_rate"] = ts
    return out


def mux_mp4(
    major_brand: bytes = b"isom",
    duration_s: float = 1.0,
    video: tuple[bytes, int, int, int] | None = (b"avc1", 64, 48, 25),
    audio: tuple[bytes, int] | None = (b"mp4a", 44100),
) -> bytes:
    """Minimal deterministic ISO BMFF muxer — the fixture-side inverse
    of :func:`demux_mp4_meta` (metadata boxes only; no mdat — the
    demuxer never reads sample data by contract). ``video`` =
    (codec_fourcc, width, height, n_samples); ``audio`` =
    (codec_fourcc, sample_rate)."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    timescale = 1000
    duration = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration) + bytes(80),
    )
    traks = b""
    tid = 1
    if video is not None:
        codec, w, h, nsamp = video
        tkhd = box(
            b"tkhd",
            # ver/flags, ctime, mtime, track_id, reserved, then the
            # 56 bytes of duration/reserved/layer/volume/matrix that
            # precede the 16.16 fixed-point width/height (body off 76)
            b"\x00\x00\x00\x07" + struct.pack(">IIII", 0, 0, tid, 0)
            + bytes(56) + struct.pack(">II", w << 16, h << 16),
        )
        stsd = box(
            b"stsd",
            b"\x00\x00\x00\x00" + struct.pack(">I", 1)
            + box(codec, bytes(78)),
        )
        stsz = box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, nsamp)
                   + b"".join(struct.pack(">I", 100 + i) for i in range(nsamp)))
        # stts: two duration runs — first ceil(n/2) samples at 500
        # ticks, the rest at 700 (the per-sample walk in
        # demux_mp4_samples reads these back; deterministic from nsamp)
        half = (nsamp + 1) // 2
        runs = [(half, 500)] + ([(nsamp - half, 700)] if nsamp - half else [])
        runs = [(c, d) for c, d in runs if c]
        stts = box(
            b"stts",
            b"\x00\x00\x00\x00" + struct.pack(">I", len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        stbl = box(b"stbl", stsd + stts + stsz)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", b"\x00\x00\x00\x00" + bytes(4) + b"vide" + bytes(13))
        mdhd = box(b"mdhd", b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration) + bytes(4))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
        tid += 1
    if audio is not None:
        codec, rate = audio
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07" + struct.pack(">IIII", 0, 0, tid, 0)
            + bytes(60) + struct.pack(">II", 0, 0),
        )
        stsd = box(
            b"stsd",
            b"\x00\x00\x00\x00" + struct.pack(">I", 1)
            + box(codec, bytes(28)),
        )
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", b"\x00\x00\x00\x00" + bytes(4) + b"soun" + bytes(13))
        mdhd = box(b"mdhd", b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, rate, int(duration_s * rate)) + bytes(4))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    ftyp = box(b"ftyp", major_brand + struct.pack(">I", 0x200) + b"isomiso2")
    moov = box(b"moov", mvhd + traks)
    return ftyp + moov


@quarantine_decoder
def demux_mp4_samples(payload: bytes) -> list[dict]:
    """Per-sample stts/stsz walk of the FIRST video track — the sample
    table a seek/clip/frame-sample pipeline actually needs: for every
    sample, its byte size (stsz), duration (stts run expansion) and
    cumulative decode timestamp, all in media-timescale ticks. Still
    demux-not-decode: O(sample count) arithmetic over two metadata
    boxes, zero mdat bytes touched.

    Returns ``[{"sample_idx", "size_bytes", "dt_ticks", "ts_ticks"}]``
    in decode order. Raises ``ValueError`` on malformed structure or an
    stts/stsz sample-count disagreement (quarantine contract — a
    corrupt sample table must never silently truncate a clip job).
    """
    n = len(payload)
    moov = _mp4_find(payload, 0, n, b"moov")
    if moov is None:
        raise ValueError("no moov box in mp4 payload")
    for t, tb, te in _mp4_boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _mp4_find(payload, tb, te, b"mdia")
        if mdia is None:
            raise ValueError("trak without mdia")
        hdlr = _mp4_find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise ValueError("mdia without hdlr")
        if payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _mp4_find(payload, mdia[0], mdia[1], b"minf")
        stbl = minf and _mp4_find(payload, minf[0], minf[1], b"stbl")
        if not stbl:
            raise ValueError("video trak without minf/stbl")
        stsz = _mp4_find(payload, stbl[0], stbl[1], b"stsz")
        stts = _mp4_find(payload, stbl[0], stbl[1], b"stts")
        if stsz is None or stts is None:
            raise ValueError("video stbl without stsz/stts")
        fixed, count = struct.unpack_from(">II", payload, stsz[0] + 4)
        if fixed:
            sizes = [fixed] * count
        else:
            if stsz[0] + 12 + 4 * count > stsz[1]:
                raise ValueError("stsz entry table overruns its box")
            sizes = list(struct.unpack_from(f">{count}I", payload, stsz[0] + 12))
        (nruns,) = struct.unpack_from(">I", payload, stts[0] + 4)
        if stts[0] + 8 + 8 * nruns > stts[1]:
            raise ValueError("stts run table overruns its box")
        runs = [
            struct.unpack_from(">II", payload, stts[0] + 8 + 8 * k)
            for k in range(nruns)
        ]
        if sum(c for c, _ in runs) != count:
            raise ValueError(
                f"stts covers {sum(c for c, _ in runs)} samples, stsz has {count}"
            )
        out: list[dict] = []
        ts = 0
        i = 0
        for c, delta in runs:
            for _ in range(c):
                out.append(
                    {
                        "sample_idx": i,
                        "size_bytes": sizes[i],
                        "dt_ticks": delta,
                        "ts_ticks": ts,
                    }
                )
                ts += delta
                i += 1
        return out
    raise ValueError("no video track in mp4 payload")


def mp4_samples(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Distributed per-sample MP4 sample-table expansion: one
    Arrow-batched ``mapInPandas`` pass emitting one row per video
    sample — ``(id, sample_idx, size_bytes, dt_ticks, ts_ticks)``.
    Corrupt payloads emit no rows (quarantine; pair with
    :func:`mp4_meta` for the per-file null-row audit)."""
    out_schema = (
        f"{id_col} long, sample_idx long, size_bytes long, "
        "dt_ticks long, ts_ticks long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                id_col: [], "sample_idx": [], "size_bytes": [],
                "dt_ticks": [], "ts_ticks": [],
            }
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples = demux_mp4_samples(bytes(p) if p is not None else b"")
                except ValueError:
                    continue
                for s in samples:
                    out[id_col].append(rid)
                    out["sample_idx"].append(s["sample_idx"])
                    out["size_bytes"].append(s["size_bytes"])
                    out["dt_ticks"].append(s["dt_ticks"])
                    out["ts_ticks"].append(s["ts_ticks"])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def mp4_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Distributed MP4/ISO-BMFF metadata demux: one Arrow-batched
    ``mapInPandas`` pass, payload column projected only here, corrupt
    payloads → null row (100 TB posture: a bad blob never fails the
    job)."""
    cols = [
        "major_brand", "duration_s", "n_tracks", "video_codec", "width",
        "height", "n_video_samples", "audio_codec", "audio_rate",
    ]
    out_schema = (
        f"{id_col} long, major_brand string, duration_s double, n_tracks int, "
        "video_codec string, width int, height int, n_video_samples long, "
        "audio_codec string, audio_rate long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], **{c: [] for c in cols}}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    meta = demux_mp4_meta(bytes(p) if p is not None else b"")
                    for c in cols:
                        out[c].append(meta[c])
                except ValueError:
                    for c in cols:
                        out[c].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_stub(
    payload: bytes, every_n: int = 10, frame_size: int = 64, strict: bool = False
) -> list[bytes]:
    """STUB video frame sampling for non-AVI payloads (real containers
    like MP4 need a demuxer beyond this tier). The fake treats the
    payload as fixed-size frames and takes every ``every_n``-th chunk —
    same output shape as the real AVI path."""
    if strict:
        raise NotImplementedError("non-AVI frame sampling requires ffmpeg")
    if not payload:
        return []
    frames = [
        payload[i : i + frame_size] for i in range(0, len(payload), frame_size)
    ]
    return frames[::every_n]


def resize_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """Distributed image resize over binary payloads (mapInPandas).
    BMP/PPM/PGM payloads take the REAL path — numpy decode →
    nearest-neighbor resample → P6/P5 re-encode; other formats fall back
    to :func:`resize_stub` (codec-less container). Output: (id, resized
    binary, n_bytes)."""
    out_schema = f"{id_col} long, resized binary, n_bytes int"

    def one(raw: bytes) -> bytes:
        try:
            return encode_ppm(nn_resize(decode_image(raw), width, height))
        except ValueError:
            return resize_stub(raw, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                one(
                    p.encode("utf-8") if isinstance(p, str) else (bytes(p) if p is not None else b""),
                )
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": resized,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_n: int = 10,
    frame_size: int = 64,
) -> DataFrame:
    """Distributed frame sampling: one output row per sampled frame
    (id, frame_no, frame bytes) — the exploded shape downstream encoders
    consume. RIFF/AVI payloads take the REAL path (chunk-list demux via
    :func:`demux_avi_frames`; MJPEG frames then decode with the
    pure-numpy JPEG codec); other payloads fall back to the stub."""
    out_schema = f"{id_col} long, frame_no int, frame binary"

    def one(raw: bytes) -> list[bytes]:
        try:
            return demux_avi_frames(raw)[::every_n]
        except ValueError:
            return frame_sample_stub(raw, every_n, frame_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = (
                    p.encode("utf-8")
                    if isinstance(p, str)
                    else (bytes(p) if p is not None else b"")
                )
                for i, fr in enumerate(one(raw)):
                    ids.append(rid)
                    frame_nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_no": frame_nos, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def dhash_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode → integer
    luma → nearest-neighbor resample to (hash_h, hash_w+1) → bit (i,j)
    set iff gray[i,j] < gray[i,j+1]. Near-identical images (re-encodes,
    small edits, resizes) land within a few bits of each other, so the
    output feeds the SAME banded Hamming near-dup machinery as text
    SimHash (`operators/neardup.py hamming_bits_pairs`) — image-level
    dedup for multimodal training corpora with zero new join shapes.

    Every step is exact integer arithmetic ((299R+587G+114B)//1000
    luma, floor-index resample), so the hash is bit-replayable by any
    engine — no float resize kernels. Output: (id, dhash long — bits
    LSB-first at position i*hash_w+j, two's-complement-wrapped;
    dhash_bits string — the same bits as a '0'/'1' string in position
    order, ready for banding). Arrow-batched ``mapInPandas``;
    undecodable payloads yield null hash columns (quarantine contract,
    as ``image_stats``)."""
    out_schema = f"{id_col} long, dhash long, dhash_bits string"
    nbits = hash_w * hash_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids: list = []
            hashes: list = []
            bitstrs: list = []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                try:
                    img = decode_image(bytes(p) if p is not None else b"")
                    arr = img.astype(np.int64)
                    h, w = arr.shape[0], arr.shape[1]
                    if arr.shape[2] >= 3:
                        gray = (
                            299 * arr[:, :, 0]
                            + 587 * arr[:, :, 1]
                            + 114 * arr[:, :, 2]
                        ) // 1000
                    else:
                        gray = arr[:, :, 0]
                    ri = (np.arange(hash_h) * h) // hash_h
                    cj = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                    g = gray[np.ix_(ri, cj)]
                    bits = (g[:, :-1] < g[:, 1:]).reshape(-1)
                    val = 0
                    for pos in np.nonzero(bits)[0]:
                        val |= 1 << int(pos)
                    if val >= 1 << (nbits - 1) and nbits == 64:
                        val -= 1 << 64
                    hashes.append(val)
                    bitstrs.append("".join("1" if b else "0" for b in bits))
                except ValueError:
                    hashes.append(None)
                    bitstrs.append(None)
            yield pd.DataFrame({id_col: ids, "dhash": hashes, "dhash_bits": bitstrs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
