"""Multimodal plumbing tests (N5): the mapInPandas schema/batching/
partitioning paths are real; only the codec inner step is stubbed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import multimodal as M
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").limit(50).cache()


def test_extract_features_shape_and_determinism(spark, docs):
    out = M.extract_features(docs, "text", "doc_id")
    rows = {r["doc_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 50
    assert all(len(v) == 8 for v in rows.values())
    # deterministic: second run bit-identical
    rows2 = {r["doc_id"]: r["features"] for r in M.extract_features(docs, "text", "doc_id").collect()}
    assert rows == rows2
    # fake features are byte-bucket fractions summing to ~1
    for v in rows.values():
        assert abs(sum(v) - 1.0) < 1e-3


def test_extract_features_partitioned(spark, docs):
    # plumbing must be partition-independent: same result at any parallelism
    a = sorted(map(tuple, M.extract_features(docs.repartition(1), "text", "doc_id").collect()))
    b = sorted(map(tuple, M.extract_features(docs.repartition(7), "text", "doc_id").collect()))
    assert a == b


def test_decode_stub_strict_raises():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"xx", strict=True)
    with pytest.raises(NotImplementedError):
        M.resize_stub(b"xx", 4, 4, strict=True)
    with pytest.raises(NotImplementedError):
        M.frame_sample_stub(b"xx", strict=True)


def test_resize_images(spark, docs):
    out = M.resize_images(docs, "text", "doc_id", width=8, height=4)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["n_bytes"] == 32 for r in rows)
    assert all(len(r["resized"]) == 32 for r in rows)


def test_sample_frames(spark, docs):
    out = M.sample_frames(docs, "text", "doc_id", every_n=3, frame_size=100)
    # frame counts match the stub applied locally
    local = {
        r["doc_id"]: len(M.frame_sample_stub(r["text"].encode(), 3, 100))
        for r in docs.collect()
    }
    got = {r[0]: r[1] for r in out.groupBy("doc_id").count().collect()}
    # docs with 0 sampled frames don't appear in the exploded output
    assert got == {k: v for k, v in local.items() if v > 0}


def _make_bmp(pixels_rgb, top_down=False):
    """Build a real uncompressed 24-bit BMP from a (h, w, 3) nested list."""
    import struct

    h, w = len(pixels_rgb), len(pixels_rgb[0])
    stride = (w * 3 + 3) & ~3
    raster = b""
    rows = pixels_rgb if top_down else list(reversed(pixels_rgb))
    for row in rows:
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)  # BGR on disk
        raster += line + b"\x00" * (stride - len(line))
    header_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, header_h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return file_header + info + raster


def test_decode_bmp_real_bytes():
    import numpy as np

    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)], [(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
    for top_down in (False, True):
        img = M.decode_bmp(_make_bmp(px, top_down))
        assert img.shape == (2, 3, 3)
        assert np.array_equal(img, np.array(px, dtype=np.uint8))


def test_decode_ppm_real_bytes_with_comment():
    import numpy as np

    raster = bytes(range(24))
    payload = b"P6\n# a comment\n4 2\n255\n" + raster
    img = M.decode_ppm(payload)
    assert img.shape == (2, 4, 3)
    assert img.tobytes() == raster
    # PGM single-channel
    g = M.decode_ppm(b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4]))
    assert g.shape == (2, 2, 1) and g.tobytes() == bytes([1, 2, 3, 4])
    # roundtrip through the encoder
    assert M.decode_ppm(M.encode_ppm(img)).tobytes() == raster


def test_image_stats_distributed_real_decode(spark):
    """The N5 'partial' closer: REAL bytes decoded distributed, no
    NotImplementedError — (width, height, channels, mean_pixel) correct,
    corrupt payloads quarantined as nulls instead of failing the job."""
    import numpy as np

    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)], [(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
    bmp = _make_bmp(px)
    ppm = b"P6\n3 1\n255\n" + bytes([0, 0, 0, 255, 255, 255, 9, 9, 9])
    rows = [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(b"\x89PNG not supported"))]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    got = {r["img_id"]: r for r in M.image_stats(df, "payload", "img_id").collect()}
    assert got[1]["width"] == 3 and got[1]["height"] == 2 and got[1]["channels"] == 3
    assert got[1]["mean_pixel"] == pytest.approx(
        round(float(np.array(px, dtype=np.uint8).mean()), 6)
    )
    assert got[2]["width"] == 3 and got[2]["height"] == 1
    assert got[2]["mean_pixel"] == pytest.approx(round((255 * 3 + 9 * 3) / 9, 6))
    assert got[3]["width"] is None and got[3]["mean_pixel"] is None


def test_resize_images_real_path(spark):
    """BMP in → decoded, NN-resampled, P6 out; stub fallback untouched
    for non-image payloads."""
    import numpy as np

    px = [
        [(0, 0, 0), (50, 50, 50), (100, 100, 100), (150, 150, 150)],
        [(10, 10, 10), (60, 60, 60), (110, 110, 110), (160, 160, 160)],
        [(20, 20, 20), (70, 70, 70), (120, 120, 120), (170, 170, 170)],
        [(30, 30, 30), (80, 80, 80), (130, 130, 130), (180, 180, 180)],
    ]
    df = spark.createDataFrame([(1, bytearray(_make_bmp(px)))], "img_id long, payload binary")
    out = M.resize_images(df, "payload", "img_id", width=2, height=2).collect()[0]
    img = M.decode_ppm(bytes(out["resized"]))
    want = M.nn_resize(np.array(px, dtype=np.uint8), 2, 2)
    assert np.array_equal(img, want)
    assert out["n_bytes"] == len(bytes(out["resized"]))


def test_decode_wav_roundtrip_and_formats():
    import numpy as np

    t = np.arange(800) / 8000.0
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    payload = M.encode_wav(samples, 8000)
    rate, nch, back = M.decode_wav(payload)
    assert (rate, nch) == (8000, 1) and back.shape == (800, 1)
    # 16-bit quantization error bounded by 1 LSB
    assert float(np.abs(back - samples).max()) <= 1 / 32768.0
    # stereo roundtrip preserves channel interleave
    st = np.stack([samples[:, 0], -samples[:, 0]], axis=1)
    _, nch2, back2 = M.decode_wav(M.encode_wav(st, 44100))
    assert nch2 == 2 and float(np.abs(back2 - st).max()) <= 1 / 32768.0


def test_decode_wav_skips_unknown_chunks_and_rejects_compressed():
    import struct

    import numpy as np

    samples = np.zeros((4, 1)) + 0.25
    payload = M.encode_wav(samples, 8000)
    # splice a LIST chunk between WAVE and fmt — decoder must skip it
    extra = b"LIST" + struct.pack("<I", 6) + b"junk!!"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    _, _, back = M.decode_wav(spliced)
    assert back.shape == (4, 1)
    # non-PCM format code must raise, not mis-decode
    bad = bytearray(payload)
    bad[20:22] = struct.pack("<H", 3)  # IEEE float format
    with pytest.raises(ValueError):
        M.decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        M.decode_wav(b"ID3\x03mp3 data here")


def test_decode_wav_corrupt_riff_raises_value_error_only():
    """Corrupt-but-RIFF payloads must raise ValueError (the quarantine
    contract for audio_stats' except clause), never struct.error or
    ZeroDivisionError."""
    import struct

    import numpy as np

    payload = M.encode_wav(np.zeros((4, 1)) + 0.25, 8000)

    # fmt chunk shorter than the 16-byte PCM header
    short_fmt = b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
    data = b"data" + struct.pack("<I", 2) + b"\x00\x00"
    body = short_fmt + data
    trunc = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError):
        M.decode_wav(trunc)

    # zero channels (would divide by zero in n_frames)
    bad = bytearray(payload)
    bad[22:24] = struct.pack("<H", 0)
    with pytest.raises(ValueError):
        M.decode_wav(bytes(bad))

    # zero sample rate (would divide by zero in audio_stats duration_s)
    bad = bytearray(payload)
    bad[24:28] = struct.pack("<I", 0)
    with pytest.raises(ValueError):
        M.decode_wav(bytes(bad))


def test_audio_stats_distributed(spark):
    import numpy as np

    s1 = np.full((100, 1), 0.5)
    s2 = np.zeros((50, 2))
    rows = [
        (1, bytearray(M.encode_wav(s1, 8000))),
        (2, bytearray(M.encode_wav(s2, 16000))),
        (3, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "clip_id long, payload binary")
    got = {r["clip_id"]: r for r in M.audio_stats(df, "payload", "clip_id").collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["n_frames"] == 100
    assert got[1]["duration_s"] == pytest.approx(100 / 8000)
    assert got[1]["rms"] == pytest.approx(0.5, abs=1e-4)
    assert got[1]["peak"] == pytest.approx(0.5, abs=1e-4)
    assert got[2]["n_channels"] == 2 and got[2]["rms"] == 0.0
    assert got[3]["sample_rate"] is None and got[3]["rms"] is None


def test_binary_roundtrip_preserves_hash(spark, docs, tmp_path):
    # opaque binary columns survive a parquet write/read with content hash
    bin_df = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    path = str(tmp_path / "bin")
    bin_df.write.parquet(path)
    back = spark.read.parquet(path)
    a = {r["doc_id"]: r["h"] for r in bin_df.select("doc_id", F.md5("payload").alias("h")).collect()}
    b = {r["doc_id"]: r["h"] for r in back.select("doc_id", F.md5("payload").alias("h")).collect()}
    assert a == b


def _png_filter_rows(img, ftype):
    """Reference PNG scanline filterer (spec §9): applies one filter
    type to every row of a (h, w, c) uint8 image, returns the raw
    stream decode must invert."""
    import numpy as np

    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    for y in range(h):
        line = rows[y]
        prev = rows[y - 1] if y else np.zeros_like(line)
        filt = np.empty_like(line)
        for x in range(len(line)):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            filt[x] = (line[x] - pred) & 0xFF
        out += bytes([ftype]) + filt.astype(np.uint8).tobytes()
    return bytes(out)


def _png_wrap(raw, w, h, color):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(5, 3, c), dtype=np.uint8)
        out = M.decode_png(M.encode_png(img))
        assert out.shape == img.shape and (out == img).all()
        # and through the magic-byte dispatcher
        assert (M.decode_image(M.encode_png(img)) == img).all()


def test_png_unfilters_every_filter_type():
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for ftype in range(5):
        raw = _png_filter_rows(img, ftype)
        payload = _png_wrap(raw, 5, 6, color=2)
        out = M.decode_png(payload)
        assert (out == img).all(), f"filter {ftype} mis-decoded"


def test_png_rejects_unsupported_and_corrupt():
    import struct
    import zlib

    import numpy as np
    import pytest

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = M.encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"JUNK" + good)
    # corrupt deflate stream → ValueError, not zlib.error
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt PNG zlib"):
        M.decode_png(bytes(bad))
    # interlaced / 16-bit / palette headers refuse cleanly
    raw = _png_filter_rows(img, 0)
    for depth, color, interlace, msg in [
        (16, 2, 0, "16-bit"),
        (8, 3, 0, "color type"),
        (8, 2, 1, "interlaced"),
    ]:
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match=msg):
            M.decode_png(payload)
    # truncated raster (one row short) → ValueError
    short = _png_filter_rows(img, 0)[: 2 * 2 * 3]  # cuts row 2
    with pytest.raises(ValueError, match="truncated PNG raster"):
        M.decode_png(_png_wrap(short, 2, 2, color=2))


def test_image_stats_decodes_png_distributed(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [
        (int(i), bytearray(M.encode_png(rng.integers(0, 256, (4, 6, 3), dtype=np.uint8))))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "img_id long, payload binary").repartition(4)
    got = {r["img_id"]: r for r in M.image_stats(df, "payload", "img_id").collect()}
    assert len(got) == 20
    for i, payload in rows:
        img = M.decode_png(bytes(payload))
        assert got[i]["width"] == 6 and got[i]["height"] == 4
        assert got[i]["channels"] == 3
        assert got[i]["mean_pixel"] == round(float(img.mean()), 6)


def test_jpeg_flat_even_roundtrips_exactly():
    """A flat block with an even value has one DC coefficient that
    quantizes exactly — the property the jpeg_decode oracle rides."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    for v in (32, 90, 130, 200, 254):
        img = np.full((8, 8, 3), v, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(img)) == img).all()
    # odd values stay flat but may shift ±1 (DC rounding) — lossy contract
    img = np.full((8, 8, 3), 131, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert len(np.unique(out)) == 1
    assert abs(int(out[0, 0, 0]) - 131) <= 1


def test_jpeg_gradient_within_codec_tolerance():
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(yy * 3 + 20) % 200 + 20, (xx * 2 + 40) % 200 + 20, ((yy + xx) * 2) % 200 + 20],
        axis=-1,
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 12 and err.mean() <= 3.0, (sub, err.max(), err.mean())


def test_jpeg_nonmultiple_of_8_and_mcu_dims():
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    for shape, sub in (((13, 21, 3), "4:4:4"), ((29, 14, 3), "4:2:0")):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert out.shape == shape


def test_jpeg_rejects_unsupported_and_corrupt():
    import numpy as np
    import pytest

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"RIFF" + good)
    # flip SOF0 marker to SOF2: declares progressive but keeps the
    # baseline scan header (Ss=0, Se=63 — illegal for a DC scan) →
    # clean ValueError from the progressive path, not a crash
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # flip to SOF10 (arithmetic) → classified refusal
    arith = good.replace(b"\xff\xc0", b"\xff\xca", 1)
    with pytest.raises(ValueError, match="unsupported_arithmetic"):
        decode_jpeg(arith)
    # truncated entropy stream → ValueError, not IndexError
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 12])


def test_image_stats_decodes_jpeg_distributed(spark):
    """decode_image dispatches JPEG magic, so the distributed stats
    operator takes the real codec path end-to-end."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    rows = [
        (int(i), bytearray(encode_jpeg(np.full((8, 8, 3), 2 * i + 40, dtype=np.uint8))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "img_id long, payload binary").repartition(4)
    got = {r["img_id"]: r for r in M.image_stats(df, "payload", "img_id").collect()}
    assert len(got) == 30
    for i, _ in rows:
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (8, 8, 3)
        assert got[i]["mean_pixel"] == float(2 * i + 40)


def test_gif_lossless_roundtrip_and_dict_cycling():
    """Identity-gray-palette GIF is lossless; large random rasters force
    LZW code-width growth to 12 bits and mid-stream clear/reset."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.gifcodec import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(9)
    for shape in ((4, 6, 1), (17, 23, 1), (200, 300, 1)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_gif(encode_gif(img))
        assert out.shape == (shape[0], shape[1], 3)
        assert (out[..., 0] == img[..., 0]).all()
        assert (out[..., 0] == out[..., 1]).all() and (out[..., 0] == out[..., 2]).all()
    # long runs exercise the chain-growth path
    img = np.zeros((64, 64, 1), dtype=np.uint8)
    img[20:40] = 200
    assert (decode_gif(encode_gif(img))[..., 0] == img[..., 0]).all()
    # dispatcher route
    assert M.decode_image(encode_gif(img)).shape == (64, 64, 3)


def test_gif_interlaced_and_rejections():
    import numpy as np
    import pytest

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.gifcodec import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 7, 1), dtype=np.uint8)
    # rows stored in 4-pass interlace order + flag set (descriptor sits
    # at the fixed offset 6 header + 7 LSD + 768 palette bytes)
    order = [
        y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(start, 13, step)
    ]
    raw = bytearray(encode_gif(img[order]))
    assert raw[781] == 0x2C
    raw[781 + 9] |= 0x40
    out = decode_gif(bytes(raw))
    assert (out[..., 0] == img[..., 0]).all()

    good = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + good)
    with pytest.raises(ValueError):
        decode_gif(good[:40])
    with pytest.raises(ValueError, match="grayscale"):
        encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))


def test_image_stats_decodes_gif_distributed(spark):
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.gifcodec import (
        encode_gif,
    )

    rng = np.random.default_rng(3)
    rows = [
        (int(i), bytearray(encode_gif(rng.integers(0, 256, (5, 4, 1), dtype=np.uint8))))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "img_id long, payload binary").repartition(4)
    got = {r["img_id"]: r for r in M.image_stats(df, "payload", "img_id").collect()}
    assert len(got) == 20
    for i, payload in rows:
        from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.gifcodec import (
            decode_gif,
        )

        img = decode_gif(bytes(payload))
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (4, 5, 3)
        assert got[i]["mean_pixel"] == round(float(img.mean()), 6)


def test_decode_wav_extended_formats():
    """Every WAV encoding that is math, not a codec: 24/32-bit PCM,
    IEEE float, G.711 u-law/A-law, and WAVE_FORMAT_EXTENSIBLE."""
    import struct

    import numpy as np

    def wav(fmt_tag, bits, data, extensible=False):
        if extensible:
            ext = struct.pack("<HHI", 22, bits, 1) + struct.pack("<H", fmt_tag) + b"\x00" * 14
            fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, bits) + ext
        else:
            fmt = struct.pack("<HHIIHH", fmt_tag, 1, 8000, 8000, 1, bits)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # 24-bit PCM: value 1<<22 → 0.5
    data = struct.pack("<i", 1 << 22)[:3] + struct.pack("<i", -(1 << 22))[:3]
    rate, nch, s = M.decode_wav(wav(1, 24, data))
    assert rate == 8000 and nch == 1
    assert s.ravel().tolist() == [0.5, -0.5]

    # 32-bit PCM
    data = struct.pack("<ii", 1 << 30, -(1 << 30))
    _, _, s = M.decode_wav(wav(1, 32, data))
    assert s.ravel().tolist() == [0.5, -0.5]

    # IEEE float 32/64
    data = struct.pack("<ff", 0.25, -1.0)
    _, _, s = M.decode_wav(wav(3, 32, data))
    assert s.ravel().tolist() == [0.25, -1.0]
    data = struct.pack("<dd", 0.125, 0.75)
    _, _, s = M.decode_wav(wav(3, 64, data))
    assert s.ravel().tolist() == [0.125, 0.75]

    # G.711: 0xFF is +0 in u-law; tables are odd-symmetric and bounded
    _, _, s = M.decode_wav(wav(7, 8, bytes([0xFF, 0x7F])))
    assert s.ravel()[0] == 0.0 and s.ravel()[1] == 0.0  # +0 and -0
    ulaw = M._g711_ulaw_table()
    alaw = M._g711_alaw_table()
    for tbl in (ulaw, alaw):
        assert np.abs(tbl).max() <= 1.0
        assert len(np.unique(tbl)) > 200  # near-bijective expansion
    # u-law codes 0x80.. mirror 0x00.. with opposite sign
    assert np.allclose(ulaw[:128], -ulaw[128:])
    assert np.allclose(alaw[(np.arange(128) ^ 0x80)], -alaw[np.arange(128)])
    # absolute sign convention against Sun g711.c alaw2linear/ulaw2linear:
    # odd symmetry alone can't catch a global negation. A-law wire 0x55
    # (XOR 0x55 → 0x00, sign bit clear → NEGATIVE) is -8; wire 0xD5
    # (→ 0x80, sign bit set → POSITIVE) is +8. µ-law wire 0x7F
    # (~ → 0x80, sign bit set → negative) is -0; wire 0x00 is -32124.
    assert alaw[0x55] * 32768.0 == -8.0
    assert alaw[0xD5] * 32768.0 == 8.0
    assert alaw[0x2A] * 32768.0 == -32256.0  # seg 7 max, Sun spot value
    assert ulaw[0x00] * 32768.0 == -32124.0
    assert ulaw[0x80] * 32768.0 == 32124.0

    # extensible wrapper resolves to the inner format
    data = struct.pack("<ff", 0.5, -0.5)
    _, _, s = M.decode_wav(wav(3, 32, data, extensible=True))
    assert s.ravel().tolist() == [0.5, -0.5]

    # true codecs still refuse
    import pytest

    with pytest.raises(ValueError, match="needs a real codec"):
        M.decode_wav(wav(2, 4, b"\x00\x00"))  # MS-ADPCM


def test_avi_mjpeg_demux_and_distributed_frame_sampling(spark):
    """REAL video path: MJPEG-in-AVI payloads demux by RIFF chunk-walk
    and every sampled frame decodes with the pure-numpy JPEG codec."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    def clip(base):
        frames = [
            encode_jpeg(np.full((8, 8, 3), base + 2 * i, dtype=np.uint8))
            for i in range(12)
        ]
        return M.mux_avi(frames, 8, 8)

    # direct demux: frame order and content
    avi = clip(40)
    frames = M.demux_avi_frames(avi)
    assert len(frames) == 12
    for i, f in enumerate(frames):
        assert (M.decode_image(f) == 40 + 2 * i).all()

    # distributed sampling takes every 4th frame per clip
    rows = [(i, bytearray(clip(40 + 10 * i))) for i in range(6)]
    df = spark.createDataFrame(rows, "vid_id long, payload binary").repartition(3)
    got = M.sample_frames(df, "payload", "vid_id", every_n=4).collect()
    by_vid: dict[int, list] = {}
    for r in got:
        by_vid.setdefault(r["vid_id"], []).append(r)
    assert set(by_vid) == set(range(6))
    for vid, rs in by_vid.items():
        assert [r["frame_no"] for r in sorted(rs, key=lambda r: r["frame_no"])] == [0, 1, 2]
        for r in rs:
            img = M.decode_image(bytes(r["frame"]))
            # frame_no k is source frame 4k of this clip
            assert (img == 40 + 10 * vid + 2 * (4 * r["frame_no"])).all()

    # non-AVI payloads still ride the stub (shape contract unchanged)
    assert M.frame_sample_stub(b"x" * 300, every_n=2, frame_size=100) == [
        b"x" * 100,
        b"x" * 100,
    ]

    # corrupt container quarantines
    import pytest

    with pytest.raises(ValueError):
        M.demux_avi_frames(avi[: len(avi) // 2])


def test_mp3_frame_header_demux():
    """MP3 demux-without-decode: header math per ISO 11172-3, ID3v2
    skip (syncsafe), ID3v1 trailer, CBR/VBR bitrates, and honest
    refusals for anything that is not MPEG-1 Layer III framing."""
    import pytest

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import multimodal as M

    def frame(br_idx, sr_idx, pad=0, body_fill=0x00):
        br = M._MP3_BITRATES_V1L3[br_idx]
        sr = M._MP3_RATES_V1[sr_idx]
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
        flen = 144 * br * 1000 // sr + pad
        return h.to_bytes(4, "big") + bytes([body_fill]) * (flen - 4)

    # CBR: 3 frames of 128 kbps @ 44100
    rate, brs = M.demux_mp3_frames(frame(9, 0) * 3)
    assert rate == 44100 and brs == [128, 128, 128]
    # VBR + padding bit changes frame length
    rate, brs = M.demux_mp3_frames(frame(9, 1) + frame(11, 1, pad=1) + frame(14, 1))
    assert rate == 48000 and brs == [128, 192, 320]
    # ID3v2 leading tag (syncsafe size) and ID3v1 trailer both skipped
    tagged = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10) + frame(9, 0) * 2 + b"TAG" + bytes(125)
    rate, brs = M.demux_mp3_frames(tagged)
    assert rate == 44100 and len(brs) == 2
    # refusals: lost sync, reserved indexes, truncation, rate change
    with pytest.raises(ValueError, match="sync"):
        M.demux_mp3_frames(b"\x00" * 8)
    with pytest.raises(ValueError, match="reserved"):
        bad = bytearray(frame(9, 0)); bad[2] = 0xF0 | (bad[2] & 0x0F)  # bitrate idx 15
        M.demux_mp3_frames(bytes(bad))
    with pytest.raises(ValueError):
        M.demux_mp3_frames(frame(9, 0)[:-10])  # truncated: next header short/garbage
    with pytest.raises(ValueError, match="changes mid-stream"):
        M.demux_mp3_frames(frame(9, 0) + frame(9, 1))
    with pytest.raises(ValueError, match="no MP3 frames"):
        M.demux_mp3_frames(b"")


def test_audio_meta_distributed(spark):
    """audio_meta over a mixed column: parseable MP3s yield header
    stats, junk quarantines to nulls, nothing throws."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import multimodal as M

    def frame(br_idx, sr_idx):
        br = M._MP3_BITRATES_V1L3[br_idx]
        sr = M._MP3_RATES_V1[sr_idx]
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (br_idx << 12) | (sr_idx << 10)
        return h.to_bytes(4, "big") + bytes(144 * br * 1000 // sr - 4)

    rows = [
        (1, frame(9, 0) * 4),                      # CBR 128 @ 44100
        (2, frame(10, 1) + frame(12, 1)),          # VBR 160/224 @ 48000
        (3, b"not audio at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r.asDict() for r in M.audio_meta(df, "payload", "id").collect()}
    assert got[1]["n_frames"] == 4 and got[1]["sample_rate"] == 44100
    assert got[1]["duration_s"] == 4 * 1152 / 44100
    assert got[2]["bitrate_kbps"] == (160 + 224) / 2
    assert got[3]["n_frames"] is None and got[4]["n_frames"] is None


def test_mp4_demux_roundtrip_and_quarantine(spark):
    """ISO-BMFF box-walk demux: mux_mp4 fixtures round-trip every
    metadata field; corrupt payloads only ever raise ValueError and the
    distributed path nulls them instead of failing the job."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.multimodal import (
        demux_mp4_meta,
        mp4_meta,
        mux_mp4,
    )

    both = mux_mp4(b"mp42", 2.5, (b"avc1", 320, 240, 7), (b"mp4a", 48000))
    m = demux_mp4_meta(both)
    assert m == {
        "major_brand": "mp42", "duration_s": 2.5, "n_tracks": 2,
        "video_codec": "avc1", "width": 320, "height": 240,
        "n_video_samples": 7, "audio_codec": "mp4a", "audio_rate": 48000,
    }
    audio_only = demux_mp4_meta(mux_mp4(b"isom", 0.5, None, (b"mp4a", 22050)))
    assert audio_only["video_codec"] is None and audio_only["audio_rate"] == 22050
    video_only = demux_mp4_meta(mux_mp4(b"qt  ", 10.0, (b"hvc1", 1920, 1080, 3), None))
    assert video_only["video_codec"] == "hvc1" and video_only["width"] == 1920
    with pytest.raises(ValueError):
        demux_mp4_meta(b"\x00\x00\x00\x08ftypAAAA")  # no moov
    with pytest.raises(ValueError):
        demux_mp4_meta(both[:40])  # moov overruns

    # bit-flip fuzz: ValueError or a successful parse, nothing else
    rng = np.random.default_rng(11)
    for _ in range(200):
        q = bytearray(both)
        for _k in range(rng.integers(1, 5)):
            q[rng.integers(0, len(q))] ^= 1 << rng.integers(0, 8)
        try:
            demux_mp4_meta(bytes(q))
        except ValueError:
            pass

    rows = [(1, bytearray(both)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "vid_id long, payload binary")
    got = {r["vid_id"]: r for r in mp4_meta(df, "payload", "vid_id").collect()}
    assert got[1]["video_codec"] == "avc1" and got[1]["n_tracks"] == 2
    assert got[2]["major_brand"] is None and got[2]["n_tracks"] is None


def test_flac_demux_roundtrip_and_quarantine(spark):
    """FLAC STREAMINFO bit unpacking: header fixtures round-trip every
    field (incl. 20-bit rates and 36-bit sample counts at their edges);
    corrupt payloads raise ValueError only; distributed path nulls."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.multimodal import (
        demux_flac_meta,
        flac_meta,
        mux_flac_header,
    )

    m = demux_flac_meta(mux_flac_header(96000, 8, 24, 2**35 + 7, 1024))
    assert m["sample_rate"] == 96000 and m["channels"] == 8
    assert m["bits_per_sample"] == 24 and m["total_samples"] == 2**35 + 7
    assert m["min_block"] == 1024 and m["duration_s"] == (2**35 + 7) / 96000
    mono = demux_flac_meta(mux_flac_header(8000, 1, 8, 1))
    assert mono["channels"] == 1 and mono["bits_per_sample"] == 8
    with pytest.raises(ValueError):
        demux_flac_meta(b"fLaX" + bytes(40))
    with pytest.raises(ValueError):
        demux_flac_meta(mux_flac_header()[:20])  # truncated STREAMINFO

    payload = mux_flac_header()
    rng = np.random.default_rng(3)
    for _ in range(200):
        q = bytearray(payload)
        for _k in range(rng.integers(1, 4)):
            q[rng.integers(0, len(q))] ^= 1 << rng.integers(0, 8)
        try:
            demux_flac_meta(bytes(q))
        except ValueError:
            pass

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"junk"))],
        "aud_id long, payload binary",
    )
    got = {r["aud_id"]: r for r in flac_meta(df, "payload", "aud_id").collect()}
    assert got[1]["sample_rate"] == 44100 and got[2]["sample_rate"] is None


def test_dhash_locality_and_quarantine(spark):
    """dHash contract: re-encoded identical images collide exactly, a
    small pixel edit moves few bits, structurally different images are
    far apart, and undecodable payloads yield null hashes (quarantine)
    without failing the job."""
    import numpy as np

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.multimodal import (
        dhash_images,
        encode_png,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    near = base.copy()
    near[3, 4] = (int(near[3, 4, 0]) + 40) % 256  # one-pixel edit
    far = base[::-1, ::-1].copy()  # structural change
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_png(base))),  # byte-identical content
        (3, bytearray(encode_png(near))),
        (4, bytearray(encode_png(far))),
        (5, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["dhash"], r["dhash_bits"]) for r in dhash_images(
        df, "payload", "doc_id"
    ).collect()}
    assert got[1] == got[2]  # exact collision on identical content
    ham = lambda a, b: sum(x != y for x, y in zip(got[a][1], got[b][1]))
    assert 0 <= ham(1, 3) <= 8  # near-dup lands within banding reach
    assert ham(1, 4) > 8  # structurally different stays far
    assert got[5] == (None, None)  # quarantined, not failed
    # bit string and integer agree (LSB-first positions)
    bits = got[1][1]
    assert len(bits) == 64
    val = sum(1 << i for i, b in enumerate(bits) if b == "1")
    val = val - (1 << 64) if val >= 1 << 63 else val
    assert val == got[1][0]


def test_demux_mp4_samples_walks_stts_stsz(spark):
    import struct

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.multimodal import (
        demux_mp4_samples,
        mp4_samples,
        mux_mp4,
    )

    p = mux_mp4(video=(b"avc1", 64, 48, 5), audio=(b"mp4a", 44100))
    rows = demux_mp4_samples(p)
    assert [r["sample_idx"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["size_bytes"] for r in rows] == [100, 101, 102, 103, 104]
    # ceil(5/2)=3 samples at 500 ticks, 2 at 700
    assert [r["dt_ticks"] for r in rows] == [500, 500, 500, 700, 700]
    assert [r["ts_ticks"] for r in rows] == [0, 500, 1000, 1500, 2200]

    # stts/stsz count mismatch raises (corrupt sample table must be loud)
    bad = bytearray(p)
    i = bad.find(b"stts")
    # rewrite the first run's sample count from 3 to 2: box type at i,
    # body at i+4 (ver/flags), entry_count at i+8, first run at i+12
    struct.pack_into(">I", bad, i + 12, 2)
    with pytest.raises(ValueError, match="stts covers"):
        demux_mp4_samples(bytes(bad))

    # fixed-size stsz path: patch sample_size field to 77
    fixed = bytearray(p)
    j = fixed.find(b"stsz")
    struct.pack_into(">I", fixed, j + 4 + 4, 77)
    rows2 = demux_mp4_samples(bytes(fixed))
    assert [r["size_bytes"] for r in rows2] == [77] * 5

    # the distributed operator quarantines corrupt payloads to zero rows
    df = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    got = mp4_samples(df, "payload", "doc_id").collect()
    assert sorted({r["doc_id"] for r in got}) == [1]
    assert len(got) == 5
