"""Progressive JPEG (SOF2) codec — operators/jpegprog.py.

The load-bearing property: progressive and baseline encoders entropy-
code the SAME quantized coefficients losslessly, so decoding a
progressive stream must reproduce the baseline decode bit-for-bit on
any input. Everything else (EOB runs spanning blocks, correction-bit
buffering, ZRL-in-refinement, DC successive approximation) is exercised
by picking inputs whose coefficient patterns force those paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.jpegprog import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(42)
    grad = (np.arange(31 * 45 * 3).reshape(31, 45, 3) % 256).astype(np.uint8)
    return {
        # flat even gray: single DC coefficient per block — the
        # maximal-EOB-run shape (every AC scan is one long EOBn chain)
        "flat_even": np.full((24, 40, 3), 100, np.uint8),
        # smooth gradient: small ACs that appear in refinement passes
        # (correction bits on history + newly-nonzero mid-band)
        "gradient": grad,
        # noise: dense coefficients — ZRLs rare, symbols everywhere
        "noise": rng.integers(0, 256, (19, 23, 3), dtype=np.uint8),
        # checkerboard: high-frequency ACs at band ends (Se=63 edge)
        "checker": (np.indices((16, 16)).sum(0) % 2 * 255)
        .astype(np.uint8)[..., None]
        .repeat(3, 2),
        # single hot pixel per block: isolated ACs → long zero runs →
        # ZRL + correction-bit interleaving in refinement
        "sparse": _sparse(),
        # non-multiple-of-8 dims exercise edge-block replication
        "odd_dims": rng.integers(0, 256, (9, 13, 3), dtype=np.uint8),
    }


def _sparse() -> np.ndarray:
    img = np.full((32, 32, 3), 128, np.uint8)
    img[::7, ::5] = 255
    return img


@pytest.mark.parametrize("name", list(_cases()))
def test_progressive_decode_equals_baseline_decode(name):
    img = _cases()[name]
    dp = decode_jpeg_progressive(encode_jpeg_progressive(img))
    db = decode_jpeg(encode_jpeg(img, "4:4:4"))
    assert np.array_equal(dp, db), f"{name}: progressive != baseline decode"


@pytest.mark.parametrize(
    "shape", [(24, 40, 3), (17, 9, 3), (33, 31, 3), (50, 18, 3)]
)
def test_progressive_420_equals_baseline_420(shape):
    """4:2:0 makes the padded-MCU grid differ from the per-component
    block grids (luma 2×2 blocks per MCU; chroma half-size), so this
    locks the interleaved-DC MCU walk and the non-interleaved AC
    addressing — the paths 4:4:4 can't distinguish."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dp = decode_jpeg_progressive(encode_jpeg_progressive(img, "4:2:0"))
    db = decode_jpeg(encode_jpeg(img, "4:2:0"))
    assert np.array_equal(dp, db)


def test_progressive_grayscale_flat_even_is_exact():
    """Flat even gray has one even DC per block → quantization is exact
    (round(d/2) with even d), so the full progressive pipeline —
    DC successive approximation included — must round-trip the pixels
    bit-exactly, single-channel raster out."""
    img = np.full((16, 24), 84, np.uint8)
    out = decode_jpeg_progressive(encode_jpeg_progressive(img))
    assert out.shape == (16, 24, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_progressive_dispatches_through_decode_jpeg():
    """decode_jpeg (the quarantined public entry) must route SOF2
    payloads to the progressive decoder transparently."""
    img = np.full((8, 8, 3), 100, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img)), decode_jpeg(encode_jpeg(img))
    )


def test_progressive_truncation_raises_valueerror():
    img = (np.arange(24 * 24 * 3).reshape(24, 24, 3) % 256).astype(np.uint8)
    payload = encode_jpeg_progressive(img)
    # cut inside the last AC refinement scan
    with pytest.raises(ValueError):
        decode_jpeg_progressive(payload[: len(payload) - 30])
    # cut before any scan completes
    with pytest.raises(ValueError):
        decode_jpeg_progressive(payload[:200])


def test_progressive_fuzz_quarantine_contract():
    """Bit-flipped progressive payloads must surface as ValueError (or
    decode to SOME raster) — never any other exception type. Same
    fuzz-lock the baseline decoders carry (tests/test_robustness.py)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive(img))
    for _ in range(300):
        mutated = bytearray(payload)
        for _k in range(rng.integers(1, 4)):
            mutated[rng.integers(2, len(mutated))] ^= 1 << rng.integers(0, 8)
        try:
            out = decode_jpeg(bytes(mutated))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


def test_progressive_bad_scan_params_rejected():
    """A baseline stream re-labelled SOF2 carries an Ss=0/Se=63 scan —
    illegal progressive (DC scans need Se=0) — and must be rejected
    cleanly, not misdecoded."""
    img = np.full((8, 8, 3), 100, np.uint8)
    fake = encode_jpeg(img).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg_progressive(fake)
