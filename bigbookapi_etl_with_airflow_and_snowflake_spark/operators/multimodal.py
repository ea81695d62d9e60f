"""Multimodal column plumbing (SURVEY.md §2.5 N5).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata carried alongside. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition discipline — is real and
tested; the actual media decode is stubbed (codec libraries are not in
this environment) behind :func:`decode_stub`, which either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector so downstream operators can be exercised end-to-end.

At 100 TB: payload columns dominate I/O, so every operator here projects
payload bytes only where needed (column pruning keeps metadata-only
queries from touching the blobs at all), and decode runs as Arrow-batched
``mapInPandas`` — one Python worker per core, zero per-row overhead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def frame_sample_stub(
    payload: bytes, every_n: int = 10, frame_size: int = 64, strict: bool = False
) -> list[bytes]:
    """STUB video frame sampling (every Nth frame). Real path: ffmpeg
    demux. The fake treats the payload as fixed-size frames and takes
    every ``every_n``-th chunk — same output shape as the real thing."""
    if strict:
        raise NotImplementedError("frame sampling requires ffmpeg")
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
    """Distributed image resize over binary payloads (mapInPandas;
    decode stubbed). Output: (id, resized binary, n_bytes)."""
    out_schema = f"{id_col} long, resized binary, n_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resize_stub(
                    p.encode("utf-8") if isinstance(p, str) else (bytes(p) if p is not None else b""),
                    width,
                    height,
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
    consume. Demux is stubbed; batching/explode plumbing is real."""
    out_schema = f"{id_col} long, frame_no int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = (
                    p.encode("utf-8")
                    if isinstance(p, str)
                    else (bytes(p) if p is not None else b"")
                )
                for i, fr in enumerate(frame_sample_stub(raw, every_n, frame_size)):
                    ids.append(rid)
                    frame_nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_no": frame_nos, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
