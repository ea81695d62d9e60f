"""Decoder resource bounds.

The quarantine contract ("a bad blob never fails the job") converts
decoder exceptions to per-row ``ValueError``s — but it deliberately does
NOT catch ``MemoryError``, so a hostile header declaring a 65535×65535
raster (or a zlib bomb) could OOM a worker before any pixel math runs.
Every decoder therefore validates declared dimensions against this cap
BEFORE allocating, and PNG inflates with an explicit ``max_length``
derived from the declared raster size.

The default (256 MiB of decoded raster, e.g. 8192×8192 RGBA) is far
above anything the pure-numpy codecs are meant for and is configurable
via ``SPARK_GRAFT_MAX_RASTER_BYTES`` for corpora with known-larger
assets.
"""

from __future__ import annotations

import os

MAX_RASTER_BYTES = int(os.environ.get("SPARK_GRAFT_MAX_RASTER_BYTES", 256 << 20))


def check_raster(width: int, height: int, channels: int = 1, *, what: str = "raster") -> None:
    """Raise ``ValueError`` (the quarantine-visible type) when a declared
    raster would exceed :data:`MAX_RASTER_BYTES` once allocated."""
    n = int(width) * int(height) * int(channels)
    if n > MAX_RASTER_BYTES:
        raise ValueError(
            f"{what} {width}x{height}x{channels} exceeds decode cap "
            f"({n} > {MAX_RASTER_BYTES} bytes; raise SPARK_GRAFT_MAX_RASTER_BYTES to override)"
        )
