"""WebDataset tar-shard source — the de-facto container format for
large multimodal training corpora (images+captions+metadata packed as
tar archives of co-named members: ``000001.jpg``, ``000001.txt``,
``000001.json`` form one sample).

Spark-first shape: shards arrive as whole-file binary rows (Spark's
``binaryFile`` source lists and distributes them — works on local
paths and object stores alike), members are exploded with one
Arrow-batched ``mapInPandas`` over stdlib ``tarfile`` (no external
deps), and sample regrouping is a plain pivot-free ``groupBy`` with a
``map_from_entries`` aggregate. Payload bytes are projected only
through this path — metadata-only queries over the exploded table
never touch them after a column prune.

At 100 TB: parallelism = shard count (the format's own sharding
contract — WebDataset corpora ship thousands of ~1 GB shards), one
task reads one tar sequentially (the access pattern tar demands), and
nothing is collected to the driver.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def webdataset_members(
    df: DataFrame, payload_col: str = "content", shard_col: str = "path"
) -> DataFrame:
    """Explode tar-shard payload rows into one row per member:
    (shard, key, ext, n_bytes, payload). ``key`` is the member name
    without its (last) extension — WebDataset's sample id; directories
    and non-regular members are skipped. A malformed shard raises —
    a torn archive should fail the shard's task loudly, not silently
    drop samples (quarantine by routing bad shards out beforehand)."""
    out_schema = (
        "shard string, key string, ext string, n_bytes long, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "shard": [], "key": [], "ext": [], "n_bytes": [], "payload": [],
            }
            for shard, blob in zip(pdf[shard_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(raw), mode="r:*")
                except tarfile.TarError as exc:
                    raise ValueError(f"malformed tar shard {shard!r}: {exc}") from exc
                with tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        name = posixpath.basename(m.name)
                        stem, dot, ext = name.rpartition(".")
                        f = tf.extractfile(m)
                        data = f.read() if f is not None else b""
                        out["shard"].append(shard)
                        out["key"].append(stem if dot else name)
                        out["ext"].append(ext if dot else "")
                        out["n_bytes"].append(len(data))
                        out["payload"].append(data)
            yield pd.DataFrame(out)

    return df.select(
        F.col(shard_col).alias(shard_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=out_schema)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset shards under ``path`` (glob ok): Spark's
    ``binaryFile`` source distributes whole-shard rows, then
    :func:`webdataset_members` explodes them."""
    shards = spark.read.format("binaryFile").load(path)
    return webdataset_members(shards, payload_col="content", shard_col="path")


def group_samples(members: DataFrame) -> DataFrame:
    """Regroup exploded members into one row per sample:
    (shard, key, parts map<ext, binary>, n_parts, total_bytes). One
    hash aggregate on (shard, key) — samples never span shards by the
    format's contract, so the shuffle key is uniform."""
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("ext", "payload")))
            ).alias("parts"),
            F.count("*").cast("int").alias("n_parts"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


def mux_webdataset(samples: list[tuple[str, dict[str, bytes]]]) -> bytes:
    """Fixture-side inverse: a deterministic (zero-mtime, zeroed
    owners) uncompressed tar shard from (key, {ext: payload}) samples,
    members emitted in sample order — byte-stable for tests and
    oracles."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, parts in samples:
            for ext in sorted(parts):
                data = parts[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}" if ext else key)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()
