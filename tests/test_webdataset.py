"""WebDataset tar-shard source (sources/webdataset.py): real on-disk
shards through the binaryFile path, member explosion, sample
regrouping, and the loud-failure contract for torn archives."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.webdataset import (
    group_samples,
    mux_webdataset,
    read_webdataset,
    webdataset_members,
)


def _shard(i: int) -> bytes:
    return mux_webdataset(
        [
            (f"{i}-{j:04d}", {"txt": f"text {i} {j}".encode(),
                              "json": b'{"a":1}', "cls": str(j % 3).encode()})
            for j in range(5)
        ]
    )


def test_read_webdataset_end_to_end(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"shard-{i:05d}.tar").write_bytes(_shard(i))
    members = read_webdataset(spark, str(tmp_path))
    rows = members.collect()
    assert len(rows) == 3 * 5 * 3
    assert {r["ext"] for r in rows} == {"txt", "json", "cls"}
    # payload bytes survive the trip
    by = {(r["key"], r["ext"]): bytes(r["payload"]) for r in rows}
    assert by[("1-0002", "txt")] == b"text 1 2"
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)

    samples = group_samples(members).collect()
    assert len(samples) == 15
    s = {r["key"]: r for r in samples}
    assert s["2-0004"]["n_parts"] == 3
    assert bytes(s["2-0004"]["parts"]["cls"]) == b"1"
    assert s["0-0000"]["total_bytes"] == len(b"text 0 0") + len(b'{"a":1}') + 1
    # shards parallelize: one input partition per shard file
    assert members.rdd.getNumPartitions() >= 1


def test_webdataset_malformed_shard_fails_loud(spark):
    df = spark.createDataFrame(
        [("bad.tar", bytearray(b"this is not a tar archive"))],
        "path string, content binary",
    )
    with pytest.raises(Exception, match="malformed tar shard"):
        webdataset_members(df).collect()


def test_webdataset_extensionless_and_dirs(spark):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        m = tarfile.TarInfo("subdir/noext")
        m.size = 3
        tf.addfile(m, io.BytesIO(b"abc"))
    df = spark.createDataFrame(
        [("s.tar", bytearray(buf.getvalue()))], "path string, content binary"
    )
    rows = webdataset_members(df).collect()
    assert len(rows) == 1  # the directory is skipped
    assert rows[0]["key"] == "noext" and rows[0]["ext"] == ""
