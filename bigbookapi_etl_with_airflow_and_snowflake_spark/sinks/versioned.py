"""Versioned parquet tables: manifest-based snapshot isolation and
time travel.

The reference truncate-and-reloads its warehouse table daily
(`/root/reference/dags/bigbookapi.py` — readers racing the load see a
half-empty table, and yesterday's corpus is simply gone). The lakehouse
answer is the manifest pattern (Iceberg/Delta distilled to its core):
data files are immutable and write-once; a tiny JSON manifest per
version lists exactly the files that make up that snapshot; the
manifest is the atomic commit point.

Guarantees (single-writer-per-table; concurrent writers are detected,
see ``write_version``):

- **Snapshot isolation**: a reader that pinned version N sees exactly
  N's file list forever — a concurrent commit creates N+1 and touches
  nothing N references.
- **Time travel**: any retained version is readable by number
  (``read_version(..., version=3)``); audits and reproducible training
  runs read the manifest the run recorded.
- **Atomicity**: data lands first (under a per-commit subdirectory),
  then the manifest appears via ``os.open(O_CREAT|O_EXCL)`` + rename —
  readers either see the complete new version or keep the old one. The
  O_EXCL create also makes two racing writers of the same version
  number a loud error (the loser retries at the next number), not a
  silent overwrite.

At 100 TB the same layout works on an object store by swapping the
os-level file ops for conditional PUTs; the plan shapes (parquet scan
of an explicit file list) are unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_version", "read_version", "versions", "vacuum"]

_MANIFEST_DIR = "_versions"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:08d}.json")


def versions(table_dir: str) -> list[dict]:
    """All committed versions, ascending: [{version, n_files, n_rows,
    mode, committed_at}]."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            out.append(
                {
                    "version": m["version"],
                    "n_files": len(m["files"]),
                    "n_rows": m["n_rows"],
                    "mode": m["mode"],
                    "committed_at": m["committed_at"],
                }
            )
    return out


def _load_manifest(table_dir: str, version: int | None) -> dict:
    vs = versions(table_dir)
    if not vs:
        raise ValueError(f"no committed versions under {table_dir!r}")
    if version is None:
        version = vs[-1]["version"]
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        known = [v["version"] for v in vs]
        raise ValueError(f"version {version} not found (have {known})")
    with open(path) as fh:
        return json.load(fh)


def write_version(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
) -> int:
    """Commit ``df`` as the next version of the table; returns the new
    version number. ``mode='overwrite'`` → the snapshot is exactly
    ``df``; ``mode='append'`` → the snapshot is the previous version's
    files plus ``df``'s (no rewrite of existing data — append commits
    cost O(increment), never O(table))."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_id)
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    n_new = spark.read.parquet(data_dir).count()

    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    while True:
        prior = versions(table_dir)
        next_v = (prior[-1]["version"] + 1) if prior else 1
        files, n_rows = new_files, n_new
        if mode == "append" and prior:
            pm = _load_manifest(table_dir, prior[-1]["version"])
            files = pm["files"] + new_files
            n_rows = pm["n_rows"] + n_new
        manifest = {
            "version": next_v,
            "mode": mode,
            "files": files,
            "n_rows": n_rows,
            "committed_at": time.time(),
        }
        path = _manifest_path(table_dir, next_v)
        tmp = path + f".tmp.{commit_id}"
        try:
            # O_EXCL on the FINAL path is the commit lock: two racing
            # writers can both stage, but only one creates v{N} — the
            # loser loops and re-reads the (now longer) version chain.
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        try:
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            with os.fdopen(fd, "w") as fh:
                with open(tmp) as src:
                    fh.write(src.read())
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return next_v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table at ``version`` (default: latest) — a parquet scan of
    exactly that manifest's file list; nothing a later commit does can
    change what this returns."""
    m = _load_manifest(table_dir, version)
    return spark.read.parquet(*m["files"])


def vacuum(table_dir: str, keep_last: int = 2) -> dict:
    """Drop manifests older than the newest ``keep_last`` versions and
    delete data files no retained version references. Returns
    {"versions_dropped", "files_deleted"}. Time travel shrinks to the
    retained window — run it when the audit horizon allows."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = versions(table_dir)
    drop = vs[:-keep_last]
    keep = vs[-keep_last:]
    keep_files = set()
    for v in keep:
        keep_files.update(_load_manifest(table_dir, v["version"])["files"])
    deleted = 0
    for v in drop:
        m = _load_manifest(table_dir, v["version"])
        for f in m["files"]:
            if f not in keep_files and os.path.exists(f):
                os.remove(f)
                deleted += 1
        os.remove(_manifest_path(table_dir, v["version"]))
    return {"versions_dropped": len(drop), "files_deleted": deleted}
