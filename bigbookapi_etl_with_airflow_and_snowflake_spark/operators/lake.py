"""Lake-maintenance introspection: distributed parquet FOOTER reads.

At 100 TB the first question about a table is never answered by
scanning it — it's answered by its metadata: row counts, per-column
min/max envelopes (what file skipping will actually prune — see
operators/zorder.py), null densities, row-group sizing (too-small row
groups kill scan throughput; too-large defeat predicate pushdown).
``parquet_footer_stats`` reads ONLY footers, distributed: the file
list is parallelized and each executor opens its files with pyarrow —
O(files) work, zero data pages touched.

The same statistics parquet readers use for pruning are what this
reports, so the operator doubles as a data-skipping audit: run it
before and after a re-layout (zorder_layout) and the envelope widths
show exactly what a box filter will skip.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def parquet_footer_stats(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    files_per_task: int = 64,
) -> DataFrame:
    """Per-(file, column) footer statistics for numeric ``columns``,
    aggregated over the file's row groups: (file, column, n_values,
    null_count, min_val, max_val) with min/max as doubles (exact for
    ints < 2⁵³ and all floats — the engine's portable stats type).

    The driver only LISTS file names (what any parquet reader does);
    footers are read on executors via pyarrow, ``files_per_task``
    names per task. Local paths here; object-store URIs ride pyarrow's
    filesystems at the same call site.
    """
    names = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    ) if os.path.isdir(path) else [os.path.basename(path)]
    base = path if os.path.isdir(path) else os.path.dirname(path)
    if not names:
        raise ValueError(f"no parquet files under {path!r}")
    cols = list(columns)
    # fail fast on the driver: one footer read validates the columns
    # (the same cheap metadata fetch any reader does for schema)
    import pyarrow.parquet as pq

    first = pq.ParquetFile(os.path.join(base, names[0])).metadata
    have = {first.schema.column(i).name for i in range(first.num_columns)}
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(f"columns {missing} not in {names[0]} (has {sorted(have)})")

    files_df = spark.createDataFrame(
        [(n,) for n in names], "file string"
    ).repartition(max(1, len(names) // files_per_task))

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out: dict[str, list] = {
                "file": [], "column": [], "n_values": [],
                "null_count": [], "min_val": [], "max_val": [],
            }
            for fname in pdf["file"]:
                md = pq.ParquetFile(os.path.join(base, fname)).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for c in cols:
                    if c not in idx:
                        raise ValueError(f"column {c!r} not in {fname}")
                    nv = 0
                    nulls = 0
                    mn = mx = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None:
                            raise ValueError(
                                f"no statistics for {c!r} in {fname} rg{rg}"
                            )
                        nv += st.num_values
                        nulls += st.null_count
                        lo, hi = float(st.min), float(st.max)
                        mn = lo if mn is None else min(mn, lo)
                        mx = hi if mx is None else max(mx, hi)
                    out["file"].append(fname)
                    out["column"].append(c)
                    out["n_values"].append(nv)
                    out["null_count"].append(nulls)
                    out["min_val"].append(mn)
                    out["max_val"].append(mx)
            yield pd.DataFrame(out)

    return files_df.mapInPandas(
        read_footers,
        schema=(
            "file string, column string, n_values long, null_count long, "
            "min_val double, max_val double"
        ),
    )


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_cols: Sequence[str] | None = None,
) -> dict:
    """Bin-pack a fragmented parquet directory into ~``target_file_bytes``
    files — the lake-maintenance operator every streaming/append
    pipeline needs (thousands of kilobyte files turn a 100 TB scan into
    an open()-bound crawl; the reference's daily batch never fragments
    because a single pandas process writes one file a day).

    Sizing comes from file metadata only (no data read): output file
    count = ceil(input_bytes / target). With ``order_cols`` the data is
    range-partitioned on those columns before writing, so compaction
    doubles as a re-cluster — per-file min/max envelopes stay tight and
    file skipping keeps working (verify with parquet_footer_stats /
    zorder_layout). Without, a round-robin repartition balances bytes.

    Returns {"n_files_in", "n_files_out", "bytes_in"}. Local-fs sizing
    (os.stat over the scan's inputFiles); an object-store deployment
    swaps in its FileSystem listing — the plan shape is unchanged.
    """
    df = spark.read.parquet(in_path)
    files = [f.removeprefix("file:") for f in df.inputFiles()]
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_in // target_file_bytes))
    if order_cols:
        packed = df.repartitionByRange(n_out, *order_cols)
    else:
        packed = df.repartition(n_out)
    packed.write.mode("overwrite").parquet(out_path)
    n_files_out = len(
        [f for f in os.listdir(out_path) if f.endswith(".parquet")]
    )
    return {
        "n_files_in": len(files),
        "n_files_out": n_files_out,
        "bytes_in": bytes_in,
    }
