"""Same-box A/B of chained vs full-rebuild Bloom-index maintenance on
the streaming ingest entry at a replicated scale corpus.

Cross-round wall-clock on this multi-tenant box has repeatedly read as
regression when it was ambient (SCALING.md round-10 bench-drift note),
so the O(increment) chain's win is measured HERE as a controlled
experiment: the identical `q_streaming_curated_ingest` flow runs twice
back-to-back, once as shipped (chained `maintain_bloom_index`), once
with maintenance forced to the pre-round-9 behavior (a full
`write_bloom_index` rebuild over the version's whole manifest on every
commit), interleaved A,B,A,B so ambient drift hits both arms equally.

Usage: python chain_ab_smoke.py [sf_dir] [passes]
Defaults: /tmp/spark_graft_scale_sf100, 2 passes per arm.
Prints one JSON line with per-arm times and the rebuild/chained ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as _q  # noqa: F401  (registry init first — queries_ops imports from .queries)
from bigbookapi_etl_with_airflow_and_snowflake_spark import queries_ops
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark
from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks import versioned


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_sf100"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="chain-ab-smoke")

    def run() -> float:
        t0 = time.perf_counter()
        df = queries_ops.q_streaming_curated_ingest(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    chained_maintain = versioned.maintain_bloom_index

    def full_rebuild_maintain(
        spark, table_dir, key_col, version, new_files, prior_version, **kw
    ):
        # the pre-chain behavior: every commit re-indexes the whole
        # manifest — O(table) per commit instead of O(increment)
        return versioned.write_bloom_index(
            spark, table_dir, key_col, version=version
        )

    chained_times, rebuild_times = [], []
    for _ in range(passes):
        versioned.maintain_bloom_index = chained_maintain
        chained_times.append(run())
        versioned.maintain_bloom_index = full_rebuild_maintain
        rebuild_times.append(run())
    versioned.maintain_bloom_index = chained_maintain

    c, r = min(chained_times), min(rebuild_times)
    print(
        json.dumps(
            {
                "metric": "chain_ab_streaming_curated_ingest",
                "sf_dir": sf_dir,
                "chained_sec": [round(x, 2) for x in chained_times],
                "rebuild_sec": [round(x, 2) for x in rebuild_times],
                "chained_min": round(c, 2),
                "rebuild_min": round(r, 2),
                "rebuild_over_chained": round(r / c, 3),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )

    # Growth experiment: the asymptotic claim. A 4-commit entry can't
    # show O(increment) vs O(table) — the index term is dominated by
    # the screens. 20 fixed-size appends can: per-commit wall should
    # stay FLAT chained (with periodic compaction spikes at
    # max_chain=8) and grow LINEARLY when every commit re-indexes the
    # whole manifest.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    n_commits, rows = 20, 200_000
    growth: dict[str, list[float]] = {}
    for arm, fn in (
        ("chained", chained_maintain),
        ("rebuild", full_rebuild_maintain),
    ):
        versioned.maintain_bloom_index = fn
        d = tempfile.mkdtemp(prefix=f"chain_growth_{arm}_")
        t = os.path.join(d, "tbl")
        times = []
        for i in range(n_commits):
            df = (
                spark.range(i * rows, (i + 1) * rows)
                .select(
                    F.col("id").alias("k"), (F.col("id") * 3).alias("v")
                )
                .repartition(2)
            )
            t0 = time.perf_counter()
            versioned.write_version(
                spark,
                df,
                t,
                mode="append" if i else "overwrite",
                index_cols=["k"],
            )
            times.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(d, ignore_errors=True)
        growth[arm] = times
    versioned.maintain_bloom_index = chained_maintain
    print(
        json.dumps(
            {
                "metric": "chain_growth_20_appends",
                "rows_per_commit": rows,
                "per_commit_sec": growth,
                "first3_avg": {
                    a: round(sum(v[:3]) / 3, 3) for a, v in growth.items()
                },
                "last3_avg": {
                    a: round(sum(v[-3:]) / 3, 3) for a, v in growth.items()
                },
                "total_sec": {
                    a: round(sum(v), 2) for a, v in growth.items()
                },
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
