"""Config A/B at 100x (VERDICT item 8): shuffle codec zstd-vs-lz4 and
AQE advisory partition size, on the shuffle-heaviest entries, run as
SEPARATE sessions per config (io codec is context-start conf). Invoke
once per config; interleave orders across invocations.

Usage: python plans/r15/_ab_config.py <codec> <advisory|-> [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as _q
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark

QUERIES = ["jaccard_pairs", "minhash_jaccard_est", "window_running", "simhash_pairs"]
CORPUS = "/tmp/spark_graft_scale_sf100"


def main() -> None:
    codec = sys.argv[1]
    advisory = sys.argv[2] if len(sys.argv) > 2 and sys.argv[2] != "-" else None
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    conf = {"spark.io.compression.codec": codec}
    if advisory:
        conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = advisory
    spark = get_spark(app_name=f"r15-ab-{codec}-{advisory}", extra_conf=conf)
    try:
        adv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    except Exception:
        adv = "default"
    print("codec:", spark.conf.get("spark.io.compression.codec"),
          "advisory:", adv, flush=True)
    _q.q_count_audit(spark, CORPUS).collect()
    reg = _q.queries()
    best: dict[str, float] = {}
    for p in range(passes):
        for name in QUERIES:
            spark.sparkContext.setJobDescription(f"ab:{codec}:{name}")
            t0 = time.perf_counter()
            reg[name](spark, CORPUS).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 9e9), dt)
            print(f"pass{p} {name}: {dt:.2f}", flush=True)
    print("RESULT", codec, advisory, {k: round(v, 2) for k, v in best.items()},
          "total", round(sum(best.values()), 2), "loadavg", os.getloadavg())
    spark.stop()


if __name__ == "__main__":
    main()
