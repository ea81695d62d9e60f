"""Same-session interleaved A/B: PassJoin probe enumeration with the
loose |shift|<=k bounds (round 14) vs the multi-match-aware bounds
(round 15), plus candidate-volume counts.
Run: python plans/r15/_ab_editdist.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table

K, NSEG = 2, 3


def editdist(spark, sf_dir, tight: bool):
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    l = F.length("p_name")
    w = [((l + F.lit(i)) / NSEG).cast("int") for i in range(NSEG)]
    starts = [F.lit(1), F.lit(1) + w[0], F.lit(1) + w[0] + w[1]]
    idx = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        l.alias("lb"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    F.substring("p_name", starts[i], w[i]).alias("seg"),
                )
                for i in range(NSEG)
            ])
        ).alias("__s"),
    ).select(
        "id_b", "name_b", "lb",
        F.col("__s.i").alias("i"), F.col("__s.seg").alias("seg"),
    )
    lr = F.length("p_name")
    probe_keys = []
    nkeys = 0
    for dl in range(-K, K + 1):
        lc = lr + F.lit(dl)
        wc = [((lc + F.lit(i)) / NSEG).cast("int") for i in range(NSEG)]
        sc = [F.lit(1), F.lit(1) + wc[0], F.lit(1) + wc[0] + wc[1]]
        delta = -dl
        for i in range(NSEG):
            if tight:
                rng = range(max(-i, delta - (K - i)), min(i, delta + (K - i)) + 1)
            else:
                rng = range(-K, K + 1)
            for d in rng:
                nkeys += 1
                pos = sc[i] + F.lit(d)
                ok = (lc >= F.lit(0)) & (pos >= 1) & (pos + wc[i] - 1 <= lr)
                probe_keys.append(
                    F.when(
                        ok,
                        F.struct(
                            lc.alias("lb"),
                            F.lit(i).alias("i"),
                            F.substring("p_name", pos, wc[i]).alias("seg"),
                        ),
                    )
                )
    probe = (
        p.select(
            F.col("p_partkey").alias("id_a"),
            F.col("p_name").alias("name_a"),
            F.explode(F.array(*probe_keys)).alias("__k"),
        )
        .filter(F.col("__k").isNotNull())
        .select(
            "id_a", "name_a",
            F.col("__k.lb").alias("lb"),
            F.col("__k.i").alias("i"),
            F.col("__k.seg").alias("seg"),
        )
        .dropDuplicates(["id_a", "lb", "i", "seg"])
    )
    cand = (
        probe.join(idx, ["lb", "i", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    out = (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b", 2))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
    return out, cand, nkeys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="r15-ab-editdist")
    for tight in (False, True):
        _, cand, nk = editdist(spark, sf_dir, tight)
        print(f"tight={tight} probe_keys={nk} candidates={cand.count()}", flush=True)
    best = {False: 9e9, True: 9e9}
    for p in range(passes):
        for tight in (False, True):
            out, _, _ = editdist(spark, sf_dir, tight)
            spark.sparkContext.setJobDescription(f"r15:editdist tight={tight}")
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[tight] = min(best[tight], dt)
            print(f"pass{p} tight={tight}: {dt:.2f}s", flush=True)
    print({("tight" if k else "loose"): round(v, 2) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
