"""Scale smoke: replicate the sf0.1 corpus N× (shifted primary keys,
multi-file layout) and run headline queries — evidence that plans scale
linearly rather than degrading (broadcast misuse, pair-space blowups,
single-task stages all show up here long before a real cluster).

Usage: python scale_smoke.py [multiplier] [out_json] [--full]
Writes the replicated corpus under /tmp/spark_graft_scale_sf<mult> once
and reuses it on later runs.

``--full`` runs the ENTIRE registry (one pass each, failures recorded
instead of aborting) rather than the headline subset — the per-round
scale audit. Convention: each round checks in its artifact as
``SCALE_r{N}.json`` so scale regressions are a diff against the prior
round's file, not a re-run decision:

    python scale_smoke.py 100 SCALE_r09.json --full
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as _q
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table

BASE = "/root/testdata/sf0.1"

# (table, primary-key columns to shift per copy). Foreign keys into the
# dimension tables stay unshifted so joins keep their original fan-in.
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": [],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}

QUERIES = [
    "pricing_summary",
    "region_revenue",
    "shipping_priority",
    "join_enrich",
    "window_running",
    "sessionize",
    "tumbling_window",
    "dedup_exact_docs",
    "dedup_keep_first",
    "minhash_band_pairs",
    "jaccard_pairs",
    "cosine_topk",
    "embedding_neardup",
    "asof_join_generic",
    "range_join_buckets",
    "topk_recent_events",
    # ext registry: TPC-H completions + curation ops
    "waiting_suppliers",
    "cust_order_distribution",
    "important_parts",
    "priority_exists_orders",
    "decontaminate",
    "pack_sequences",
    "train_test_split",
    "dedup_clusters",
    "embedding_quantize",
    # operator-backed entries (round 2)
    "rollup_refresh",
    "salted_agg_events",
    "user_features",
    "merge_upsert_orders",
    "image_decode",
    "audio_decode",
    # round-3 additions: incremental dedup, estimate-first scoring,
    # global training order, distributed clustering
    "incremental_dedup",
    "minhash_jaccard_est",
    "global_shuffle",
    "kmeans_clusters",
    "cluster_balanced_sample",
    # round-4 additions: exact-mode ANN twins, kmeans-init assignment,
    # real PNG decode
    "lsh_topk_exact",
    "ivf_topk_exact",
    "kmeans_assign_init",
    "cluster_sample_init",
    "png_decode",
    "jpeg_decode",
    "gif_decode",
    "video_frames",
    "distinct_users_exact",
    "price_quantiles_exact",
    # round-5 additions: passage dedup, MG heavy hitters, progressive
    # JPEG, MP4 demux, z-order keys, SemDeDup
    "passage_dedup",
    "heavy_hitter_words",
    "jpeg_progressive_decode",
    "video_meta",
    "zorder_key_events",
    "semantic_dedup",
    "scd2_customer_history",
    "boilerplate_removal",
    "flac_meta",
    "parquet_stats_events",
    "webdataset_members",
    "webdataset_pipeline",
    "orc_roundtrip",
    "csv_tolerant_read",
    # round-5 late additions: sampling tier (two-pass prefix sums must
    # not collapse to one task at scale), link analysis, text/profiling
    # tiers, CDC diff, lake compaction companions
    "stable_row_ids",
    "pps_sample_orders",
    "weighted_sample_orders",
    "pagerank_2iter",
    "html_strip",
    "column_profile_events",
    "outlier_events",
    "schema_evolution_union",
    "snapshot_diff_orders",
    "unicode_nfc",
    "url_parts",
    "chunk_documents",
    "bpe_pair_counts",
    # round-5 final additions: copy-on-write lake tier + resample
    "versioned_merge_delete",
    "bloom_file_lookup",
    "ohlc_daily",
    # round-7 additions: pruned versioned read, salted jaccard, image
    # dedup end product, batched BPE encode, MP4 sample walk, LM filter
    "versioned_pruned_read",
    "jaccard_pairs_capped",
    "image_neardup_keep",
    "bpe_encode",
    "mp4_samples",
    "lm_quality",
    "gopher_quality",
    "dup_span_stats",
    "gopher_repetition",
    "corpus_manifest",
]


def _testdata_generation(sf_dir: str) -> str:
    """Fingerprint of the BASE corpus generation (same convention as
    bench.py): md5 over sorted (name, size) of every parquet file.
    Cross-round SCALE totals are comparable only within a generation
    (SCALING.md round 10/11) — recording it makes layout-change vs
    regression distinguishable mechanically."""
    import hashlib

    h = hashlib.md5()
    for name in sorted(os.listdir(sf_dir)):
        p = os.path.join(sf_dir, name)
        if name.endswith(".parquet"):
            size = (
                sum(
                    os.path.getsize(os.path.join(p, f))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(p)
                else os.path.getsize(p)
            )
            h.update(f"{name}:{size};".encode())
    return h.hexdigest()[:16]


def build_corpus(spark, mult: int, out_dir: str) -> None:
    # generation marker: a replicated corpus built from a PREVIOUS
    # testdata generation silently skews every timing (the r11 verdict's
    # open question on minhash_signatures/pagerank tails) — rebuild
    # whenever the base generation changed, and record which one this
    # corpus derives from.
    marker = os.path.join(out_dir, "_generation.json")
    base_gen = _testdata_generation(BASE)
    if os.path.isdir(out_dir):
        stale = True
        if os.path.exists(marker):
            with open(marker) as fh:
                stale = json.load(fh).get("base_generation") != base_gen
        if stale:
            import shutil

            print(f"corpus stale (base generation {base_gen}) — rebuilding",
                  flush=True)
            shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in SHIFT_KEYS.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        df = read_table(spark, BASE, table, spread=False)
        if keys:
            span = df.agg(*[F.max(k) for k in keys]).first()
            offsets = {k: int(span[i]) + 1 for i, k in enumerate(keys)}
            copies = []
            for c in range(mult):
                cp = df
                for k in keys:
                    cp = cp.withColumn(k, F.col(k) + F.lit(c * offsets[k]))
                copies.append(cp)
            import functools

            out = functools.reduce(lambda a, b: a.unionByName(b), copies)
            out = out.repartition(32)
        else:
            out = df
        out.write.mode("overwrite").parquet(dst)
    # marker LAST: a crash mid-build must leave a corpus the staleness
    # check still treats as incomplete (no marker → rebuild), never one
    # that silently passes as current with half its tables missing
    with open(marker, "w") as fh:
        json.dump({"base_generation": base_gen}, fh)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    mult = int(args[0]) if args else 10
    out_json = args[1] if len(args) > 1 else None
    corpus = f"/tmp/spark_graft_scale_sf{mult}"
    spark = get_spark(app_name="scale-smoke")
    build_corpus(spark, mult, corpus)

    _q.q_count_audit(spark, corpus).collect()  # warm

    registry = _q.queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    names = list(registry) if full else QUERIES
    passes = 1 if full else 2  # full audit: one pass, wall time matters
    for name in names:
        best = float("inf")
        try:
            for _ in range(passes):
                t0 = time.perf_counter()
                registry[name](spark, corpus).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
            print(name, timings[name], flush=True)
        except Exception as ex:
            if not full:
                raise  # headline mode keeps the abort-loudly contract
            # full audit: record and keep going — the artifact is the
            # point, and it carries n_failures for the round gate
            failures[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            print(name, "FAIL", failures[name], flush=True)

    load1, load5, load15 = os.getloadavg()
    result = {
        "metric": "scale_full_registry" if full else "scale_smoke_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "failures": failures,
        "n_queries": len(timings),
        "n_failures": len(failures),
        "multiplier": mult,
        "base_sf": 0.1,
        "testdata_generation": _testdata_generation(BASE),
        # fingerprint of the REPLICATED corpus build itself: two builds
        # from the same base generation can differ in row order
        # (repartition is order-nondeterministic), which measurably
        # shifts locality-sensitive entries — record it so r(N+1) can
        # tell corpus-build change from regression mechanically
        "corpus_fingerprint": _testdata_generation(corpus),
        "loadavg_end": [round(load1, 2), round(load5, 2), round(load15, 2)],
    }
    print(json.dumps(result))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    spark.stop()
    if failures:  # artifact written, but the process still reports red
        sys.exit(1)


if __name__ == "__main__":
    main()
