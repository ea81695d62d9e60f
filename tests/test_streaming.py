"""Streaming operators verified against their batch twins.

The events table is staged as parquet files (ts normalized to µs
timestamps, split into several files so availableNow produces real
micro-batches), read back with ``readStream``, drained with an
available-now trigger into memory, and compared to the identical
aggregation computed in batch — streaming and batch must agree on
append-complete data.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table
from bigbookapi_etl_with_airflow_and_snowflake_spark import streaming as S


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    read_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    return path


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return read_table(spark, sf_dir, "events").cache()


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_event_id_globally_unique(events_batch):
    """Uniqueness canary for the streaming-dedup oracle: testdata is
    regenerated between rounds, and first-arrival dedup of CONFLICTING
    rows sharing an event_id would be arrival-order-dependent. If this
    ever fails, the corpus changed shape — revisit SQL_STREAMING_DEDUP."""
    total = events_batch.count()
    distinct = events_batch.select("event_id").distinct().count()
    assert total == distinct


def test_tumbling_window_matches_batch(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    got = S.run_to_memory(
        S.tumbling_window_counts(stream, "5 minutes", "10 minutes"), "t_tumble"
    )
    want = (
        events_batch.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )
    got = got.select(
        "window_start", "event_type", "n_events", F.round("sum_value", 6).alias("sum_value")
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, *cols) == _rows(want, *cols)


def test_sliding_window_matches_batch(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    got = S.run_to_memory(
        S.sliding_window_counts(stream, "10 minutes", "5 minutes"), "t_slide"
    )
    want = (
        events_batch.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(got, *cols) == _rows(want, *cols)
    # each event lands in window/slide = 2 overlapping windows
    assert (
        got.agg(F.sum("n_events")).first()[0] == 2 * events_batch.count()
    )


def test_session_window_matches_batch(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    got = S.run_to_memory(
        S.session_window_stats(stream, "30 minutes", "30 minutes"), "t_sess"
    )
    want = (
        events_batch.groupBy(
            F.session_window("ts", "30 minutes").alias("sess"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
    cols = ["session_start", "user_id", "n_events"]
    assert _rows(got, *cols) == _rows(want, *cols)
    # every event is in exactly one session
    assert got.agg(F.sum("n_events")).first()[0] == events_batch.count()


def test_dedup_within_watermark(spark, events_dir, events_batch, tmp_path):
    # duplicate the whole stream (simulated at-least-once source), then
    # dedup on event_id — must recover the original cardinality
    dup_dir = str(tmp_path / "dup")
    events_batch.unionByName(events_batch).repartition(4).write.mode(
        "overwrite"
    ).parquet(dup_dir)
    stream = S.read_events_stream(spark, dup_dir)
    got = S.run_to_memory(
        S.dedup_within_watermark(stream, ["event_id"], "1 hour"),
        "t_dedup",
        output_mode="append",
    )
    assert got.count() == events_batch.count()
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data policy: rows arriving behind the watermark are dropped.

    Three files processed as separate micro-batches (maxFilesPerTrigger=1,
    mtime-ordered): batch A has events at hour 1 and hour 10 (watermark
    advances to hour 9 after A's commit), batch C keeps the stream
    moving (watermark application lags one commit cycle — the hour-1
    window is finalized and evicted at C's end), and batch B then
    replays hour-1 events — behind the watermark, state gone, dropped.
    The hour-1 window must count only A's two events."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late"
    d.mkdir()

    def mk(ts_hours, ids):
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": ids,
                    "user_id": [1] * len(ids),
                    "event_type": ["view"] * len(ids),
                    "ts": pd.Series(
                        [pd.Timestamp("2025-01-01") + pd.Timedelta(hours=h) for h in ts_hours]
                    ).astype("datetime64[us]"),
                    "value": [1.0] * len(ids),
                    "props": ["{}"] * len(ids),
                }
            ),
            preserve_index=False,
        )

    pq.write_table(mk([1, 1, 10], [1, 2, 3]), str(d / "a.parquet"))
    pq.write_table(mk([10], [7]), str(d / "c.parquet"))
    pq.write_table(mk([1, 1, 1], [4, 5, 6]), str(d / "b.parquet"))
    now = 1_700_000_000
    for i, f in enumerate(("a.parquet", "c.parquet", "b.parquet")):
        os.utime(d / f, (now + i * 100, now + i * 100))

    stream = S.read_events_stream(spark, str(d), max_files_per_trigger=1)
    agg = S.tumbling_window_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        r["window_start"]: r["n_events"] for r in spark.table("t_late").collect()
    }
    h1 = pd.Timestamp("2025-01-01 01:00:00")
    # hour-1 window finalized with ONLY batch A's two events; batch B's
    # three replayed events arrived behind the watermark and were dropped
    assert out[h1] == 2
    # the hour-10 window never finalized (watermark stops 1h behind it)
    assert len(out) == 1


def test_stream_stream_join_matches_batch(spark, events_dir, events_batch):
    views_s = S.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "view"
    )
    purch_s = S.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = S.run_to_memory(
        S.stream_stream_join(views_s, purch_s, within="1 hour"),
        "t_ssj",
        output_mode="append",
    )
    v = events_batch.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    p = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = v.join(
        p,
        (v.user_id == p.p_user_id)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr("INTERVAL 1 hour")),
    ).select("purchase_id", "view_id")
    cols = ["purchase_id", "view_id"]
    assert _rows(got, *cols) == _rows(want, *cols)
    assert got.count() > 0  # the corpus must actually exercise the join


def test_checkpoint_restart_exactly_once(spark, events_batch, tmp_path):
    """Fault-tolerance: a file-sink stream stopped and restarted from
    its checkpoint processes new data exactly once — no duplicates, no
    gaps. This is the recovery contract production streams rely on."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    first = events_batch.filter(F.col("event_id") % 2 == 0)
    second = events_batch.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        q = (
            S.read_events_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # run 1: first half
    assert spark.read.parquet(out).count() == first.count()

    second.coalesce(1).write.mode("append").parquet(str(src))
    drain()  # run 2: restart from checkpoint, sees only the new file

    result = spark.read.parquet(out)
    assert result.count() == events_batch.count()
    assert result.select("event_id").distinct().count() == events_batch.count()

    drain()  # run 3: nothing new → no duplicates
    assert spark.read.parquet(out).count() == events_batch.count()


def test_stream_static_enrich(spark, events_dir, events_batch):
    dim = events_batch.select("user_id").distinct().withColumn(
        "tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
    )
    got = S.run_to_memory(
        S.stream_static_enrich(S.read_events_stream(spark, events_dir), dim),
        "t_enrich",
        output_mode="append",
    )
    assert got.count() == events_batch.count()
    assert got.filter(F.col("tier").isNull()).count() == 0
    bad = got.filter(
        ((F.col("user_id") % 2 == 0) & (F.col("tier") != "even"))
        | ((F.col("user_id") % 2 == 1) & (F.col("tier") != "odd"))
    )
    assert bad.count() == 0


def test_streaming_foreach_batch_upsert(spark, events_dir, events_batch, tmp_path):
    """Streaming → K6 idempotent upsert: dedup state flows through the
    keyed sink; a full re-run (fresh checkpoint, same data) rewrites the
    same rows — effectively-once end to end."""
    import sqlite3

    from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.jdbc import (
        JdbcUpsertWriter,
    )

    db = str(tmp_path / "events.db")
    writer = JdbcUpsertWriter(
        lambda path=db: sqlite3.connect(path, timeout=30),
        table="latest_events",
        key_cols=["event_id"],
        paramstyle="?",
        ensure_columns=[
            ("event_id", "BIGINT"),
            ("user_id", "BIGINT"),
            ("event_type", "VARCHAR(32)"),
        ],
    )

    def run(ckpt):
        stream = S.read_events_stream(spark, events_dir).select(
            "event_id", "user_id", "event_type"
        )
        q = S.foreach_batch_upsert(stream, writer, str(tmp_path / ckpt))
        q.awaitTermination()

    run("ckpt1")
    run("ckpt2")  # full replay with a fresh checkpoint: same end state
    con = sqlite3.connect(db)
    n = con.execute("SELECT COUNT(*) FROM latest_events").fetchone()[0]
    con.close()
    assert n == events_batch.count()


def test_user_running_state(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    got = S.run_to_memory(
        S.user_running_state(stream), "t_state", output_mode="update"
    )
    # final state per user (last update wins; with one pass a user may
    # appear once per micro-batch — keep the max-count row)
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    want = events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
    )
    cols = ["user_id", "n_events", "last_ts"]
    assert _rows(final, *cols) == _rows(want, *cols)


def test_user_running_state_tws_matches_batch_and_legacy(spark, events_dir, events_batch):
    """The Spark-4 transformWithStateInPandas form must produce the
    same final per-user profile as the batch GROUP BY — and therefore
    as the applyInPandasWithState form the previous test pins.

    Environment gate: the transformWithState state server speaks
    protobuf between the JVM and a Python runner; without
    google.protobuf (not in this container, installs forbidden) the
    runner cannot start, so the test SKIPS — the operator itself is
    plain PySpark API and runs wherever pyspark's full requirements
    are installed."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its state server",
    )
    stream = S.read_events_stream(spark, events_dir)
    got = S.run_to_memory(
        S.user_running_state_tws(stream), "t_state_tws", output_mode="update"
    )
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_ts").alias("last_ts"),
    )
    want = events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
    )
    cols = ["user_id", "n_events", "last_ts"]
    assert _rows(final, *cols) == _rows(want, *cols)


def test_rate_source_deterministic_and_feeds_operators(spark):
    """Non-file source: rate-micro-batch is deterministic (batch N =
    values [N*rows, (N+1)*rows)), so exact assertions hold; the mapped
    events shape must drive the windowed aggregate unchanged."""
    import uuid

    name = f"rate_{uuid.uuid4().hex[:8]}"
    stream = S.read_rate_stream(
        spark, rows_per_batch=300, num_partitions=3, users=7
    )
    out = S.run_to_memory(stream, name, output_mode="append")
    rows = out.collect()
    assert {r["event_id"] for r in rows} >= set(range(300))
    for r in rows:
        assert r["user_id"] == r["event_id"] % 7
        assert r["event_type"] in ("view", "click", "purchase")
        assert r["ts"] is not None and 0.0 <= r["value"] < 100.0
    # replay determinism: a second drain yields identical first-batch rows
    name2 = f"rate_{uuid.uuid4().hex[:8]}"
    out2 = S.run_to_memory(
        S.read_rate_stream(spark, rows_per_batch=300, num_partitions=3, users=7),
        name2,
        output_mode="append",
    )
    a = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in rows}
    b = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in out2.collect()}
    shared = set(a) & set(b)
    assert shared and all(a[k] == b[k] for k in shared)
    # and the watermarked tumbling aggregate runs on it unchanged
    name3 = f"rate_{uuid.uuid4().hex[:8]}"
    agg = S.tumbling_window_counts(
        S.read_rate_stream(spark, rows_per_batch=120, num_partitions=2, users=5)
    )
    res = S.run_to_memory(agg, name3, output_mode="complete")
    assert res.count() >= 1
