"""Structured Streaming over the events stream (SURVEY.md §2.5 N6).

The reference is batch-only (@daily Airflow DAGs, reference
dags/bigbookapi.py:51); streaming is the north-star extension. Every
operator here is the streaming twin of a batch query in ``queries.py``
(tumbling_window, sessionize, dedup), built on the standard Structured
Streaming machinery:

- event-time watermarks bound state and admit late data up to the bound
- tumbling / sliding windows via ``F.window``; session windows via
  ``F.session_window`` (dynamic gap-merged state)
- ``dropDuplicatesWithinWatermark`` for at-least-once source dedup
- ``applyInPandasWithState`` for custom per-key state the built-in
  aggregates can't express

Scale posture: streaming aggregation state lives in the state store
partitioned by the grouping key — the same hash partitioning a batch
shuffle would use — so a 1000-executor cluster splits state evenly
provided keys are well-distributed (user_id / event_type are). Watermarks
are the critical knob at scale: without one, windowed state grows
unboundedly; with one, state is bounded by (watermark horizon × key
cardinality).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events table schema with ts already normalized to µs timestamp
# (the batch path gets this from sources.files.read_table; a stream
# reader needs it declared up front — no inference on streams).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """Shared file-stream reader: declared schema (streams never
    infer), optional ``maxFilesPerTrigger`` backpressure. One body so
    the events and documents ingest paths cannot drift."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over an events directory (parquet).

    Files appearing in ``path`` become micro-batches; the declared schema
    keeps the scan inference-free. ``max_files_per_trigger`` throttles
    batch size (backpressure knob for bursty arrival).
    """
    return _parquet_stream(spark, path, EVENTS_SCHEMA, max_files_per_trigger)


# documents table schema for the streaming curation-ingest path — like
# EVENTS_SCHEMA, declared up front because streams never infer.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over a documents directory (parquet)
    — the ingest edge of the streaming curation pipeline: raw documents
    arrive as files, micro-batches flow through the batch-identical
    quality gates via ``foreachBatch``, survivors land in a versioned
    table. ``max_files_per_trigger`` bounds per-batch work (at 100 TB
    the same knob is what keeps a backfill from becoming one giant
    batch)."""
    return _parquet_stream(spark, path, DOCUMENTS_SCHEMA, max_files_per_trigger)


def read_rate_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    num_partitions: int = 4,
    start_ts_ms: int = 0,
    advance_ms_per_batch: int = 60_000,
    users: int = 100,
    event_types: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Non-file streaming source: the built-in ``rate-micro-batch``
    source mapped into the events schema — every downstream operator
    (watermarked windows, dedup, stream-stream join, stateful) runs on
    it unchanged, proving the operator surface is source-agnostic.

    ``rate-micro-batch`` (unlike plain ``rate``) is DETERMINISTIC:
    batch N carries values [N·rows, (N+1)·rows) stamped
    ``start + N·advance`` — replays and tests get identical data. In
    production the same shape swaps to a Kafka reader (absent from this
    sandbox); only this function changes, no operator does. The synth
    columns are pure narrow expressions of ``value`` (portable hashes,
    no RNG), generated partition-parallel on executors.
    """
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("numPartitions", str(num_partitions))
        .option("startTimestamp", str(start_ts_ms))
        .option("advanceMillisPerBatch", str(advance_ms_per_batch))
        .load()
    )
    et = F.array(*[F.lit(t) for t in event_types])
    return raw.select(
        F.col("value").alias("event_id"),
        F.pmod("value", F.lit(users)).cast("long").alias("user_id"),
        F.element_at(et, (F.pmod("value", F.lit(len(event_types))) + 1).cast("int")).alias(
            "event_type"
        ),
        F.col("timestamp").alias("ts"),
        (F.pmod(F.xxhash64(F.col("value")), F.lit(10_000)).cast("double") / 100.0).alias(
            "value"
        ),
        F.lit(None).cast("string").alias("props"),
    )


def tumbling_window_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation per event_type.

    Streaming twin of ``queries.q_tumbling_window``. State per
    (window, event_type) is dropped once the watermark passes the window
    end — bounded state at any scale.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event counts (overlapping windows; each row lands
    in window/slide buckets)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows per user — gap-based, merged dynamically as events
    arrive (streaming twin of the batch ``queries.q_sessionize``).

    Session state merges on overlap and closes when the watermark passes
    (last event + gap); closed sessions emit and free their state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once source dedup: drop repeats of ``keys`` arriving
    within the watermark horizon. Unlike plain ``dropDuplicates`` on a
    stream (state grows forever), state here is evicted once the
    watermark passes — the only dedup that survives unbounded streams.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension.

    The static side is re-planned per micro-batch (a dimension updated
    between batches is picked up automatically) and needs no watermark —
    no state is kept. The standard pattern for attaching user/account
    attributes to an event stream; broadcast applies exactly as in
    batch."""
    return events.join(dim, on, "left")


def foreach_batch_upsert(stream_df: DataFrame, writer, checkpoint: str):
    """Streaming → idempotent JDBC upsert via ``foreachBatch``: each
    micro-batch runs the K6 distributed upsert inside the streaming
    commit protocol. Because the sink is keyed and idempotent, a batch
    replayed after a failure rewrites the same rows — end-to-end
    effectively-once without a transactional sink.

    Returns the started StreamingQuery (caller awaits)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        writer.write(batch_df)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_join(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user views
    that happened at most ``within`` before them.

    Both sides are watermarked and the join carries an event-time range
    condition — the two ingredients Structured Streaming needs to bound
    join state: a view's row can be dropped from state once the
    watermark guarantees no matching purchase can still arrive
    (view_ts + within < watermark). Without the time bound, state grows
    forever; with it, state ≈ (within + watermark) × arrival rate.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (v.user_id == p.p_user_id)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr(f"INTERVAL {within}"))
    )
    return v.join(p, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "view_id", "view_ts"
    )


# --- custom stateful operator: per-user running profile ----------------

_STATE_SCHEMA = "n_events LONG, sum_value DOUBLE, last_ts TIMESTAMP"
_OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, sum_value DOUBLE, last_ts TIMESTAMP"
)


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into running state and
    emit the updated profile. Arrow-batched — one call per (user, batch),
    not per row."""
    n, s, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if last is None or (batch_max is not None and batch_max > last):
            last = batch_max
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "last_ts": [last]}
    )


def user_running_state(events: DataFrame) -> DataFrame:
    """Custom stateful op via ``applyInPandasWithState``: per-user running
    event count / value sum / last-seen timestamp, updated each micro-batch.

    This is the escape hatch for semantics built-in streaming aggregates
    can't express (model state, decayed counters, fraud scores). State is
    partitioned by user_id in the state store — linear scale-out.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_running_state_tws(events: DataFrame) -> DataFrame:
    """The per-user running profile on the Spark-4-native
    ``transformWithStateInPandas`` API (StatefulProcessor + named
    ValueState handles — typed, store-backed, independently evolvable)
    — same semantics as :func:`user_running_state` (the
    ``applyInPandasWithState`` form), kept side by side because the
    new API is where timers, TTL state, and state-schema evolution
    live going forward. Tests pin both forms to the same batch ground
    truth (skipping where the environment lacks google.protobuf — the
    wire format of the API's JVM↔Python state server; the
    ``applyInPandasWithState`` form has no such dependency and is the
    one the oracle entry runs). The processor class is defined lazily
    so importing this module never requires the new API surface."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "profile", "n_events long, sum_value double, last_ts timestamp"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, s, last = self._state.get()
            else:
                n, s, last = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
                batch_max = pdf["ts"].max()
                if last is None or (batch_max is not None and batch_max > last):
                    last = batch_max
            self._state.update((n, s, last))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s],
                 "last_ts": [last]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a stream with an available-now trigger into an in-memory
    table; returns the batch DataFrame of results (test/verification
    harness — production sinks are files/Kafka/JDBC)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
