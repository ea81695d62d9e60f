"""Grouped custom processing via batch ``applyInPandas``.

The batch sibling of the streaming ``applyInPandasWithState`` operator:
per-key logic too imperative for window expressions (sequence models,
per-entity feature vectors) runs as one Arrow-batched pandas call per
group. Shuffle on the key, then embarrassingly parallel — the standard
shape for per-document / per-user feature extraction in a training-data
pipeline. Hot-key caution applies: a single giant group lands on one
worker, so extremely skewed keys belong in the salted/window paths.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "user_id long, n_events long, n_sessions long, "
    "mean_gap_s double, max_gap_s double, n_types long"
)


def user_behavior_features(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user behavioral features: event count, gap-based session
    count (same 30-min rule as ``queries.q_sessionize``), inter-event
    gap stats, distinct event-type count."""
    gap_s = gap_minutes * 60

    def feats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # integer-nanosecond gaps: exact sums/compares, and each emitted
        # second value is ONE correctly-rounded IEEE division of an
        # exact integer — engine-portable (an oracle computing the same
        # stat from integer microseconds lands on the identical double)
        ts_ns = pd.Series(
            pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64"),
            index=pdf.index,
        )
        gaps_ns = ts_ns.diff().dropna()
        n_gaps = len(gaps_ns)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_sessions": [int((gaps_ns > gap_s * 1_000_000_000).sum()) + 1],
                "mean_gap_s": [
                    float(gaps_ns.sum()) / (n_gaps * 1e9) if n_gaps else None
                ],
                "max_gap_s": [float(gaps_ns.max()) / 1e9 if n_gaps else None],
                "n_types": [pdf["event_type"].nunique()],
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandas(feats, FEATURE_SCHEMA)
    )
