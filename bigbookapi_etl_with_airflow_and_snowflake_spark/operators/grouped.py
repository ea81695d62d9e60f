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
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_sessions": [int((gaps > gap_s).sum()) + 1],
                "mean_gap_s": [float(gaps.mean()) if len(gaps) else None],
                "max_gap_s": [float(gaps.max()) if len(gaps) else None],
                "n_types": [pdf["event_type"].nunique()],
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandas(feats, FEATURE_SCHEMA)
    )
