"""HuggingFace Hub source (S5) — server-side top-k model listing
(reference huggingface_extract.py:27-57 (pyc)).

The Hub API itself does the top-50-by-recency cut (``sort=lastModified,
direction=-1, limit=50``) — a driver-side fetch of ≤50 records, so no
distribution is needed at the source; the equivalent relational op is
``orderBy(desc(last_modified)).limit(k)`` (D3).

``huggingface_hub`` is not in this environment: the import is gated and
the record-shaping path takes plain dicts, so tests (and any offline
run) inject fake listings while production passes ``list_models``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_MODEL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("pipeline_tag", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("lastModified", T.StringType()),
    ]
)


def _default_lister(limit: int) -> Iterable[Any]:
    try:
        from huggingface_hub import list_models
    except ImportError as e:  # pragma: no cover - hub not in this env
        raise ImportError(
            "huggingface_hub is not installed; inject a lister instead"
        ) from e
    return list_models(
        sort="lastModified", direction=-1, limit=limit, cardData=True
    )


def model_record(m: Any) -> dict:
    """Project one listing item to the raw record shape with the
    reference's falsy→default handling (T9, huggingface_extract.py:39-44
    (pyc)). Accepts hub ModelInfo objects or plain dicts."""
    get = (lambda k: m.get(k)) if isinstance(m, dict) else (lambda k: getattr(m, k, None))
    last_modified = get("lastModified") or get("last_modified")
    return {
        "id": get("id") or get("modelId"),
        "author": get("author") or None,
        "pipeline_tag": get("pipeline_tag") or None,
        "tags": list(get("tags") or []),
        "lastModified": str(last_modified) if last_modified is not None else None,
    }


def read_top_models(
    spark: SparkSession,
    limit: int = 50,
    lister: Callable[[int], Iterable[Any]] | None = None,
) -> DataFrame:
    """S5 — top-``limit`` models by recency as a typed DataFrame.

    Pipe into ``operators.transforms.standardize_models`` +
    ``operators.dedup.keep_first_dedup`` for the full P3 shape.
    """
    items = (lister or _default_lister)(limit)
    rows = [model_record(m) for m in items]
    return spark.createDataFrame(rows, RAW_MODEL_SCHEMA)
