"""Pipelines (the reference's three DAGs as Spark lineages) and plan
introspection utilities."""

from .introspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)
from .pipelines import books_pipeline, models_pipeline, warehouse_sync  # noqa: F401
