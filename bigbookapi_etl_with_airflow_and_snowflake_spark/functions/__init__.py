"""Expression-level helpers (engine-internal building blocks)."""

from .expr import bind  # noqa: F401
