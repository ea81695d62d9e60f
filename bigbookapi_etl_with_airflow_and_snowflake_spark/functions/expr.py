"""Catalyst expression utilities.

``bind`` — evaluate-once binding for expensive sub-expressions.

Why it exists: higher-order functions (``transform`` / ``filter`` /
``aggregate``) run interpreted, outside whole-stage codegen, so Catalyst
performs **no common-subexpression elimination** across them — and
``CollapseProject`` happily merges staged ``select``s back together,
re-inlining an expensive expression (say, a regex tokenizer) into every
one of its N downstream references. Measured on the documents corpus,
inlined shingling cost 26× more than bound shingling (the token split
re-ran per ``element_at``).

``bind(expr, fn)`` routes the value through a single-element array and a
lambda — ``element_at(transform(array(expr), x -> fn(x)), 1)`` — so
``expr`` is evaluated exactly once per row and ``fn``'s body references
it as a lambda variable (a cheap slot read), no matter how the optimizer
rearranges projections.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once per row; apply ``fn`` to the bound value."""
    return F.element_at(F.transform(F.array(expr), fn), 1)
