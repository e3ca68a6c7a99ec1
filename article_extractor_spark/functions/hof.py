"""Helpers for Spark higher-order array functions.

Spark HOFs (``transform``/``aggregate``/``zip_with``/``filter``) are
CodegenFallback — interpreted, with NO common-subexpression elimination:
an expression tree referenced N times inside a lambda is evaluated N
times.  ``let`` gives Column expressions a let-binding so an expensive
subtree is evaluated exactly once and every reference is an O(1) lambda
variable lookup.  (Measured in round 1: shingling 5000 docs 20 s →
sub-second; minhash signatures 37× faster.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` ONCE and reference it as a lambda variable
    inside ``body`` (single-element array + transform + element_at)."""
    return F.element_at(F.transform(F.array(value), body), 1)
