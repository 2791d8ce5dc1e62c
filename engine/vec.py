"""Shared JVM-side vector expressions over array<float> columns.

Registration-free helper module: engine/__init__'s import order controls
which queries land in the driver's 50-row correctness window, so modules
that register early (e.g. the current round's seeds) must not transitively
import a registering module just for these expressions. Both
engine.llm_ops and engine.scale_ops re-export them for compatibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sq_norm(arr: Column) -> Column:
    """Σx² over an array<float>, accumulated in double."""
    return F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def _dot(a: Column, b: Column) -> Column:
    """Σaᵢbᵢ via zip_with + fold, accumulated in double (JVM-side
    higher-order functions — no Python, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
